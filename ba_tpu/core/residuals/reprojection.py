"""Reprojection residuals + Jacobians, batched via vmap(jacfwd).

TPU-native replacement for the reference's serial projection evaluator
(`ParallelProjectionResiduals::operator()`,
/root/reference/include/ba/parallel_algos.h:35-152) and its hand-derived
chain rule through `dt_x_dt ∘ dt1_t2_dt2 ∘ d(inv)exp_decoupled`
(Utils.h).  Here the residual is written once as a pure function of the
*tangent perturbation* around the current states (lift-solve-retract), and
`jax.jacfwd` at delta = 0 produces the exact manifold Jacobians — XLA fuses the
whole vmapped evaluation into one batched kernel.

Residual (behavioral contract §7.3):
    r = z - project(T_sv_meas^-1 * T_wv_meas^-1 * T_wv_ref * T_vs_ref * x_s)
with x_s the homogeneous inverse-depth landmark (lm_size==1) or the world
point (lm_size==3, chain starts at T_wv_meas^-1).

Tangent layout per residual: [d_meas(6) | d_ref(6) | d_lm(lm_size) |
d_calib(calib_dim)] — pose tangents are [dt(3), dw(3)] touching only the
first 6 of up to 15 pose dims (the reference's stride trick becomes simply
writing the first 6 columns at assembly).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import camera, lie
from ..problem import BAConfig, Problem


class ProjEval(NamedTuple):
    r: jax.Array        # (Nr, 2)
    j_meas: jax.Array   # (Nr, 2, 6)
    j_ref: jax.Array    # (Nr, 2, 6)  (zeros in lm_size==3 mode)
    j_lm: jax.Array     # (Nr, 2, lm_size) (lm_size>=1)
    j_cal: jax.Array    # (Nr, 2, calib_dim)
    err_sq: jax.Array   # (Nr,) squared pixel error (unweighted mahalanobis)


def _residual_fn(config: BAConfig):
    """Per-residual residual-of-tangent function (single example).

    `cam_m` / `cam_r` are the measuring / reference-camera packs
    (params, model, tvs_q, tvs_t, opt) — the reference gathers the ref
    side from lm.ref_cam_id (parallel_algos.h:47-48, cpp:159-160), so a
    stereo rig transforms the landmark ray through the *reference*
    camera's extrinsics, not the measuring camera's.  `opt` is 1.0 when
    that camera's calibration is the optimized block (camera 0 — the
    reference's single shared calib block), so the d_cal tangent only
    perturbs the calibrated camera.
    """
    lm = config.lm_size
    cd = config.calib_dim

    def r_of(delta, z, pose_m, pose_r, x, cam_m, cam_r, z_ref, has_z_ref):
        d_m, d_r = delta[0:6], delta[6:12]
        d_lm = delta[12:12 + lm]
        d_cal = delta[12 + lm:12 + lm + cd]

        params_m, model_m, tvs_qm, tvs_tm, opt_m = cam_m
        params_r, model_r, tvs_qr, tvs_tr, opt_r = cam_r

        q_m, t_m = lie.se3_retract(pose_m, d_m)
        if config.calib_size:
            dk = d_cal[:config.calib_size]
            params_m = params_m.at[:config.calib_size].add(dk * opt_m)
            params_r = params_r.at[:config.calib_size].add(dk * opt_r)
        if config.do_tvs:
            dtvs = d_cal[config.tvs_offset:config.tvs_offset + 6]
            tvs_qm, tvs_tm = lie.se3_retract((tvs_qm, tvs_tm), dtvs * opt_m)
            tvs_qr, tvs_tr = lie.se3_retract((tvs_qr, tvs_tr), dtvs * opt_r)

        if lm == 1:
            q_r, t_r = lie.se3_retract(pose_r, d_r)
            x_s = x.at[3].add(d_lm[0])
            if config.calib_size:
                # self-calibration: the ray direction is the unprojection of
                # the reference-view pixel through the *current* intrinsics
                # of the reference camera, so the calibration Jacobian
                # carries the direction effect exactly (the reference
                # instead re-unprojects after each update, cpp:58-68)
                ray = camera.unproject(params_r, model_r, z_ref)
                x_s = jnp.where(has_z_ref,
                                jnp.concatenate([ray, x_s[3:4]]), x_s)
            T_ws_ref = lie.se3_compose((q_r, t_r), (tvs_qr, tvs_tr))
            x_w = lie.se3_transform_homog(T_ws_ref, x_s)
        else:
            xyz = x[:3] + (d_lm if lm == 3 else 0.0)
            x_w = jnp.concatenate([xyz, jnp.ones_like(x[3:4])])
        T_ws_meas = lie.se3_compose((q_m, t_m), (tvs_qm, tvs_tm))
        p_s = lie.se3_transform_homog(lie.se3_inverse(T_ws_meas), x_w)
        pix = camera.project(params_m, model_m, p_s[:3])
        return z - pix

    return r_of


def evaluate(problem: Problem, config: BAConfig,
             with_jacobians: bool = True) -> ProjEval:
    """Residuals (+ Jacobians) for every row of the projection table.

    Invalid/padded rows produce zeros (the gathered indices still point at
    row 0, but `valid` masks the outputs).
    """
    pr = problem.proj
    dtype = pr.z.dtype
    lm_sz = max(config.lm_size, 1)
    tdim = 12 + config.lm_size + config.calib_dim
    r_of = _residual_fn(config)

    poses = problem.poses
    rig = problem.rig
    pose_m = (poses.q[pr.pose], poses.t[pr.pose])
    ref_pose = problem.lms.ref_pose[pr.lm]
    ref_cam = problem.lms.ref_cam[pr.lm]
    pose_r = (poses.q[ref_pose], poses.t[ref_pose])
    x = problem.lms.x[pr.lm]
    # measuring-camera and reference-camera packs; `opt` flags camera 0 as
    # the calibrated block (see _residual_fn docstring).  With
    # use_per_pose_cam_params the intrinsics come from each pose's own
    # frozen vector instead of the rig (reference cpp:163-175).
    if config.use_per_pose_cam_params:
        params_m = poses.cam_params[pr.pose]
        params_r = poses.cam_params[ref_pose]
    else:
        params_m = rig.params[pr.cam]
        params_r = rig.params[ref_cam]
    cam_m = (params_m, rig.model[pr.cam], rig.tvs_q[pr.cam],
             rig.tvs_t[pr.cam], (pr.cam == 0).astype(dtype))
    cam_r = (params_r, rig.model[ref_cam], rig.tvs_q[ref_cam],
             rig.tvs_t[ref_cam], (ref_cam == 0).astype(dtype))
    z_ref = problem.lms.z_ref[pr.lm]
    has_z_ref = problem.lms.has_z_ref[pr.lm]

    zeros = jnp.zeros((pr.z.shape[0], tdim), dtype)

    def single(delta, z, pm_q, pm_t, prq, prt, xx, cm, cr, zr, hzr):
        return r_of(delta, z, (pm_q, pm_t), (prq, prt), xx, cm, cr, zr, hzr)

    in_axes = (0,) * 11
    r = jax.vmap(single, in_axes=in_axes)(
        zeros, pr.z, pose_m[0], pose_m[1], pose_r[0], pose_r[1], x,
        cam_m, cam_r, z_ref, has_z_ref)

    valid = pr.valid
    r = jnp.where(valid[:, None], r, 0.0)
    err_sq = jnp.sum(r * r, axis=-1)

    if not with_jacobians:
        z2 = jnp.zeros((pr.z.shape[0], 2, 0), dtype)
        return ProjEval(r, z2, z2, z2, z2, err_sq)

    J = jax.vmap(jax.jacfwd(single), in_axes=in_axes)(
        zeros, pr.z, pose_m[0], pose_m[1], pose_r[0], pose_r[1], x,
        cam_m, cam_r, z_ref, has_z_ref)  # (Nr, 2, tdim)
    # measuring pose == reference pose contributes no pose gradient
    # (parallel_algos.h: dz_dx zeroed when meas == ref); also mask invalids.
    same = (pr.pose == ref_pose) & (config.lm_size == 1)
    jmask = (valid & ~same)[:, None, None]
    J = jnp.where(valid[:, None, None], J, 0.0)
    j_meas = jnp.where(jmask, J[..., 0:6], 0.0)
    j_ref = jnp.where(jmask, J[..., 6:12], 0.0)
    j_lm = J[..., 12:12 + config.lm_size]
    if config.lm_size == 0:
        j_lm = jnp.zeros((pr.z.shape[0], 2, 0), dtype)
    j_cal = J[..., 12 + config.lm_size:]
    return ProjEval(r, j_meas, j_ref, j_lm, j_cal, err_sq)
