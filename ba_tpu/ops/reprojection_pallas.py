"""Pallas TPU kernel: fused reprojection residual + analytic Jacobians.

The projection evaluation is the per-iteration hot loop outside the big
matmuls.  The autodiff path (vmap(jacfwd)) lowers to hundreds of small fused
HLO ops; this kernel computes the closed-form residual + Jacobians
(ops/proj_math.py) in one pass over a feature-major layout — features on
sublanes, residuals on lanes — so every line is a full-width VPU op and the
only HBM traffic is one read of the gathered features and one write of the
outputs.

Used when `BAConfig.use_pallas_proj` is set (lm_size == 1, no
self-calibration); falls back to interpret mode off-TPU so the f64 oracle
tests exercise the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import proj_math

# each grid step processes an (8, 512) tile of residuals per feature, so
# every elementwise op runs at full VPU width (8 sublanes x 128 lanes)
LANES = 512
SUBS = 8
TILE = SUBS * LANES


def _kernel(in_ref, out_ref):
    x = in_ref[:, 0]                        # (N_FEAT, 8, LANES)
    feat = [x[i] for i in range(proj_math.N_FEAT)]
    out = proj_math.proj_forward(feat, atan_fn=proj_math.atan_poly)
    out_ref[:, 0] = out


def gather_features(problem, config):
    """(N_FEAT, Nr) feature matrix for the kernel.

    One contiguous row-gather per entity table + a single transpose —
    35 per-column gathers were 3x the kernel's own runtime.
    """
    pr = problem.proj
    poses = problem.poses
    lms = problem.lms
    ref_pose = lms.ref_pose[pr.lm]
    ref_cam = lms.ref_cam[pr.lm]
    dtype = pr.z.dtype
    k = 2.0 * jnp.tan(0.5 * problem.rig.params[:, 4])
    cols = jnp.concatenate([
        pr.z,
        poses.q[pr.pose], poses.t[pr.pose],
        poses.q[ref_pose], poses.t[ref_pose],
        lms.x[pr.lm],
        problem.rig.params[pr.cam, :5],
        k[pr.cam][:, None],
        problem.rig.model[pr.cam].astype(dtype)[:, None],
        pr.valid.astype(dtype)[:, None],
        problem.rig.tvs_q[pr.cam], problem.rig.tvs_t[pr.cam],
        problem.rig.tvs_q[ref_cam], problem.rig.tvs_t[ref_cam],
        (pr.pose == ref_pose).astype(dtype)[:, None],
    ], axis=1)
    return cols.T


def evaluate_pallas(problem, config):
    """ProjEval via the fused kernel (see core/residuals/reprojection.py
    for the NamedTuple contract)."""
    from ..core.residuals.reprojection import ProjEval

    feat = gather_features(problem, config)
    Nr = feat.shape[1]
    n_pad = -Nr % TILE
    feat = jnp.pad(feat, ((0, 0), (0, n_pad)))
    total = Nr + n_pad
    G = total // TILE
    feat = feat.reshape(proj_math.N_FEAT, G, SUBS, LANES)

    interpret = (feat.dtype != jnp.float32
                 or jax.default_backend() != "tpu")
    out = pl.pallas_call(
        _kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((proj_math.N_FEAT, 1, SUBS, LANES),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((proj_math.N_OUT, 1, SUBS, LANES),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((proj_math.N_OUT, G, SUBS, LANES),
                                       feat.dtype),
        interpret=interpret,
    )(feat)
    o = out.reshape(proj_math.N_OUT, total)[:, :Nr].T     # one transpose

    r = o[:, 0:2]
    j_meas = o[:, 2:14].reshape(Nr, 2, 6)
    j_ref = o[:, 14:26].reshape(Nr, 2, 6)
    j_lm = o[:, 26:28].reshape(Nr, 2, 1)
    err_sq = o[:, 28]
    j_cal = jnp.zeros((Nr, 2, config.calib_dim), feat.dtype)
    return ProjEval(r=r, j_meas=j_meas, j_ref=j_ref, j_lm=j_lm,
                    j_cal=j_cal, err_sq=err_sq)
