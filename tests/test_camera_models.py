"""Poly3-radial + equidistant camera models and per-pose cam params.

Reference surface: arbitrary Calibu models behind `Transfer3d`
(SURVEY.md L0) and `use_per_pose_cam_params` (BundleAdjuster.h:96,
cpp:163-175 — per-pose *frozen* intrinsics swapped in per residual).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ba_tpu.core import camera
from ba_tpu.core.problem import BAConfig, ProblemBuilder, prepare_landmarks
from ba_tpu.core.residuals import reprojection
from ba_tpu.solver import step as step_mod

POLY3 = np.array([420.0, 420.0, 320.0, 240.0, -0.28, 0.07, -0.004])
EQUI = np.array([380.0, 380.0, 320.0, 240.0])


def np_poly3_project(params, p):
    fx, fy, cx, cy, k1, k2, k3 = params
    xn, yn = p[..., 0] / p[..., 2], p[..., 1] / p[..., 2]
    r2 = xn**2 + yn**2
    f = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    return np.stack([fx * f * xn + cx, fy * f * yn + cy], axis=-1)


def np_equi_project(params, p):
    fx, fy, cx, cy = params
    xn, yn = p[..., 0] / p[..., 2], p[..., 1] / p[..., 2]
    r = np.sqrt(xn**2 + yn**2)
    f = np.where(r < 1e-12, 1.0, np.arctan(r) / np.maximum(r, 1e-12))
    return np.stack([fx * f * xn + cx, fy * f * yn + cy], axis=-1)


def _rays(n=50, seed=0):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(n, 3)) * np.array([0.4, 0.3, 0.1])
    p[:, 2] += 2.0
    return p


def test_poly3_matches_numpy_oracle():
    p = _rays()
    got = camera.project(jnp.asarray(POLY3), camera.MODEL_POLY3,
                         jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(got), np_poly3_project(POLY3, p),
                               atol=1e-9)


def test_equidistant_matches_numpy_oracle():
    p = _rays(seed=1)
    got = camera.project(jnp.asarray(EQUI), camera.MODEL_EQUIDISTANT,
                         jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(got), np_equi_project(EQUI, p),
                               atol=1e-9)


def test_poly3_unproject_roundtrip():
    p = _rays(seed=2)
    params = jnp.asarray(POLY3)
    pix = camera.project(params, camera.MODEL_POLY3, jnp.asarray(p))
    ray = camera.unproject(params, camera.MODEL_POLY3, pix)
    pix2 = camera.project(params, camera.MODEL_POLY3, ray)
    np.testing.assert_allclose(np.asarray(pix2), np.asarray(pix), atol=1e-6)


def test_equidistant_unproject_roundtrip():
    p = _rays(seed=3)
    params = jnp.asarray(EQUI)
    pix = camera.project(params, camera.MODEL_EQUIDISTANT, jnp.asarray(p))
    ray = camera.unproject(params, camera.MODEL_EQUIDISTANT, pix)
    pix2 = camera.project(params, camera.MODEL_EQUIDISTANT, ray)
    np.testing.assert_allclose(np.asarray(pix2), np.asarray(pix), atol=1e-8)


def test_jacobians_finite_all_models():
    p = jnp.asarray(_rays(4))
    for params, model in ((jnp.asarray(POLY3), camera.MODEL_POLY3),
                          (jnp.asarray(np.concatenate([EQUI, np.zeros(3)])),
                           camera.MODEL_EQUIDISTANT)):
        J = jax.vmap(jax.jacfwd(
            lambda x, pa=params, m=model: camera.project(pa, m, x)))(p)
        assert bool(jnp.all(jnp.isfinite(J)))
        assert float(jnp.abs(J).max()) > 1.0


def _scene_with_model(params_np, model, n_poses=6, n_lms=30, perturb=0.03,
                      seed=0, per_pose=False):
    """make_scene analog projecting with an arbitrary model."""
    rng = np.random.default_rng(seed)
    cfg = BAConfig(pose_dim=6, lm_size=1, use_dogleg=False,
                   use_robust_norm_for_proj_residuals=False,
                   use_per_pose_cam_params=per_pose)
    b = ProblemBuilder(cfg)
    cam = b.add_camera(params_np, model)

    from scipy.spatial.transform import Rotation

    from ba_tpu.core import lie

    R_list, t_list, pose_ids = [], [], []
    pose_params = []
    for i in range(n_poses):
        ang = 2 * np.pi * i / n_poses
        pos = np.array([5 * np.cos(ang), 5 * np.sin(ang), 0.0])
        z = -pos / np.linalg.norm(pos)
        x = np.cross(np.array([0.0, 0, 1]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], axis=1)
        R_list.append(Rwc)
        t_list.append(pos)
        q = np.roll(Rotation.from_matrix(Rwc).as_quat(), 1)
        active = i >= 2
        if active and perturb:
            dq = lie.so3_exp(jnp.asarray(rng.normal(size=3) * perturb))
            q = np.asarray(lie.quat_mul(jnp.asarray(q), dq))
            t = t_list[i] + rng.normal(size=3) * perturb * 5
        else:
            t = t_list[i]
        # per-pose mode: each pose gets slightly different focal lengths
        pp = np.array(params_np, float).copy()
        if per_pose:
            pp[0] *= 1.0 + 0.02 * i
            pp[1] *= 1.0 + 0.02 * i
        pose_params.append(pp)
        pose_ids.append(b.add_pose(q, t, active=active, time=float(i),
                                   cam_params=pp if per_pose else None))

    lms_w = rng.normal(size=(n_lms, 3)) * np.array([1.2, 1.2, 0.8])
    c0 = t_list[0]
    lm_ids = []
    for j in range(n_lms):
        ray = lms_w[j] - c0
        x_pert = c0 + ray * (1.0 + (rng.normal() * perturb if perturb
                                    else 0.0))
        lm_ids.append(b.add_landmark(x_pert, ref_pose=0, ref_cam=cam))

    proj_np = (np_poly3_project if model == camera.MODEL_POLY3
               else np_equi_project)
    for i in range(n_poses):
        for j in range(n_lms):
            pc = R_list[i].T @ (lms_w[j] - t_list[i])
            z = proj_np(pose_params[i] if per_pose else
                        np.array(params_np, float), pc[None])[0]
            if not (0 <= z[0] < 640 and 0 <= z[1] < 480):
                continue
            b.add_projection_residual(z, pose_ids[i], lm_ids[j], cam)
    return b.build(), cfg, lms_w


def test_poly3_ba_converges():
    problem, cfg, lms_w = _scene_with_model(POLY3, camera.MODEL_POLY3)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_equidistant_ba_converges():
    problem, cfg, lms_w = _scene_with_model(EQUI, camera.MODEL_EQUIDISTANT)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_per_pose_cam_params_zero_at_truth():
    """Residuals vanish at ground truth only if evaluation really uses each
    pose's own intrinsics (they differ per pose by construction)."""
    problem, cfg, _ = _scene_with_model(POLY3, camera.MODEL_POLY3,
                                        perturb=0.0, per_pose=True)
    problem = prepare_landmarks(problem, cfg)
    ev = reprojection.evaluate(problem, cfg, with_jacobians=False)
    r = np.asarray(ev.r)[np.asarray(problem.proj.valid)]
    assert np.abs(r).max() < 1e-6, np.abs(r).max()
    # sanity: with the rig camera's (pose-0) params instead, residuals are
    # far from zero
    cfg_rig = dataclasses.replace(cfg, use_per_pose_cam_params=False)
    ev2 = reprojection.evaluate(problem, cfg_rig, with_jacobians=False)
    r2 = np.asarray(ev2.r)[np.asarray(problem.proj.valid)]
    assert np.abs(r2).max() > 1.0


def test_per_pose_cam_params_ba_converges():
    problem, cfg, _ = _scene_with_model(POLY3, camera.MODEL_POLY3,
                                        perturb=0.03, per_pose=True)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary
