"""Stereo-rig regression tests for the two round-1 correctness defects:

1. The reference-view transform must use the landmark's *reference camera*
   extrinsics (reference gathers lm.ref_cam_id, parallel_algos.h:47-48,
   BundleAdjuster.cpp:159-160) — not the measuring camera's.  With a 0.5 m
   baseline the old code produced ~25 px residuals at ground truth.
2. Same-pose cross-camera observations (the primary stereo depth
   constraint) must be kept; only the ref-camera observation at the ref
   pose is skipped (cam_id == lm.ref_cam_id, BundleAdjuster.h:480-501).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ba_tpu.core import camera, lie
from ba_tpu.core.problem import BAConfig, ProblemBuilder, prepare_landmarks
from ba_tpu.core.residuals import reprojection
from ba_tpu.solver import step as step_mod

FOV = [198.969, 198.1284, 329.9368, 240.1017, 0.9640582]
BASELINE = 0.5


def _project_np(Rws, tws, pw):
    pc = Rws.T @ (pw - tws)
    fx, fy, cx, cy, w = FOV
    xn, yn = pc[0] / pc[2], pc[1] / pc[2]
    r = np.sqrt(xn**2 + yn**2)
    factor = np.arctan(2 * r * np.tan(w / 2)) / (r * w) if r > 1e-9 \
        else 2 * np.tan(w / 2) / w
    return np.array([fx * factor * xn + cx, fy * factor * yn + cy])


def make_stereo_scene(n_poses=4, n_lms=24, seed=0, perturb=0.0):
    rng = np.random.default_rng(seed)
    cfg = BAConfig(pose_dim=6, lm_size=1, use_dogleg=False,
                   use_robust_norm_for_proj_residuals=False)
    b = ProblemBuilder(cfg)
    cam0 = b.add_camera(FOV, camera.MODEL_FOV)
    cam1 = b.add_camera(FOV, camera.MODEL_FOV,
                        tvs_t=(BASELINE, 0.0, 0.0))

    R_list, t_list = [], []
    for i in range(n_poses):
        ang = 2 * np.pi * i / n_poses
        pos = np.array([5 * np.cos(ang), 5 * np.sin(ang), 0.0])
        z = -pos / np.linalg.norm(pos)
        x = np.cross(np.array([0.0, 0, 1]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_list.append(np.stack([x, y, z], axis=1))
        t_list.append(pos)

    lms_w = rng.normal(size=(n_lms, 3)) * np.array([1.2, 1.2, 0.8])

    from scipy.spatial.transform import Rotation

    pose_ids = []
    for i in range(n_poses):
        q = np.roll(Rotation.from_matrix(R_list[i]).as_quat(), 1)
        active = i >= 1
        if active and perturb:
            dq = lie.so3_exp(jnp.asarray(rng.normal(size=3) * perturb))
            q = np.asarray(lie.quat_mul(jnp.asarray(q), dq))
            t = t_list[i] + rng.normal(size=3) * perturb * 5
        else:
            t = t_list[i]
        pose_ids.append(b.add_pose(q, t, active=active, time=float(i)))

    lm_ids = []
    c0 = t_list[0]
    for j in range(n_lms):
        if perturb:
            ray = lms_w[j] - c0
            x_pert = c0 + ray * (1.0 + rng.normal() * perturb)
        else:
            x_pert = lms_w[j]
        lm_ids.append(b.add_landmark(x_pert, ref_pose=0, ref_cam=cam0))

    n_added = n_skipped = 0
    for i in range(n_poses):
        for j in range(n_lms):
            for ci, dtv in ((cam0, np.zeros(3)),
                            (cam1, np.array([BASELINE, 0, 0]))):
                tws = t_list[i] + R_list[i] @ dtv
                z = _project_np(R_list[i], tws, lms_w[j])
                if not (0 <= z[0] < 640 and 0 <= z[1] < 480):
                    continue
                before = len(b.proj)
                b.add_projection_residual(z, pose_ids[i], lm_ids[j], ci)
                if len(b.proj) > before:
                    n_added += 1
                else:
                    n_skipped += 1
    return b.build(), cfg, n_added, n_skipped, lms_w


def test_same_pose_cross_camera_rows_kept():
    problem, cfg, n_added, n_skipped, _ = make_stereo_scene(n_lms=12)
    # only the ref-cam observation at the ref pose is skipped — one per
    # landmark; the same-pose cam1 observation must be present
    assert n_skipped == 12
    pr = problem.proj
    same_pose = (np.asarray(pr.pose) == 0) & np.asarray(pr.valid)
    assert same_pose.sum() == 12  # all 12 from camera 1
    assert (np.asarray(pr.cam)[same_pose] == 1).all()


def test_residuals_zero_at_ground_truth():
    problem, cfg, _, _, _ = make_stereo_scene()
    problem = prepare_landmarks(problem, cfg)
    ev = reprojection.evaluate(problem, cfg, with_jacobians=True)
    r = np.asarray(ev.r)[np.asarray(problem.proj.valid)]
    # the round-1 defect produced ~25 px here
    assert np.abs(r).max() < 1e-6, np.abs(r).max()


def test_same_pose_rows_constrain_depth_only():
    problem, cfg, _, _, _ = make_stereo_scene()
    problem = prepare_landmarks(problem, cfg)
    ev = reprojection.evaluate(problem, cfg, with_jacobians=True)
    pr = problem.proj
    same = (np.asarray(pr.pose)
            == np.asarray(problem.lms.ref_pose)[np.asarray(pr.lm)])
    same &= np.asarray(pr.valid)
    assert same.any()
    np.testing.assert_allclose(np.asarray(ev.j_meas)[same], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ev.j_ref)[same], 0.0, atol=1e-12)
    # but the stereo rows must carry depth information
    jl = np.asarray(ev.j_lm)[same]
    assert np.abs(jl).max() > 1.0, np.abs(jl).max()


def test_stereo_depth_recovery_two_poses():
    """With only 2 poses the same-pose stereo rows are the depth signal."""
    problem, cfg, _, _, lms_w = make_stereo_scene(n_poses=2, n_lms=16,
                                                  perturb=0.03, seed=2)
    solved, summary = step_mod.solve(problem, cfg, max_iter=20,
                                     use_imu=False)
    assert summary.final_cost < 1e-5, summary
    got = np.asarray(solved.lms.x_w[:16, :3] / solved.lms.x_w[:16, 3:4])
    np.testing.assert_allclose(got, lms_w, atol=1e-3)


def test_stereo_ba_converges():
    problem, cfg, _, _, lms_w = make_stereo_scene(n_poses=4, n_lms=24,
                                                  perturb=0.03, seed=3)
    solved, summary = step_mod.solve(problem, cfg, max_iter=20,
                                     use_imu=False)
    assert summary.final_cost < 1e-5, summary
    got = np.asarray(solved.lms.x_w[:24, :3] / solved.lms.x_w[:24, 3:4])
    np.testing.assert_allclose(got, lms_w, atol=1e-3)
