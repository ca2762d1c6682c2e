"""End-to-end reprojection BA tests (BASELINE config 1 / math_test analog).

Includes a brute-force oracle: the full Gauss-Newton system built by
`jax.jacfwd` over one *global* tangent vector (every pose + landmark at
once), compared block-by-block against the scatter/matmul assembly.  This is
the TPU build's analog of the reference's dense-Eigen ground-truth checks in
applications/math_test (SURVEY.md §3.5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ba_tpu.core import camera, lie
from ba_tpu.core.problem import BAConfig, ProblemBuilder, prepare_landmarks
from ba_tpu.core.residuals import reprojection
from ba_tpu.solver import assemble as asm_mod
from ba_tpu.solver import step as step_mod

FOV = [198.969, 198.1284, 329.9368, 240.1017, 0.9640582]


def make_scene(n_poses=8, n_lms=40, lm_size=1, seed=0, noise=0.0,
               n_anchor=2, perturb=0.05):
    """Circle of poses looking inward at landmarks near the origin."""
    rng = np.random.default_rng(seed)
    # robust off: the dense oracle and ground-truth recovery checks compare
    # the plain least-squares system (the robust path has its own test)
    cfg = BAConfig(pose_dim=6, lm_size=lm_size, use_dogleg=False,
                   use_robust_norm_for_proj_residuals=False)
    b = ProblemBuilder(cfg)
    cam = b.add_camera(FOV, camera.MODEL_FOV)

    # ground truth poses: on a circle of radius 5, z axis (optical) pointing
    # at the origin.  Camera frame: z forward, x right, y down.
    R_list, t_list = [], []
    for i in range(n_poses):
        ang = 2 * np.pi * i / n_poses
        pos = np.array([5 * np.cos(ang), 5 * np.sin(ang), 0.0])
        z = -pos / np.linalg.norm(pos)          # look at origin
        x = np.cross(np.array([0.0, 0, 1]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], axis=1)       # world-from-camera
        R_list.append(Rwc)
        t_list.append(pos)

    lms_w = rng.normal(size=(n_lms, 3)) * np.array([1.5, 1.5, 1.0])

    def project(Rwc, t, pw):
        pc = Rwc.T @ (pw - t)
        fx, fy, cx, cy, w = FOV
        xn, yn = pc[0] / pc[2], pc[1] / pc[2]
        r = np.sqrt(xn**2 + yn**2)
        factor = np.arctan(2 * r * np.tan(w / 2)) / (r * w) if r > 1e-9 \
            else 2 * np.tan(w / 2) / w
        return np.array([fx * factor * xn + cx, fy * factor * yn + cy])

    pose_ids = []
    for i in range(n_poses):
        q = np.roll(
            __import__("scipy.spatial.transform",
                       fromlist=["Rotation"]).Rotation.from_matrix(
                R_list[i]).as_quat(), 1)        # -> wxyz
        active = i >= n_anchor
        dq = lie.so3_exp(jnp.asarray(rng.normal(size=3) * perturb)) \
            if active else jnp.asarray([1.0, 0, 0, 0])
        q_pert = np.asarray(lie.quat_mul(jnp.asarray(q), dq))
        t_pert = t_list[i] + (rng.normal(size=3) * perturb * 5
                              if active else 0.0)
        pose_ids.append(b.add_pose(q_pert, t_pert, active=active,
                                   time=float(i)))

    lm_ids = []
    c0 = t_list[0]  # reference camera center
    for j in range(n_lms):
        if lm_size == 1:
            # inverse-depth landmarks only optimize depth along the ray
            # anchored at the reference observation — perturb depth only
            # (direction is data, like the reference's z_ref unprojection).
            ray = lms_w[j] - c0
            x_pert = c0 + ray * (1.0 + rng.normal() * perturb)
        else:
            x_pert = lms_w[j] + rng.normal(size=3) * perturb
        lm_ids.append(b.add_landmark(x_pert, ref_pose=0, ref_cam=cam))

    for i in range(n_poses):
        for j in range(n_lms):
            z = project(R_list[i], t_list[i], lms_w[j])
            if not (0 <= z[0] < 640 and 0 <= z[1] < 480):
                continue
            z = z + rng.normal(size=2) * noise
            b.add_projection_residual(z, pose_ids[i], lm_ids[j], cam)

    return b.build(), cfg


# ---------------------------------------------------------------------------
# Oracle: dense GN system via global jacfwd
# ---------------------------------------------------------------------------


def dense_oracle(problem, cfg):
    """Full J, r by differentiating a global-perturbation residual stack."""
    D, lmsz = cfg.pose_dim, cfg.lm_size
    P = problem.poses.q.shape[0]
    L = problem.lms.x.shape[0]

    def all_residuals(delta):
        dp = delta[: P * D].reshape(P, D)
        dl = delta[P * D:].reshape(L, lmsz)
        poses = problem.poses
        q, t = lie.se3_retract((poses.q, poses.t), dp[:, :6])
        x = problem.lms.x.at[:, 3].add(dl[:, 0]) if lmsz == 1 else \
            problem.lms.x.at[:, :3].add(dl)
        p2 = dataclasses.replace(
            problem,
            poses=dataclasses.replace(poses, q=q, t=t),
            lms=dataclasses.replace(problem.lms, x=x))
        ev = reprojection.evaluate(p2, cfg, with_jacobians=False)
        sw = jnp.sqrt(jnp.where(problem.proj.valid, problem.proj.weight,
                                0.0))
        return (ev.r * sw[:, None]).reshape(-1)

    n = P * D + L * lmsz
    r = all_residuals(jnp.zeros(n))
    J = jax.jacfwd(all_residuals)(jnp.zeros(n))
    # apply col mask like the assembly does
    pm = (problem.poses.mask[:, :D]
          & problem.poses.active[:, None]).reshape(-1)
    # `reliable` is reporting-only (reference h:590) — only `active` gates
    lm_ok = problem.lms.active[:, None].repeat(lmsz, 1).reshape(-1)
    mask = jnp.concatenate([pm, lm_ok])
    J = J * mask[None, :]
    return np.asarray(J), np.asarray(r), P * D


def test_assembly_matches_dense_oracle():
    problem, cfg = make_scene(n_poses=4, n_lms=6)
    problem = prepare_landmarks(problem, cfg)
    asm = asm_mod.assemble(problem, cfg)

    J, r, np_dim = dense_oracle(problem, cfg)
    H = J.T @ J
    g = J.T @ r
    U_o = H[:np_dim, :np_dim]
    W_o = H[:np_dim, np_dim:]
    V_o = H[np_dim:, np_dim:]

    np.testing.assert_allclose(np.asarray(asm.U), U_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(asm.W), W_o, atol=1e-8)
    L = asm.V.shape[0]
    V_blocks = np.zeros_like(V_o)
    for j in range(L):
        V_blocks[j, j] = np.asarray(asm.V)[j, 0, 0]
    np.testing.assert_allclose(V_blocks, V_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(asm.rhs_p), g[:np_dim], atol=1e-8)
    np.testing.assert_allclose(np.asarray(asm.rhs_l), g[np_dim:], atol=1e-8)

    # Schur system vs oracle (account for the 1e-6 V floor and masked diag)
    Vf = V_o + 1e-6 * np.eye(V_o.shape[0])
    S_o = U_o - W_o @ np.linalg.inv(Vf) @ W_o.T
    pm = np.asarray(asm.col_mask)
    S_ours = np.asarray(asm.S) - np.diag(np.where(pm, 0.0, 1e6))
    np.testing.assert_allclose(S_ours, S_o, atol=1e-6)


def test_gn_converges_noiseless():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.03)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.initial_cost > 1.0
    assert summary.final_cost < 1e-4, summary
    assert summary.is_good


def test_gn_recovers_ground_truth_landmarks():
    problem, cfg = make_scene(n_poses=8, n_lms=30, perturb=0.02, seed=3)
    # ground truth scene regenerated for comparison
    rng = np.random.default_rng(3)
    lms_true = rng.normal(size=(30, 3)) * np.array([1.5, 1.5, 1.0])
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4
    got = np.asarray(solved.lms.x_w[:30, :3] / solved.lms.x_w[:30, 3:4])
    np.testing.assert_allclose(got, lms_true, atol=1e-4)


def test_dogleg_converges():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.05)
    cfg = dataclasses.replace(cfg, use_dogleg=True)
    solved, summary = step_mod.solve(problem, cfg, max_iter=20,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_xyz_landmark_mode_converges():
    problem, cfg = make_scene(n_poses=6, n_lms=30, lm_size=3, perturb=0.02)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_robust_norm_downweights_outliers():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02, seed=5)
    cfg = dataclasses.replace(cfg,
                              use_robust_norm_for_proj_residuals=True)
    # corrupt 5% of observations
    z = np.asarray(problem.proj.z).copy()
    valid = np.asarray(problem.proj.valid)
    n_valid = valid.sum()
    rng = np.random.default_rng(0)
    bad = rng.choice(np.flatnonzero(valid), size=max(1, n_valid // 20),
                     replace=False)
    z[bad] += rng.normal(size=(len(bad), 2)) * 80.0
    problem = dataclasses.replace(
        problem, proj=dataclasses.replace(problem.proj, z=jnp.asarray(z)))
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    # non-robust solve on the same corrupted data, for comparison
    cfg_plain = dataclasses.replace(
        cfg, use_robust_norm_for_proj_residuals=False)
    solved_plain, _ = step_mod.solve(problem, cfg_plain, max_iter=15,
                                     use_imu=False)
    lms_true = np.random.default_rng(5).normal(size=(40, 3)) * \
        np.array([1.5, 1.5, 1.0])

    def med_err(s):
        got = np.asarray(s.lms.x_w[:40, :3] / s.lms.x_w[:40, 3:4])
        return np.median(np.linalg.norm(got - lms_true, axis=-1))

    e_rob, e_plain = med_err(solved), med_err(solved_plain)
    # Huber downweighting must substantially beat plain least squares
    assert e_rob < 0.15, e_rob
    assert e_rob < 0.5 * e_plain, (e_rob, e_plain)
