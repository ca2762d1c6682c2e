"""IMU preintegration tests: analytic trajectories, FD Jacobians, and the
GPS+IMU fixed-lag smoother analog of the reference's
applications/unary_binary_imu_test (SURVEY.md §3.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ba_tpu.core import lie
from ba_tpu.core.problem import BAConfig, ProblemBuilder
from ba_tpu.core.residuals import imu as imu_mod
from ba_tpu.solver import step as step_mod

G = lie.GRAVITY
g_vec = jnp.array([0.0, 0.0, -G])


def test_integrate_stationary():
    """Body at rest: accelerometer measures -g in body frame; the corrected
    specific force cancels gravity exactly."""
    n = 11
    times = jnp.linspace(0.0, 1.0, n)
    w = jnp.zeros((n, 3))
    a = jnp.tile(jnp.array([0.0, 0.0, G]), (n, 1))
    t, q, v = imu_mod.integrate_span(
        lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(6), w, a, times, g_vec)
    np.testing.assert_allclose(t, 0.0, atol=1e-12)
    np.testing.assert_allclose(v, 0.0, atol=1e-12)
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-12)


def test_integrate_free_fall():
    """Free fall: zero specific force; v = v0 + g t, p = v0 t + g t^2 / 2
    (RK4 is exact for polynomials)."""
    n = 9
    T = 2.0
    times = jnp.linspace(0.0, T, n)
    v0 = jnp.array([1.0, -0.5, 0.3])
    t, q, v = imu_mod.integrate_span(
        lie.quat_identity(jnp.float64), jnp.zeros(3), v0,
        jnp.zeros(6), jnp.zeros((n, 3)), jnp.zeros((n, 3)), times, g_vec)
    np.testing.assert_allclose(v, v0 + g_vec * T, atol=1e-12)
    np.testing.assert_allclose(t, v0 * T + 0.5 * g_vec * T * T, atol=1e-12)


def test_integrate_constant_rotation():
    """Constant body rate about z: q(T) = q0 * exp(w T)."""
    n = 101
    T = 1.0
    times = jnp.linspace(0.0, T, n)
    wz = jnp.array([0.0, 0.0, 1.2])
    w = jnp.tile(wz, (n, 1))
    # specific force that exactly cancels gravity in the rotating frame:
    # f_body = -R(t)^T g; supply per-sample values.
    a = []
    for i in range(n):
        q_i = lie.so3_exp(wz * times[i])
        a.append(-lie.quat_rotate(lie.quat_conj(q_i), g_vec))
    a = jnp.stack(a)
    t, q, v = imu_mod.integrate_span(
        lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(6), w, a, times, g_vec)
    q_true = lie.so3_exp(wz * T)
    assert abs(float(jnp.abs(jnp.sum(q * q_true)) - 1.0)) < 1e-8
    np.testing.assert_allclose(v, 0.0, atol=1e-5)


def test_padded_steps_are_noops():
    n = 8
    times = np.linspace(0.0, 1.0, n)
    times_padded = np.concatenate([times, [times[-1]]*4])
    w = np.random.default_rng(0).normal(size=(n, 3)) * 0.1
    a = np.random.default_rng(1).normal(size=(n, 3))
    w_p = np.concatenate([w, np.zeros((4, 3))])
    a_p = np.concatenate([a, np.zeros((4, 3))])
    args = (lie.quat_identity(jnp.float64), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(6))
    y1 = imu_mod.integrate_span(*args, jnp.asarray(w), jnp.asarray(a),
                                jnp.asarray(times), g_vec)
    y2 = imu_mod.integrate_span(*args, jnp.asarray(w_p), jnp.asarray(a_p),
                                jnp.asarray(times_padded), g_vec)
    for u, v_ in zip(y1, y2):
        np.testing.assert_allclose(u, v_, atol=1e-14)


def _simulate_trajectory(n_poses=6, hz=50, seed=0):
    """Smooth analytic trajectory with exact IMU measurements.

    Position p(t) = [sin t, 0.5 cos 2t, 0.1 t]; orientation yaw(t) = 0.3 t.
    Accel measured in body frame: a_meas = R^T (p_ddot - g).
    """
    def p(t):
        return np.array([np.sin(t), 0.5 * np.cos(2 * t), 0.1 * t])

    def p_dot(t):
        return np.array([np.cos(t), -np.sin(2 * t), 0.1])

    def p_ddot(t):
        return np.array([-np.sin(t), -2 * np.cos(2 * t), 0.0])

    yaw_rate = 0.3

    def q_of(t):
        return np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, yaw_rate * t])))

    pose_times = np.arange(n_poses, dtype=np.float64)
    spans = []
    for i in range(n_poses - 1):
        ts = np.linspace(pose_times[i], pose_times[i + 1],
                         int(hz * (pose_times[i + 1] - pose_times[i])) + 1)
        w = np.tile([0.0, 0.0, yaw_rate], (len(ts), 1))
        a = np.stack([
            np.asarray(lie.quat_rotate(
                lie.quat_conj(jnp.asarray(q_of(t))),
                jnp.asarray(p_ddot(t) - np.array([0, 0, -G]))))
            for t in ts])
        spans.append((w, a, ts))
    gt = dict(p=[p(t) for t in pose_times],
              v=[p_dot(t) for t in pose_times],
              q=[q_of(t) for t in pose_times])
    return pose_times, spans, gt


def test_integrate_matches_analytic_trajectory():
    pose_times, spans, gt = _simulate_trajectory(hz=100)
    w, a, ts = spans[0]
    t, q, v = imu_mod.integrate_span(
        jnp.asarray(gt["q"][0]), jnp.asarray(gt["p"][0]),
        jnp.asarray(gt["v"][0]), jnp.zeros(6),
        jnp.asarray(w), jnp.asarray(a), jnp.asarray(ts), g_vec)
    # measurement-lerp inside RK4 limits convergence to O(h^2) — the
    # reference integrator has the same property (Types.h:383-388)
    np.testing.assert_allclose(t, gt["p"][1], atol=1e-4)
    np.testing.assert_allclose(v, gt["v"][1], atol=1e-4)
    dq = float(jnp.abs(jnp.sum(q * jnp.asarray(gt["q"][1]))))
    assert abs(dq - 1.0) < 1e-7


def _build_vi_problem(perturb=0.05, pose_dim=9, with_unary=True, seed=0):
    pose_times, spans, gt = _simulate_trajectory()
    rng = np.random.default_rng(seed)
    cfg = BAConfig(pose_dim=pose_dim, lm_size=0, use_dogleg=False,
                   error_change_threshold=0.0,
                   param_change_threshold=1e-10)
    b = ProblemBuilder(cfg)
    ids = []
    for i, t in enumerate(pose_times):
        if i == 0:
            q_i, t_i, v_i = gt["q"][0], gt["p"][0], gt["v"][0]
        else:
            dq = np.asarray(lie.so3_exp(jnp.asarray(
                rng.normal(size=3) * perturb)))
            q_i = np.asarray(lie.quat_mul(jnp.asarray(gt["q"][i]),
                                          jnp.asarray(dq)))
            t_i = gt["p"][i] + rng.normal(size=3) * perturb
            v_i = gt["v"][i] + rng.normal(size=3) * perturb
        ids.append(b.add_pose(q_i, t_i, v=v_i, active=(i > 0), time=t))
    for i, (w, a, ts) in enumerate(spans):
        b.add_imu_residual(ids[i], ids[i + 1], w, a, ts)
    if with_unary:
        for i in range(1, len(ids)):
            b.add_unary_constraint(
                ids[i], gt["q"][i], gt["p"][i],
                cov=np.eye(6) * 1e2)
    return b.build(), cfg, gt


def test_imu_jacobians_match_fd():
    problem, cfg, gt = _build_vi_problem(perturb=0.02)
    ev = imu_mod.evaluate(problem, cfg, with_jacobians=True)
    D = cfg.pose_dim

    im = problem.imu
    poses = problem.poses
    k = 1  # check residual 1
    eps = 1e-6

    def res_at(d):
        d = jnp.asarray(d)
        q1, t1 = lie.se3_retract((poses.q[im.pose1[k]],
                                  poses.t[im.pose1[k]]), d[:6])
        v1 = poses.v[im.pose1[k]] + d[6:9]
        q2, t2 = lie.se3_retract((poses.q[im.pose2[k]],
                                  poses.t[im.pose2[k]]), d[D:D + 6])
        v2 = poses.v[im.pose2[k]] + d[D + 6:D + 9]
        yt, yq, yv = imu_mod.integrate_span(
            q1, t1, v1, poses.b[im.pose1[k]], im.w[k], im.a[k], im.time[k],
            problem.g_vec)
        rp = lie.se3_log_decoupled((yq, yt), (q2, t2))
        return np.asarray(jnp.concatenate([rp, yv - v2]))

    J_fd = np.zeros((9, 2 * D))
    for i in range(2 * D):
        dp = np.zeros(2 * D)
        dp[i] = eps
        J_fd[:, i] = (res_at(dp) - res_at(-dp)) / (2 * eps)

    # The whitening factor S is only defined up to an orthogonal transform
    # (any S with S^T S = cov_inv is valid — the solver only consumes
    # quadratic forms), so compare the whitening-invariant normal-equation
    # blocks: J_w^T J_w == J_fd^T cov_inv J_fd, with cov_inv recomputed
    # exactly as evaluate() does.
    r_imu = jnp.concatenate([
        jnp.full((3,), cfg.gyro_sigma**2, jnp.float64),
        jnp.full((3,), cfg.accel_sigma**2, jnp.float64)])
    y10, C10 = imu_mod.integrate_cov(
        poses.q[im.pose1[k]], poses.t[im.pose1[k]], poses.v[im.pose1[k]],
        poses.b[im.pose1[k]], im.w[k], im.a[k], im.time[k], problem.g_vec,
        r_imu)

    def res_of_y(y10):
        yt, yq, yv = imu_mod._unflat(y10)
        rp = lie.se3_log_decoupled(
            (lie.quat_normalize(yq), yt),
            (poses.q[im.pose2[k]], poses.t[im.pose2[k]]))
        return jnp.concatenate([rp, yv])

    Jy = jax.jacfwd(res_of_y)(y10)
    C9 = np.asarray(Jy @ C10 @ Jy.T) + 1e-12 * np.eye(9)
    cov_inv = np.linalg.inv(C9)
    Jw = np.concatenate([np.asarray(ev.j1[k]), np.asarray(ev.j2[k])],
                        axis=1)                       # (9, 2D) whitened
    want = J_fd.T @ cov_inv @ J_fd                    # (2D, 2D)
    got = Jw.T @ Jw
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4 * scale)


def test_vi_smoother_converges():
    """unary_binary_imu_test analog: priors + IMU spans, 9-dof states."""
    problem, cfg, gt = _build_vi_problem(perturb=0.05)
    solved, summary = step_mod.solve(problem, cfg, max_iter=20, use_imu=True)
    assert summary.final_cost < summary.initial_cost * 1e-6, summary
    # recovered trajectory close to ground truth
    for i in range(1, 6):
        np.testing.assert_allclose(np.asarray(solved.poses.t[i]),
                                   gt["p"][i], atol=1e-3)
        np.testing.assert_allclose(np.asarray(solved.poses.v[i]),
                                   gt["v"][i], atol=1e-3)


def test_imu_only_dead_reckoning_chain():
    """No priors: chained IMU residuals from an anchored first pose must
    pull the perturbed trajectory to the integrated one exactly."""
    problem, cfg, gt = _build_vi_problem(perturb=0.03, with_unary=False)
    solved, summary = step_mod.solve(problem, cfg, max_iter=25, use_imu=True)
    assert summary.final_cost < 1e-10, summary


def test_robust_imu_downweights_corrupted_span():
    """A corrupted IMU span gets persistently downweighted (reference §7.4
    cov_inv-in-place rescaling; scale from IMU errors, not quirk Q1)."""
    problem, cfg, gt = _build_vi_problem(perturb=0.02, seed=2)
    # corrupt one span's accelerometer hard
    a = np.asarray(problem.imu.a).copy()
    a[2] += 5.0
    problem = dataclasses.replace(
        problem, imu=dataclasses.replace(problem.imu, a=jnp.asarray(a)))

    cfg = dataclasses.replace(cfg, use_dogleg=True)
    cfg_rob = dataclasses.replace(
        cfg, use_robust_norm_for_inertial_residuals=True)
    srob, sumrob = step_mod.solve(problem, cfg_rob, max_iter=30,
                                  use_imu=True)
    splain, sumplain = step_mod.solve(problem, cfg, max_iter=30,
                                      use_imu=True)

    def traj_err(s):
        return max(np.abs(np.asarray(s.poses.t[i]) - gt["p"][i]).max()
                   for i in range(1, 6))

    # the corrupted span must pull the plain solution away from the priors
    # substantially more than the robust one
    assert traj_err(srob) < 0.5 * traj_err(splain), (
        traj_err(srob), traj_err(splain))
    # and the weight state must have decreased for the bad span
    assert float(srob.imu.weight[2]) < 0.5
