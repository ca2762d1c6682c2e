"""Sliding-window marginalization tests.

Mirrors the role of matlab/test_marginalization.py in the reference: the
prior must equal the brute-force Schur complement of the departing block of
the true Gauss-Newton Hessian.  Exactness properties tested:
  * prior H/g == numpy Schur complement of the jacfwd-built sub-Hessian;
  * sequential marginalization composes exactly (marg 0 then 1 == marg {0,1});
  * fixed-lag solve tracks the batch solution (approximately — the problem
    is nonlinear, one-time linearization is the standard approximation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ba_tpu.core import lie
from ba_tpu.core.problem import BAConfig, ProblemBuilder
from ba_tpu.core.residuals import prior as prior_mod
from ba_tpu.io import simulate_vins as sv
from ba_tpu.solver import step as step_mod
from ba_tpu.solver import window as window_mod

IDQ = np.array([1.0, 0, 0, 0])


def _linear_chain(n=6, seed=0, perturb=0.3):
    """Translation-perturbed pose chain: binary odometry + unary prior."""
    rng = np.random.default_rng(seed)
    cfg = BAConfig(pose_dim=6, lm_size=0, use_dogleg=False,
                   error_change_threshold=0.0, param_change_threshold=1e-12,
                   enable_auto_regularization=False)
    b = ProblemBuilder(cfg)
    t_true = np.cumsum(rng.normal(size=(n, 3)), axis=0)
    ids = []
    for i in range(n):
        t0 = t_true[i] + rng.normal(size=3) * perturb
        ids.append(b.add_pose(IDQ, t0, active=True, time=float(i)))
    b.add_unary_constraint(ids[0], IDQ, t_true[0], cov=np.eye(6) * 1e-6)
    for i in range(n - 1):
        meas = t_true[i + 1] - t_true[i] + rng.normal(size=3) * 0.05
        cov = np.eye(6) * rng.uniform(0.01, 0.1)
        b.add_binary_constraint(ids[i], ids[i + 1], IDQ, meas, cov=cov)
    for (i, j) in [(0, 3), (1, 4), (2, 5)]:
        if j < n:
            meas = t_true[j] - t_true[i] + rng.normal(size=3) * 0.05
            b.add_binary_constraint(ids[i], ids[j], IDQ, meas,
                                    cov=np.eye(6) * 0.05)
    return b.build(), cfg, t_true


def _pose_graph_oracle(problem, cfg):
    """Dense H, g of the (unary+binary) system via global jacfwd."""
    P = problem.poses.q.shape[0]
    D = cfg.pose_dim

    def stack(delta):
        dp = delta.reshape(P, D)
        poses = problem.poses
        q, t = lie.se3_retract((poses.q, poses.t), dp[:, :6])
        p2 = dataclasses.replace(
            problem, poses=dataclasses.replace(poses, q=q, t=t))
        ue = prior_mod.evaluate_unary(p2, cfg, with_jacobians=False)
        be = prior_mod.evaluate_binary(p2, cfg, with_jacobians=False)
        return jnp.concatenate([ue.r.reshape(-1), be.r.reshape(-1)])

    z = jnp.zeros(P * D)
    r = stack(z)
    J = jax.jacfwd(stack)(z)
    mask = (problem.poses.mask[:, :D]
            & problem.poses.active[:, None]).reshape(-1)
    J = J * mask[None, :]
    return np.asarray(J.T @ J), np.asarray(J.T @ r)


def test_prior_matches_numpy_schur_oracle():
    problem, cfg, _ = _linear_chain()
    P = problem.poses.q.shape[0]
    D = cfg.pose_dim
    drop_ids = [0]
    drop = jnp.zeros(P, bool).at[0].set(True)

    prior = window_mod.marginalize(problem, cfg, False, drop)

    # oracle: restrict to residuals touching pose 0, Schur out its 6 dims
    sub, _ = window_mod._select_residuals(problem, drop)
    H, g = _pose_graph_oracle(sub, cfg)
    d = np.zeros(P * D, bool)
    d[:D] = True
    Hdd = H[np.ix_(d, d)] + 1e-9 * np.eye(D)
    Hrd = H[np.ix_(~d, d)]
    H_pr = H[np.ix_(~d, ~d)] - Hrd @ np.linalg.inv(Hdd) @ Hrd.T
    g_pr = g[~d] - Hrd @ np.linalg.inv(Hdd) @ g[d]

    got_H = np.asarray(prior.H)[np.ix_(~d, ~d)]
    got_g = np.asarray(prior.g)[~d]
    np.testing.assert_allclose(got_H, H_pr, atol=1e-6)
    np.testing.assert_allclose(got_g, g_pr, atol=1e-6)


def test_linear_marginalization_tracks_batch():
    problem, cfg, t_true = _linear_chain()
    batch, summ = step_mod.solve(problem, cfg, max_iter=10, use_imu=False)
    assert summ.final_cost < summ.initial_cost

    drop = jnp.zeros(problem.poses.q.shape[0], bool).at[0].set(True)
    marged = window_mod.apply_marginalization(problem, cfg, False, drop)
    assert bool(marged.marg.active)
    lagged, _ = step_mod.solve(marged, cfg, max_iter=10, use_imu=False)

    # the pose-graph is mildly nonlinear (rotation-translation coupling), so
    # one-time linearization tracks batch to first order, not exactly
    np.testing.assert_allclose(np.asarray(lagged.poses.t[1:6]),
                               np.asarray(batch.poses.t[1:6]), atol=5e-3)


def test_sequential_equals_joint_marginalization():
    problem, cfg, _ = _linear_chain(n=7, seed=3)
    P = problem.poses.q.shape[0]
    m1 = window_mod.apply_marginalization(
        problem, cfg, False, jnp.zeros(P, bool).at[0].set(True))
    m2 = window_mod.apply_marginalization(
        m1, cfg, False, jnp.zeros(P, bool).at[1].set(True))
    mj = window_mod.apply_marginalization(
        problem, cfg, False,
        jnp.zeros(P, bool).at[0].set(True).at[1].set(True))
    np.testing.assert_allclose(np.asarray(m2.marg.H),
                               np.asarray(mj.marg.H), atol=1e-10)
    np.testing.assert_allclose(np.asarray(m2.marg.g),
                               np.asarray(mj.marg.g), atol=1e-10)


def test_prior_is_psd_and_respects_drop_mask():
    problem, cfg, _ = _linear_chain()
    drop = jnp.zeros(problem.poses.q.shape[0], bool).at[0].set(True)
    prior = window_mod.marginalize(problem, cfg, False, drop)
    H = np.asarray(prior.H)
    D = cfg.pose_dim
    assert np.abs(H[:D, :]).max() == 0.0
    assert np.abs(H[:, :D]).max() == 0.0
    w = np.linalg.eigvalsh((H + H.T) / 2)
    assert w.min() > -1e-8


def test_vins_sliding_window():
    """Fixed-lag VINS: marginalize the oldest active pose as the window
    slides; trajectory must stay close to the batch solution."""
    sim = sv.simulate(n_poses=12, n_lms=80, seed=7)
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False,
                   error_change_threshold=1e-5,
                   param_change_threshold=1e-8)
    problem, pose_ids, _ = sv.build_problem(sim, cfg, perturb=0.02, seed=8)

    batch, _ = step_mod.solve(problem, cfg, max_iter=15, use_imu=True)
    ate_batch = sv.ate(None, np.asarray(batch.poses.t[:12]), None,
                       sim.t_wv[:12])

    P = problem.poses.q.shape[0]
    p = problem
    for k in range(2, 6):  # poses 2..5 leave the window one by one
        p, _ = step_mod.solve(p, cfg, max_iter=6, use_imu=True)
        p = window_mod.apply_marginalization(
            p, cfg, True, jnp.zeros(P, bool).at[k].set(True))
    p, _ = step_mod.solve(p, cfg, max_iter=10, use_imu=True)

    ate_window = sv.ate(None, np.asarray(p.poses.t[6:12]), None,
                        sim.t_wv[6:12])
    assert ate_window < max(5 * ate_batch, 5e-3), (ate_window, ate_batch)


def test_rotational_pose_graph():
    """<R,0,6,0> pose-graph config with nontrivial rotations: noisy odometry
    chain + loop closure converges and recovers orientations."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(11)
    n = 8
    cfg = BAConfig(pose_dim=6, lm_size=0, use_dogleg=True,
                   error_change_threshold=0.0, param_change_threshold=1e-10,
                   enable_auto_regularization=False)
    b = ProblemBuilder(cfg)

    # ground truth: random walk in SE3
    qs, ts = [np.array([1.0, 0, 0, 0])], [np.zeros(3)]
    for i in range(1, n):
        dq = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.3)))
        qs.append(np.asarray(lie.quat_mul(jnp.asarray(qs[-1]),
                                          jnp.asarray(dq))))
        ts.append(ts[-1] + rng.normal(size=3))

    ids = []
    for i in range(n):
        # perturbed initial guess (anchor exact)
        if i == 0:
            q0, t0 = qs[0], ts[0]
        else:
            pq = np.asarray(lie.quat_mul(jnp.asarray(qs[i]), lie.so3_exp(
                jnp.asarray(rng.normal(size=3) * 0.1))))
            q0, t0 = pq, ts[i] + rng.normal(size=3) * 0.3
        ids.append(b.add_pose(q0, t0, active=True, time=float(i)))
    b.add_unary_constraint(ids[0], qs[0], ts[0], cov=np.eye(6) * 1e-8)

    def rel(i, j):
        # T_i^-1 T_j in our decoupled convention used by the binary
        # residual: r = log_decoupled(T1 * meas, T2) -> meas = T1^-1 T2
        qi, ti = jnp.asarray(qs[i]), jnp.asarray(ts[i])
        qj, tj = jnp.asarray(qs[j]), jnp.asarray(ts[j])
        q, t = lie.se3_compose(lie.se3_inverse((qi, ti)), (qj, tj))
        return np.asarray(q), np.asarray(t)

    for i in range(n - 1):
        q, t = rel(i, i + 1)
        b.add_binary_constraint(ids[i], ids[i + 1], q, t, cov=np.eye(6) * 0.01)
    q, t = rel(0, n - 1)
    b.add_binary_constraint(ids[0], ids[n - 1], q, t, cov=np.eye(6) * 0.01)

    problem = b.build()
    solved, summary = step_mod.solve(problem, cfg, max_iter=25,
                                     use_imu=False)
    assert summary.final_cost < 1e-8, summary
    for i in range(n):
        dot = abs(float(np.asarray(solved.poses.q[i]) @ qs[i]))
        assert dot > 1.0 - 1e-6, (i, dot)
        np.testing.assert_allclose(np.asarray(solved.poses.t[i]), ts[i],
                                   atol=1e-4)
