"""Ring-buffer fixed-lag smoother == masked-full-problem oracle.

The ring pipeline (ba_tpu.solver.fixedlag) runs each slide on a compact
W-pose / L_w-landmark problem built from per-slide tables; the oracle
below runs the SAME slide semantics on the full-size problem (window
membership expressed through active/valid masks, marginalization through
the full-size prior).  Same residuals, same math, different layout —
per-slide costs and the final window states must agree.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ba_tpu.core.problem import BAConfig, prepare_landmarks
from ba_tpu.io import simulate_vins as sv
from ba_tpu.solver import fixedlag, window as window_mod
from ba_tpu.solver.step import solve_fixed


def _problem(n_poses=24, n_lms=96, seed=0):
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=seed)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=seed + 1,
                                     with_marg_prior=False)
    return prepare_landmarks(problem, cfg), cfg


def _oracle(problem, cfg, W, n_slides, iters):
    """Full-size-array fixed-lag: window membership by masks."""
    P = int(problem.poses.q.shape[0])
    base = problem
    costs = []
    cur = problem
    for k in range(n_slides):
        ids = np.arange(P)
        in_win = (ids >= k) & (ids < k + W)
        lm_alive = np.asarray(base.lms.active) & in_win[
            np.asarray(base.lms.ref_pose)]
        pv = (np.asarray(base.proj.valid)
              & lm_alive[np.asarray(base.proj.lm)]
              & in_win[np.asarray(base.proj.pose)])
        iv = (np.asarray(base.imu.valid)
              & in_win[np.asarray(base.imu.pose1)]
              & in_win[np.asarray(base.imu.pose2)])
        uv = np.asarray(base.unary.valid) & in_win[
            np.asarray(base.unary.pose)]
        bv = (np.asarray(base.binary.valid)
              & in_win[np.asarray(base.binary.pose1)]
              & in_win[np.asarray(base.binary.pose2)])
        p_k = dataclasses.replace(
            cur,
            poses=dataclasses.replace(cur.poses,
                                      active=jnp.asarray(in_win)),
            lms=dataclasses.replace(cur.lms, active=jnp.asarray(lm_alive)),
            proj=dataclasses.replace(cur.proj, valid=jnp.asarray(pv)),
            imu=dataclasses.replace(cur.imu, valid=jnp.asarray(iv)),
            unary=dataclasses.replace(cur.unary, valid=jnp.asarray(uv)),
            binary=dataclasses.replace(cur.binary, valid=jnp.asarray(bv)))
        p_k, cs, _ = solve_fixed(p_k, cfg, True, iters)
        costs.append(float(cs[-1]))
        drop = jnp.asarray(ids == k)
        p_k = window_mod.apply_marginalization(p_k, cfg, True, drop)
        cur = p_k
    return cur, np.array(costs)


def test_ring_matches_masked_full_oracle():
    problem, cfg = _problem()
    W, iters = 8, 2
    n_slides = int(problem.poses.q.shape[0]) - W

    sched = fixedlag.build_ring_schedule(problem, cfg, W, n_slides)
    (q, t, v, b, lx, marg), outs = fixedlag.run_ring(sched, cfg, True,
                                                     iters)
    oracle, oracle_costs = _oracle(problem, cfg, W, n_slides, iters)

    np.testing.assert_allclose(np.asarray(outs["cost"]), oracle_costs,
                               rtol=1e-6, atol=1e-10)

    # the emitted retired-keyframe trajectory: pose k's estimate at the
    # moment it was marginalized.  The oracle's final states for retired
    # poses are exactly that (inactive poses never move afterwards).
    np.testing.assert_allclose(np.asarray(outs["t"]),
                               np.asarray(oracle.poses.t[:n_slides]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(outs["q"]),
                               np.asarray(oracle.poses.q[:n_slides]),
                               rtol=1e-6, atol=1e-8)

    # final surviving window states: after slide n_slides-1 (window
    # [n_slides-1, n_slides+W-1)) retires pose n_slides-1, the live poses
    # are [n_slides, n_slides+W-1); pose n_slides+W-1 never entered
    for g in range(n_slides, n_slides + W - 1):
        s = g % W
        np.testing.assert_allclose(np.asarray(q[s]),
                                   np.asarray(oracle.poses.q[g]),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(t[s]),
                                   np.asarray(oracle.poses.t[g]),
                                   rtol=1e-6, atol=1e-8)

    # surviving landmark states (alive in the final window)
    ref = np.asarray(problem.lms.ref_pose)
    alive = np.asarray(problem.lms.active) & (ref >= n_slides) \
        & (ref < n_slides + W - 1)
    L_w = sched.L_w
    for lid in np.where(alive)[0]:
        np.testing.assert_allclose(np.asarray(lx[lid % L_w]),
                                   np.asarray(oracle.lms.x[lid]),
                                   rtol=1e-6, atol=1e-8)


def test_ring_cost_decreases_and_converges():
    """Sanity on a longer run: last-window costs stay at the noise floor."""
    problem, cfg = _problem(n_poses=32, n_lms=128, seed=3)
    W = 8
    sched = fixedlag.build_ring_schedule(problem, cfg, W)
    _, outs = fixedlag.run_ring(sched, cfg, True, 2)
    costs = np.asarray(outs["cost"])
    assert costs.shape[0] == 32 - 8
    assert float(costs[-1]) < 1e-4, costs
