"""Matrix-free PCG reduced solve (`use_cg_solver`) vs the dense path.

The CG path must produce the same Gauss-Newton step as the dense Cholesky
path (both solve the same Schur system with the same relative Levenberg
damping) without ever materializing S / U / W — the TPU analog of the
reference's `use_sparse_solver` option (BundleAdjuster.h:92, cpp:752-826).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ba_tpu.core.problem import BAConfig, prepare_landmarks
from ba_tpu.solver import assemble as asm_mod
from ba_tpu.solver import cg as cg_mod
from ba_tpu.solver import step as step_mod
from ba_tpu.solver.linear import solve_reduced

from tests.test_solver_reprojection import make_scene


def _cfg_cg(cfg):
    return dataclasses.replace(cfg, use_cg_solver=True,
                               cg_max_iterations=400, cg_tolerance=1e-10)


def test_cg_step_matches_dense():
    problem, cfg = make_scene(n_poses=6, n_lms=30, perturb=0.03)
    problem = prepare_landmarks(problem, cfg)

    asm = asm_mod.assemble(problem, cfg)
    dense = solve_reduced(asm)

    D, K, P, L, lm, N = asm_mod.dims(problem, cfg)
    bs, marg_H = cg_mod.assemble_blocks(problem, cfg)
    got = cg_mod.solve_reduced_cg(bs, marg_H, _cfg_cg(cfg), P, D, K)

    # same system, same relative damping -> same step (f64, tight CG tol)
    np.testing.assert_allclose(np.asarray(got.delta_p),
                               np.asarray(dense.delta_p),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.delta_l),
                               np.asarray(dense.delta_l),
                               atol=1e-6, rtol=1e-4)
    # the block system's cost/rhs agree with the dense assembly
    np.testing.assert_allclose(float(bs.cost), float(asm.cost), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(bs.rhs_p), np.asarray(asm.rhs_p),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(bs.rhs_sc),
                               np.asarray(asm.rhs_sc), atol=1e-7)


def test_cg_matvec_matches_dense_schur():
    problem, cfg = make_scene(n_poses=5, n_lms=20, perturb=0.02, seed=7)
    problem = prepare_landmarks(problem, cfg)
    asm = asm_mod.assemble(problem, cfg)
    D, K, P, L, lm, N = asm_mod.dims(problem, cfg)
    bs, marg_H = cg_mod.assemble_blocks(problem, cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=N))
    got = cg_mod.s_matvec(bs, x, P, D, K, jnp.asarray(0.0), marg_H)
    # dense reference: masked-subspace S (without the 1e6 mask diagonal),
    # identity on masked dims
    S = np.asarray(asm.S) - np.diag(
        np.where(np.asarray(asm.col_mask), 0.0, 1e6))
    m = np.asarray(asm.col_mask)
    want = np.where(m, S @ (np.asarray(x) * m), np.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-8)


def test_cg_gn_converges():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.03)
    cfg = _cfg_cg(cfg)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_cg_dogleg_converges():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.05)
    cfg = dataclasses.replace(_cfg_cg(cfg), use_dogleg=True)
    solved, summary = step_mod.solve(problem, cfg, max_iter=20,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_cg_with_imu_matches_dense_iteration():
    from ba_tpu.io import simulate_vins as sv

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=12, n_lms=40, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1)
    problem = prepare_landmarks(problem, cfg)

    res_d = step_mod.gn_iteration(problem, cfg, True)
    res_c = step_mod.gn_iteration(problem, _cfg_cg(cfg), True)
    assert bool(res_d.accepted) and bool(res_c.accepted)
    np.testing.assert_allclose(float(res_c.pre_cost), float(res_d.pre_cost),
                               rtol=1e-8)
    np.testing.assert_allclose(float(res_c.post_cost),
                               float(res_d.post_cost), rtol=1e-3)
