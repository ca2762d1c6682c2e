"""Fused Pallas reprojection kernel vs the autodiff path (exact parity)."""

import dataclasses

import numpy as np

from ba_tpu.core.problem import prepare_landmarks
from ba_tpu.core.residuals import reprojection
from ba_tpu.ops.reprojection_pallas import evaluate_pallas
from ba_tpu.solver import step as step_mod

from test_solver_reprojection import make_scene


def test_kernel_matches_autodiff():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.03)
    problem = prepare_landmarks(problem, cfg)
    ref = reprojection.evaluate(problem, cfg, with_jacobians=True)
    got = evaluate_pallas(problem, cfg)
    np.testing.assert_allclose(got.r, ref.r, atol=1e-5)
    np.testing.assert_allclose(got.err_sq, ref.err_sq, atol=1e-4,
                               rtol=1e-5)
    np.testing.assert_allclose(got.j_meas, ref.j_meas, atol=1e-5)
    np.testing.assert_allclose(got.j_ref, ref.j_ref, atol=1e-5)
    np.testing.assert_allclose(got.j_lm, ref.j_lm, atol=1e-4,
                               rtol=1e-6)


def test_kernel_matches_autodiff_with_tvs():
    """Nontrivial camera-from-vehicle extrinsic exercises every term."""
    import jax.numpy as jnp
    from ba_tpu.core import lie

    problem, cfg = make_scene(n_poses=6, n_lms=30, perturb=0.02, seed=9)
    dq = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
    rig = dataclasses.replace(
        problem.rig, tvs_q=jnp.asarray(dq)[None, :],
        tvs_t=jnp.asarray(np.array([[0.1, -0.2, 0.05]])))
    problem = dataclasses.replace(problem, rig=rig)
    problem = prepare_landmarks(problem, cfg)
    ref = reprojection.evaluate(problem, cfg, with_jacobians=True)
    got = evaluate_pallas(problem, cfg)
    np.testing.assert_allclose(got.r, ref.r, atol=1e-5)
    np.testing.assert_allclose(got.j_meas, ref.j_meas, atol=1e-5)
    np.testing.assert_allclose(got.j_ref, ref.j_ref, atol=1e-5)
    np.testing.assert_allclose(got.j_lm, ref.j_lm, atol=1e-4,
                               rtol=1e-6)


def test_solver_with_pallas_kernel():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.03)
    cfg = dataclasses.replace(cfg, use_pallas_proj=True)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary
