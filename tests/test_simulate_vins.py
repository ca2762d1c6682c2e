"""End-to-end visual-inertial BA on the synthetic VINS generator
(BASELINE configs 3/4 at test scale)."""

import dataclasses

import numpy as np

from ba_tpu.core.problem import BAConfig
from ba_tpu.io import simulate_vins as sv
from ba_tpu.solver import step as step_mod


def test_generator_consistency():
    """Noiseless observations must reproject exactly from ground truth."""
    sim = sv.simulate(n_poses=10, n_lms=60, seed=1)
    assert len(sim.obs) > 100
    # spot-check projections via the jax camera model
    import jax.numpy as jnp
    from ba_tpu.core import camera, lie
    for (i, j, z) in sim.obs[:25]:
        T_wv = (jnp.asarray(sim.q_wv[i]), jnp.asarray(sim.t_wv[i]))
        T_vs = (jnp.asarray(sim.tvs_q), jnp.asarray(sim.tvs_t))
        T_ws = lie.se3_compose(T_wv, T_vs)
        p_s = lie.se3_transform_point(lie.se3_inverse(T_ws),
                                      jnp.asarray(sim.lms_w[j]))
        pix = camera.project(jnp.asarray(np.concatenate([sim.cam_params])),
                             camera.MODEL_FOV, p_s)
        np.testing.assert_allclose(np.asarray(pix), z, atol=1e-8)


def test_vins_vi_ba_converges():
    sim = sv.simulate(n_poses=16, n_lms=100, seed=2)
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False,
                   error_change_threshold=1e-6,
                   param_change_threshold=1e-8)
    problem, pose_ids, lm_ids = sv.build_problem(sim, cfg, perturb=0.02,
                                                 seed=3)
    ate_before = sv.ate(None, np.asarray(problem.poses.t[:16]), None,
                        sim.t_wv[:16])
    solved, summary = step_mod.solve(problem, cfg, max_iter=20, use_imu=True)
    ate_after = sv.ate(None, np.asarray(solved.poses.t[:16]), None,
                       sim.t_wv[:16])
    assert summary.final_cost < summary.initial_cost * 1e-6, summary
    assert ate_after < 0.01 * ate_before, (ate_before, ate_after)
    assert ate_after < 1e-3


def test_vins_visual_only_converges():
    sim = sv.simulate(n_poses=12, n_lms=80, seed=4)
    cfg = BAConfig(pose_dim=6, lm_size=1, use_dogleg=True)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=5)
    solved, summary = step_mod.solve(problem, cfg, max_iter=20,
                                     use_imu=False)
    assert summary.final_cost < 1e-3, summary


def test_matmul_precision_default_is_high():
    """The package must pin f32 matmul precision at import: TPU's 1-pass
    bf16 default makes assembled Hessians indefinite (BASELINE.md)."""
    import jax

    import ba_tpu  # noqa: F401 — import side effect under test

    assert str(jax.config.jax_default_matmul_precision) in (
        "high", "Precision.HIGH", "tensorfloat32")
