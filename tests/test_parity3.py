"""Round-3 parity features: calibration observability through the solver,
staged Tvs translation activation, rotation-only switched inertial
residuals, auto band-width, and the banded-PCG hardening guards.

Reference behaviors: `calculate_calibration_marginals` /
`write_reduced_camera_matrix` (include/ba/BundleAdjuster.h:92-99,
src/BundleAdjuster.cpp:600-627, 771-785), `translation_enabled_`
(cpp:257-271), `SwitchedFullImuCostFunction`
(include/ba/CeresCostFunctions.h:274-345)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ba_tpu.core import lie
from ba_tpu.core.problem import BAConfig, prepare_landmarks
from ba_tpu.solver import assemble as asm_mod
from ba_tpu.solver import linear as linear_mod
from ba_tpu.solver import step as step_mod

from test_selfcal import _scene_with_calib_error


# ---------------------------------------------------------------------------
# calibration observability wired through solve (VERDICT r2 missing #1)
# ---------------------------------------------------------------------------


def test_calibration_marginals_in_summary(tmp_path):
    err = np.array([1.0, -1.0, 2.0, -1.0, 0.01])
    problem, cfg = _scene_with_calib_error(err)
    out_dir = str(tmp_path / "reduced")
    cfg = dataclasses.replace(cfg, calculate_calibration_marginals=True,
                              write_reduced_camera_matrix=out_dir)
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    # marginals appear in the Summary (reference SolutionSummary
    # calibration_marginals, h:63-67)
    cov_k = summary.calibration_marginals
    assert cov_k is not None and cov_k.shape == (5, 5)
    w = np.linalg.eigvalsh((cov_k + cov_k.T) / 2)
    assert w.min() > 0 and np.isfinite(w).all()

    # the dump directory holds the reduced system, matching dump_system's
    # own output on the same assembly (reference writes s.txt/rhs.txt...,
    # cpp:600-627)
    s = np.loadtxt(f"{out_dir}/s.txt")
    rhs = np.loadtxt(f"{out_dir}/rhs.txt")
    p = prepare_landmarks(solved, cfg)
    asm = asm_mod.assemble(p, dataclasses.replace(cfg, band_width=0))
    np.testing.assert_allclose(s, np.asarray(asm.S), rtol=0, atol=1e-9)
    np.testing.assert_allclose(rhs, np.asarray(asm.rhs_sc), atol=1e-9)
    # and the marginals equal the direct computation
    ref = np.asarray(linear_mod.calibration_marginals(asm, cfg.calib_dim))
    np.testing.assert_allclose(cov_k, ref, rtol=1e-6, atol=1e-12)


def test_marginals_off_by_default():
    err = np.array([1.0, -1.0, 2.0, -1.0, 0.01])
    problem, cfg = _scene_with_calib_error(err)
    _, summary = step_mod.solve(problem, cfg, max_iter=3, use_imu=False)
    assert summary.calibration_marginals is None


# ---------------------------------------------------------------------------
# staged Tvs translation activation (VERDICT r2 missing #2)
# ---------------------------------------------------------------------------


def _tvs_scene(n_poses=32, seed=5, tvs_rot_err=0.35, tvs_t_err=0.6):
    """VI scene whose initial T_vs is FAR from the optimum (large rotation
    + translation error): the case the reference's staging exists for."""
    from ba_tpu.io import simulate_vins as sv

    sim = sv.simulate(n_poses=n_poses, n_lms=96, seed=seed)
    cfg = BAConfig(pose_dim=9, lm_size=1, do_tvs=True, use_dogleg=True,
                   error_change_threshold=0.0,
                   param_change_threshold=1e-12)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.0, seed=seed + 1)
    dq = np.asarray(lie.so3_exp(jnp.asarray([tvs_rot_err, -tvs_rot_err / 2,
                                             tvs_rot_err / 3])))
    rig = dataclasses.replace(
        problem.rig,
        tvs_q=jnp.asarray(np.asarray(lie.quat_mul(
            problem.rig.tvs_q[0], jnp.asarray(dq)))[None, :]),
        tvs_t=problem.rig.tvs_t + jnp.asarray(
            [[tvs_t_err, -tvs_t_err / 2, tvs_t_err / 3]]))
    return dataclasses.replace(problem, rig=rig), cfg


def test_tvs_staging_freezes_translation():
    """With staging active but unstabilized, the Tvs translation must not
    move in an iteration (the gated columns/delta dims)."""
    problem, cfg = _tvs_scene(n_poses=8)
    cfg = dataclasses.replace(cfg, tvs_translation_staging=True,
                              tvs_translation_active=False,
                              use_dogleg=False)
    p = prepare_landmarks(problem, cfg)
    res = step_mod.gn_iteration(p, cfg, True, 1.0, False)
    np.testing.assert_array_equal(np.asarray(res.problem.rig.tvs_t),
                                  np.asarray(problem.rig.tvs_t))
    # rotation is free to move
    assert not np.allclose(np.asarray(res.problem.rig.tvs_q),
                           np.asarray(problem.rig.tvs_q))


def test_tvs_staging_enables_after_stabilization():
    """Far-from-optimum Tvs with >= 30 poses: the staged solve must flip
    translation on once the extrinsic log-diff stabilizes, and converge at
    least as well as the unstaged solve (the regression pair the VERDICT
    asked for — reference cpp:257-271)."""
    problem, cfg = _tvs_scene(n_poses=32)
    staged_cfg = dataclasses.replace(cfg, tvs_translation_staging=True)
    solved_s, sum_s = step_mod.solve(problem, staged_cfg, max_iter=40,
                                     use_imu=True)
    assert sum_s.tvs_translation_enabled, (
        "staging never unlocked translation")
    solved_u, sum_u = step_mod.solve(problem, cfg, max_iter=40,
                                     use_imu=True)
    # staging must converge; it exists because the unstaged solve couples
    # the translation while the rotation is still wrong
    assert sum_s.final_cost < sum_s.initial_cost * 1e-3, sum_s
    assert sum_s.final_cost <= sum_u.final_cost * 1.01 + 1e-12, (
        sum_s.final_cost, sum_u.final_cost)


# ---------------------------------------------------------------------------
# rotation-only switched inertial residuals (VERDICT r2 missing #4)
# ---------------------------------------------------------------------------


def test_imu_rotation_only_rows():
    """imu_rotation_only zeroes the whitened translation+velocity rows and
    keeps the rotation rows (reference CeresCostFunctions.h:335-338)."""
    from ba_tpu.core.residuals import imu as imu_mod
    from ba_tpu.io import simulate_vins as sv

    cfg = BAConfig(pose_dim=9, lm_size=1)
    sim = sv.simulate(n_poses=6, n_lms=24, seed=3)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.05, seed=4)
    rot = imu_mod.evaluate(
        problem, dataclasses.replace(cfg, imu_rotation_only=True),
        with_jacobians=True)
    r_rot = np.asarray(rot.r)
    np.testing.assert_array_equal(r_rot[:, :3], 0.0)
    np.testing.assert_array_equal(r_rot[:, 6:], 0.0)
    assert np.any(r_rot[:, 3:6] != 0.0)
    np.testing.assert_array_equal(np.asarray(rot.j1)[:, :3, :], 0.0)
    np.testing.assert_array_equal(np.asarray(rot.j1)[:, 6:, :], 0.0)
    assert np.any(np.asarray(rot.j1)[:, 3:6, :] != 0.0)
    # the switched mode keeps ONLY gyro information: the rotation rows are
    # whitened by the rotation MARGINAL, so they carry no velocity DOF —
    # the velocity Jacobian columns must be exactly zero (a triangular
    # 9x9 whitening factor would leak them back in and open near-null
    # directions; that bug diverged the stage-0 calibration)
    np.testing.assert_array_equal(np.asarray(rot.j1)[:, :, 6:9], 0.0)
    np.testing.assert_array_equal(np.asarray(rot.j2)[:, :, 6:9], 0.0)
    # err_sq is consistent with the masked rows
    np.testing.assert_allclose(np.asarray(rot.err_sq),
                               np.sum(r_rot**2, axis=-1), rtol=1e-12)


def test_calibrator_stage0_uses_rotation_only():
    """Stage-0 build config: inertial residuals active in rotation-only
    switched mode with the Tvs translation frozen (reference ViCalibrator
    staged ladder, ViCalibrator.h:435-450)."""
    from ba_tpu.calib import STAGE_ROTATION, STAGE_TRANSLATION, ViCalibrator

    target = np.array([[x, y, 0.0] for x in np.linspace(-0.5, 0.5, 4)
                       for y in np.linspace(-0.5, 0.5, 4)])
    c = ViCalibrator(target)
    c.add_camera([200.0, 200.0, 320.0, 240.0])
    frames = [(0.1 * i, np.array([1.0, 0, 0, 0]), np.array([0.0, 0, -2.0]))
              for i in range(4)]
    imu = [(0.025 * k, np.zeros(3), np.array([0, 0, 9.8007]))
           for k in range(16)]
    _, cfg0, use_imu0, _ = c._build(
        [(t, q, p, []) for (t, q, p) in frames], imu, STAGE_ROTATION)
    assert use_imu0 and cfg0.imu_rotation_only
    assert cfg0.do_tvs and not cfg0.tvs_translation_active
    _, cfg1, use_imu1, _ = c._build(
        [(t, q, p, []) for (t, q, p) in frames], imu, STAGE_TRANSLATION)
    assert use_imu1 and not cfg1.imu_rotation_only
    assert cfg1.do_tvs and cfg1.tvs_translation_active


# ---------------------------------------------------------------------------
# banded hardening (VERDICT r2 weak #5)
# ---------------------------------------------------------------------------


def test_auto_band_width_in_solve():
    """solve() populates band_width from the problem when unset — the fast
    path must not be opt-in knowledge (reference use_sparse_solver
    default-on ergonomics, h:92)."""
    import test_solver_reprojection as tsr
    from ba_tpu.solver.assemble import band_width_of

    problem, cfg = tsr.make_scene(n_poses=12, n_lms=40, perturb=0.02)
    assert cfg.band_width == 0
    expected = band_width_of(problem)
    cfg2 = step_mod._auto_band_width(problem, cfg)
    if 0 < expected < problem.poses.q.shape[0]:
        assert cfg2.band_width == expected
    # and the solve itself converges through the auto path
    solved, summary = step_mod.solve(problem, cfg, max_iter=10,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_auto_band_width_skips_calib():
    err = np.array([1.0, -1.0, 2.0, -1.0, 0.01])
    problem, cfg = _scene_with_calib_error(err)
    cfg2 = step_mod._auto_band_width(problem, cfg)
    assert cfg2.band_width == 0  # calib block present -> dense path


def test_pcg_iteration_clamp():
    """The n_pcg=3 TPU hard fault at P=512 stays pinned: 3 is clamped to 4
    on TPU backends, left alone elsewhere, 0 means auto(4)."""
    from ba_tpu.solver.banded import _effective_pcg_iters

    assert _effective_pcg_iters(0, "tpu") == 4
    assert _effective_pcg_iters(0, "cpu") == 4
    assert _effective_pcg_iters(3, "tpu") == 4      # the workaround
    assert _effective_pcg_iters(3, "cpu") == 3
    assert _effective_pcg_iters(12, "tpu") == 12


def test_gn_rejected_iteration_reports_committed_cost():
    """Round-2 shipped bug (VERDICT weak #1): a rejected GN iteration must
    report the committed (pre) cost and a zero step, like dogleg."""
    import test_solver_reprojection as tsr

    problem, cfg = tsr.make_scene(n_poses=6, n_lms=30, perturb=0.0)
    p = prepare_landmarks(problem, cfg)
    # at the optimum with a huge damping the trial can only increase cost
    res = step_mod.gn_iteration(p, cfg, False, -50.0, False)
    if not bool(res.accepted):
        np.testing.assert_allclose(float(res.post_cost),
                                   float(res.pre_cost), rtol=0)
        assert float(res.delta_norm) == 0.0
