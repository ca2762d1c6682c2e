"""Native (C++) runtime components: interpolation buffer + problem builder
equivalence with the pure-Python builder."""

import numpy as np
import pytest

from ba_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_interpolation_buffer_basic():
    ib = native.InterpolationBuffer(6)
    for i in range(10):
        ib.add(float(i), np.full(6, float(i)))
    assert len(ib) == 10
    assert ib.has(5.0) and not ib.has(11.0)
    np.testing.assert_allclose(ib.get(3.0), 3.0)
    np.testing.assert_allclose(ib.get(3.5), 3.5)  # linear interpolation
    np.testing.assert_allclose(ib.get(-1.0), 0.0)  # clamped
    np.testing.assert_allclose(ib.get(99.0), 9.0)


def test_interpolation_buffer_get_range():
    ib = native.InterpolationBuffer(2)
    for i in range(20):
        ib.add(0.1 * i, [i, -i])
    times, values = ib.get_range(0.25, 0.85)
    # boundary samples interpolated, interior samples exact
    np.testing.assert_allclose(times[0], 0.25)
    np.testing.assert_allclose(times[-1], 0.85)
    np.testing.assert_allclose(values[0, 0], 2.5)
    np.testing.assert_allclose(values[-1, 0], 8.5)
    assert np.all(np.diff(times) > 0)
    # interior values are the raw samples
    np.testing.assert_allclose(values[1:-1, 0], np.arange(3, 9))


def test_interpolation_buffer_out_of_order():
    ib = native.InterpolationBuffer(1)
    ib.add(0.0, [0.0])
    ib.add(2.0, [2.0])
    ib.add(1.0, [1.0])  # out-of-order insert
    np.testing.assert_allclose(ib.get(1.5), 1.5)


def test_native_builder_matches_python_builder():
    """The C++ builder must produce an identical Problem pytree to the
    Python one for the same Add* call sequence."""
    import jax
    from ba_tpu.core import camera
    from ba_tpu.core.problem import BAConfig, ProblemBuilder

    cfg = BAConfig(pose_dim=9, lm_size=1)
    rng = np.random.default_rng(0)

    def fill(b):
        cam = b.add_camera([100.0, 100, 320, 240, 0.9], camera.MODEL_FOV)
        ids = []
        for i in range(5):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            ids.append(b.add_pose(q, rng.normal(size=3),
                                  v=rng.normal(size=3), active=i > 0,
                                  time=float(i)))
        lm = []
        for j in range(7):
            lm.append(b.add_landmark(rng.normal(size=3), ref_pose=0,
                                     ref_cam=cam))
        for i in range(5):
            for j in range(7):
                b.add_projection_residual(rng.normal(size=2) * 100 + 300,
                                          ids[i], lm[j], cam)
        b.add_unary_constraint(ids[1], [1.0, 0, 0, 0], [0.0, 0, 0],
                               cov=np.eye(6) * 0.5)
        b.add_binary_constraint(ids[1], ids[2], [1.0, 0, 0, 0],
                                [1.0, 0, 0], cov=np.eye(6) * 2.0)
        n = 6
        b.add_imu_residual(ids[1], ids[2], rng.normal(size=(n, 3)),
                           rng.normal(size=(n, 3)), np.linspace(1.0, 2.0, n))
        return b.build(pad_multiple=4)

    rng = np.random.default_rng(0)
    p_py = fill(ProblemBuilder(cfg))
    rng = np.random.default_rng(0)
    p_cc = fill(native.NativeProblemBuilder(cfg))

    flat_py, tree_py = jax.tree_util.tree_flatten(p_py)
    flat_cc, tree_cc = jax.tree_util.tree_flatten(p_cc)
    assert tree_py == tree_cc
    for a, b_ in zip(flat_py, flat_cc):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                   np.asarray(b_, dtype=np.float64),
                                   atol=0, err_msg=str(a.shape))


def test_native_builder_solves():
    """End-to-end: a natively-built problem runs through the solver."""
    from test_solver_reprojection import make_scene  # python path
    import dataclasses
    from ba_tpu.core import camera, lie
    import jax.numpy as jnp
    from ba_tpu.core.problem import BAConfig
    from ba_tpu.solver import step as step_mod
    from ba_tpu.io import simulate_vins as sv

    sim = sv.simulate(n_poses=8, n_lms=40, seed=11)
    cfg = BAConfig(pose_dim=6, lm_size=1, use_dogleg=False)

    b = native.NativeProblemBuilder(cfg)
    cam = b.add_camera(sim.cam_params, camera.MODEL_FOV, tvs_q=sim.tvs_q,
                       tvs_t=sim.tvs_t)
    rng = np.random.default_rng(1)
    ids = []
    for i in range(8):
        t = sim.t_wv[i] + (rng.normal(size=3) * 0.02 if i >= 2 else 0)
        ids.append(b.add_pose(sim.q_wv[i], t, active=i >= 2,
                              time=float(sim.pose_times[i])))
    first_seen = {}
    for (i, j, z) in sim.obs:
        if i < 8 and (j not in first_seen or i < first_seen[j]):
            first_seen[j] = i
    lm_ids = {j: b.add_landmark(sim.lms_w[j], ref_pose=ids[r], ref_cam=cam)
              for j, r in first_seen.items()}
    for (i, j, z) in sim.obs:
        if i < 8:
            b.add_projection_residual(z, ids[i], lm_ids[j], cam)
    problem = b.build()
    solved, summary = step_mod.solve(problem, cfg, max_iter=15,
                                     use_imu=False)
    assert summary.final_cost < 1e-4, summary


def test_native_log_parser_matches_python(tmp_path):
    """Native C++ parse+dead-reckon == the pure-Python fallback on a
    synthetic reference-format log (ODO/UTM/IMU) and on the CSV
    alternate, including the dead-reckoned guesses and UTM re-basing."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "apps"))
    import unary_binary_imu_test as app

    for fmt in ("ref", "csv"):
        path = tmp_path / f"log_{fmt}.txt"
        app.generate_log(str(path), n_gps=12, fmt=fmt)
        imu_n, gps_n, gu_n = native.parse_log(str(path), app.MAX_POSES)
        imu_p, gps_p, gu_p = app.parse_log_py(str(path))
        np.testing.assert_allclose(imu_n, imu_p, rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(gps_n), np.asarray(gps_p),
                                   rtol=1e-15, atol=0)
        assert len(gu_n) == len(gu_p)
        for (qn, tn), (qp, tp) in zip(gu_n, gu_p):
            np.testing.assert_allclose(qn, qp, rtol=1e-12, atol=1e-15)
            np.testing.assert_allclose(tn, tp, rtol=1e-12, atol=1e-15)


def test_native_log_parser_missing_file():
    with pytest.raises(FileNotFoundError):
        native.parse_log("/nonexistent/log.txt")
