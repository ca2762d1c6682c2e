"""Reference-log parity of the GPS+IMU+odometry app (VERDICT r2 missing
#3): the app must consume the reference's whitespace ODO/UTM/IMU format
(/root/reference/applications/unary_binary_imu_test/main.cpp:246-280),
reconstruct wheel-odometry dead-reckoned guesses, and solve with the
reference covariance magnitudes."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from apps import unary_binary_imu_test as app  # noqa: E402
from ba_tpu.solver import step as step_mod  # noqa: E402


def _write_ref_log(tmp_path, n_gps=12):
    path = tmp_path / "log.txt"
    app.generate_log(str(path), n_gps=n_gps, noise_gps=0.2, fmt="ref")
    return path


def test_parse_reference_format(tmp_path):
    path = _write_ref_log(tmp_path)
    text = path.read_text()
    assert text.startswith(("ODO", "IMU", "UTM"))
    imu_arr, gps, guesses = app.parse_log(str(path))
    assert len(gps) == 12 and len(guesses) == 12
    assert imu_arr.shape[1] == 7
    # UTM re-based at the first fix (reference offset_e/n/u, main.cpp:144)
    assert abs(gps[0][1]) < 1e-9 and abs(gps[0][2]) < 1e-9
    # wheel-odometry dead reckoning produced non-trivial guesses: the gyro
    # update between fixes carries translation ~ speed * dt = 2 m
    dq, dt = guesses[2]
    assert 1.0 < np.linalg.norm(dt) < 3.0
    assert abs(dq[0]) < 1.0  # rotated (yaw_rate 0.15 over 1 s)


def test_parse_csv_alternate(tmp_path):
    path = tmp_path / "log.csv"
    app.generate_log(str(path), n_gps=8, fmt="csv")
    imu_arr, gps, guesses = app.parse_log(str(path))
    assert len(gps) == 8
    assert imu_arr.shape[0] > 100
    # CSV logs carry no ODO records: guesses have zero translation
    assert np.linalg.norm(guesses[2][1]) < 1e-12


def test_dead_reckoner_differential_drive():
    """The trackwidth-1.5 differential-drive model (main.cpp:87-139):
    equal wheel speeds go straight, unequal speeds turn."""
    dr = app.DeadReckoner()
    dr.odo(0.0, 1.0, 1.0)
    dr.odo(1.0, 1.0, 1.0)
    assert abs(dr.inc_x - 1.0) < 1e-12 and abs(dr.inc_yaw) < 1e-12
    dr2 = app.DeadReckoner()
    dr2.odo(0.0, 1.5, 0.5)
    dr2.odo(1.0, 1.5, 0.5)
    np.testing.assert_allclose(dr2.inc_yaw, (1.5 - 0.5) / app.TRACKWIDTH,
                               rtol=1e-12)
    assert dr2.speed == 1.0


def test_end_to_end_reference_log(tmp_path):
    """Full pipeline on a synthetic reference-format log: parse -> build ->
    solve(25, 0.2) must converge and pull the trajectory to the GPS track."""
    path = _write_ref_log(tmp_path, n_gps=10)
    imu_arr, gps, guesses = app.parse_log(str(path))
    problem, cfg = app.build_problem_from_records(imu_arr, gps, guesses)
    # reference covariance magnitudes made it into the problem: the unary
    # information is diag(1/1000, 1/1000, 1/30000, ~0...)
    cov_inv = np.asarray(problem.unary.cov_inv[0])
    np.testing.assert_allclose(cov_inv[0, 0], 1e-3, rtol=1e-9)
    np.testing.assert_allclose(cov_inv[2, 2], 1.0 / 30000.0, rtol=1e-9)
    assert cov_inv[3, 3] < 1e-15
    solved, summary = step_mod.solve(problem, cfg, max_iter=25,
                                     gn_damping=0.2, use_imu=True)
    assert summary.is_good, summary
    assert summary.final_cost < summary.initial_cost
    t_opt = np.asarray(solved.poses.t[: len(gps)])
    t_gps = np.array([[x, y, z] for (_, x, y, z) in gps])
    # GPS noise is 0.2 m; the smoothed track must stay within a few sigma
    err = np.linalg.norm(t_opt - t_gps, axis=1)
    assert err.mean() < 1.5, err


def test_streaming_gps_tracks_batch(tmp_path):
    """The online --stream mode (reference f_gps incremental pattern
    through StreamingRing, pose-graph lm_size=0) must track the
    25-iteration batch solve on the same log."""
    path = _write_ref_log(tmp_path, n_gps=16)
    imu_arr, gps_rows, guesses = app.parse_log(str(path))

    problem, cfg = app.build_problem_from_records(imu_arr, gps_rows,
                                                  guesses)
    import jax
    import jax.tree_util as jtu
    import jax.numpy as jnp

    problem = jtu.tree_map(
        lambda a: a.astype(np.float64)
        if a.dtype == np.float32 else a, problem)
    p, summ = step_mod.solve(problem, cfg, max_iter=25, gn_damping=0.2,
                             use_imu=True)
    assert summ.is_good
    n = len(gps_rows)
    t_batch = np.asarray(p.poses.t[:n])

    out = tmp_path / "stream.csv"
    outs = app.run_streaming(imu_arr, gps_rows, guesses, W=6,
                             out=str(out))
    traj = np.loadtxt(out, delimiter=",")[:, 1:4]
    rmse = np.sqrt(np.mean(np.sum((traj - t_batch) ** 2, axis=1)))
    assert rmse < 0.5, rmse            # fixed-lag vs full batch, meters
    assert len(outs) == n - 6 + 1
