"""ViCalibrator service tests: staged self-calibration on a synthetic
calibration-target capture (reference ViCalibrator analog)."""

import numpy as np

from ba_tpu.calib import STAGE_BIASES, STAGE_ROTATION, ViCalibrator
from ba_tpu.core import camera, lie
from ba_tpu.utils import checkpoint  # noqa: F401  (import sanity)

import jax.numpy as jnp

TRUE_CAM = np.array([250.0, 245.0, 320.0, 240.0])


def _make_capture(n_frames=8, seed=0):
    """Planar 5x4 target viewed from poses on an arc."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, 5),
                         np.linspace(-0.3, 0.3, 4))
    target = np.stack([xs.ravel(), ys.ravel(), np.zeros(20)], -1)

    frames = []
    for i in range(n_frames):
        ang = -0.4 + 0.8 * i / max(n_frames - 1, 1)
        # camera (= sensor frame, T_vs = I at truth) on an arc, z toward
        # the target plane
        pos = np.array([1.5 * np.sin(ang), 0.2 * np.sin(2 * ang),
                        -1.5 * np.cos(ang)])
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0.0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1)
        from scipy.spatial.transform import Rotation

        qs = Rotation.from_matrix(R).as_quat()
        q = np.array([qs[3], qs[0], qs[1], qs[2]])
        obs = []
        for pid, pw in enumerate(target):
            pc = R.T @ (pw - pos)
            if pc[2] < 0.1:
                continue
            pix = np.array([TRUE_CAM[0] * pc[0] / pc[2] + TRUE_CAM[2],
                            TRUE_CAM[1] * pc[1] / pc[2] + TRUE_CAM[3]])
            obs.append((pid, pix))
        frames.append((q, pos, obs, float(i) * 0.5))
    return target, frames


def test_calibrator_recovers_intrinsics():
    target, frames = _make_capture()
    cal = ViCalibrator(target)
    # start from wrong intrinsics and slightly wrong pose guesses
    cal.add_camera(TRUE_CAM + np.array([15.0, -12.0, 6.0, -5.0]),
                   camera.MODEL_LINEAR)
    rng = np.random.default_rng(1)
    for (q, t, obs, time) in frames:
        dq = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.02)))
        f = cal.add_frame(np.asarray(lie.quat_mul(jnp.asarray(q),
                                                  jnp.asarray(dq))),
                          t + rng.normal(size=3) * 0.02, time)
        for (pid, pix) in obs:
            cal.add_observation(f, pid, pix)

    assert cal.stage == STAGE_ROTATION
    mse1 = cal.solve_once(max_iter=25)
    mse2 = cal.solve_once(max_iter=25)
    assert np.isfinite(mse2)
    assert mse2 < 1e-4, (mse1, mse2)
    np.testing.assert_allclose(cal.cam_params[:4], TRUE_CAM, atol=0.5)
    assert cal.stage > STAGE_ROTATION  # staged unlock advanced


def test_calibrator_background_thread():
    target, frames = _make_capture(n_frames=5)
    cal = ViCalibrator(target)
    cal.add_camera(TRUE_CAM + 5.0, camera.MODEL_LINEAR)
    for (q, t, obs, time) in frames:
        f = cal.add_frame(q, t, time)
        for (pid, pix) in obs:
            cal.add_observation(f, pid, pix)
    cal.start()
    import time as _t

    for _ in range(200):
        if np.isfinite(cal.mse) and cal.mse < 1e-4:
            break
        _t.sleep(0.25)
    cal.stop()
    assert np.isfinite(cal.mse) and cal.mse < 1e-3, cal.mse


def test_checkpoint_roundtrip(tmp_path):
    from test_solver_reprojection import make_scene
    from ba_tpu.utils import checkpoint as ckpt
    import jax

    problem, cfg = make_scene(n_poses=4, n_lms=6)
    path = str(tmp_path / "state.npz")
    ckpt.save(path, problem, extra={"iteration": 3})
    restored = ckpt.load(path, problem)
    for a, b in zip(jax.tree_util.tree_leaves(problem),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.extra(path)["iteration"] == 3


def test_dump_system(tmp_path):
    from test_solver_reprojection import make_scene
    from ba_tpu.core.problem import prepare_landmarks
    from ba_tpu.solver import assemble as asm_mod
    from ba_tpu.solver.linear import dump_system

    problem, cfg = make_scene(n_poses=4, n_lms=6)
    p = prepare_landmarks(problem, cfg)
    asm = asm_mod.assemble(p, cfg)
    dump_system(asm, str(tmp_path))
    s = np.loadtxt(tmp_path / "s.txt")
    np.testing.assert_allclose(s, np.asarray(asm.S))
    assert (tmp_path / "rhs.txt").exists()


def test_stage0_rotation_only_recovers_tvs_rotation():
    """Rotation-rich, translation-poor capture: stage 0 (rotation-only
    switched IMU + frozen T_vs translation, reference
    CeresCostFunctions.h:274-345 / ViCalibrator.h:435-450) must pull a
    perturbed T_vs *rotation* back toward truth — information a
    vision-only stage 0 cannot use (without inertial residuals T_vs is
    pure gauge and is not even optimized)."""
    from scipy.spatial.transform import Rotation

    xs, ys = np.meshgrid(np.linspace(-0.4, 0.4, 5),
                         np.linspace(-0.3, 0.3, 4))
    target = np.stack([xs.ravel(), ys.ravel(), np.zeros(20)], -1)
    G = lie.GRAVITY

    # vehicle spins in place 2 m in front of the target, rotating about
    # two axes; true T_vs = I so camera frame == vehicle frame
    pos = np.array([0.0, 0.0, -2.0])
    n_frames, dt_f = 10, 0.4

    def q_of(t):
        return np.asarray(lie.quat_mul(
            lie.so3_exp(jnp.asarray([0.0, 0.25 * np.sin(0.8 * t), 0.0])),
            lie.so3_exp(jnp.asarray([0.2 * np.sin(1.1 * t), 0.0,
                                     0.15 * t]))))

    cal = ViCalibrator(target)
    cal.add_camera(TRUE_CAM.copy(), camera.MODEL_LINEAR)
    # perturbed initial extrinsic rotation (the quantity stage 0 must fix)
    dq_err = np.asarray(lie.so3_exp(jnp.asarray([0.06, -0.05, 0.04])))
    cal.tvs_q = dq_err.copy()

    imu_hz = 50.0
    for i in range(n_frames):
        t = i * dt_f
        q = q_of(t)
        R = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        obs = []
        for pid, pw in enumerate(target):
            pc = R.T @ (pw - pos)
            if pc[2] < 0.1:
                continue
            pix = np.array([TRUE_CAM[0] * pc[0] / pc[2] + TRUE_CAM[2],
                            TRUE_CAM[1] * pc[1] / pc[2] + TRUE_CAM[3]])
            obs.append((pid, pix))
        f = cal.add_frame(q, pos, t)
        for (pid, pix) in obs:
            cal.add_observation(f, pid, pix)
    # consistent gyro/accel samples: w from finite quaternion differences,
    # accel = -R^T g (stationary)
    ts = np.arange(0.0, (n_frames - 1) * dt_f + 1e-9, 1.0 / imu_hz)
    for k in range(len(ts)):
        t = ts[k]
        q0, q1 = q_of(t), q_of(t + 1e-4)
        w = np.asarray(lie.so3_log(lie.quat_mul(
            lie.quat_conj(jnp.asarray(q0)), jnp.asarray(q1)))) / 1e-4
        R = Rotation.from_quat([q0[1], q0[2], q0[3], q0[0]]).as_matrix()
        a = -R.T @ np.array([0.0, 0.0, -G])
        cal.add_imu_measurements(w, a, t)

    err0 = float(np.linalg.norm(np.asarray(lie.so3_log(lie.quat_mul(
        jnp.asarray(cal.tvs_q), lie.quat_conj(jnp.asarray(
            [1.0, 0, 0, 0])))))))
    assert cal.stage == STAGE_ROTATION
    mse = cal.solve_once(max_iter=30)
    err1 = float(np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(cal.tvs_q)))))
    # stage 0 used the gyro: extrinsic rotation error shrinks, the frozen
    # translation did not move, and the reprojection mse is small
    assert err1 < 0.65 * err0, (err0, err1, mse)
    assert mse < 0.05, mse
    np.testing.assert_allclose(cal.tvs_t, 0.0, atol=1e-12)
    # the staged ladder then unlocks translation (full IMU) and finishes
    # the extrinsic rotation off
    mse2 = cal.solve_once(max_iter=30)
    err2 = float(np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(cal.tvs_q)))))
    assert err2 < 0.3 * err0, (err0, err1, err2, mse2)
