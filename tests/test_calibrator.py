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
