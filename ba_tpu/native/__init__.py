"""Native host-side runtime components (C++, ctypes-bound).

The TPU compute path is JAX/XLA; the *runtime around it* — measurement
buffering and problem-graph construction — is native C++, matching the
layer split of the reference (host C++ problem container,
BundleAdjuster.h; InterpolationBuffer.h).  The shared library is compiled
lazily with g++ -O3 and cached next to the sources; if no compiler is
available the pure-Python builders in ba_tpu.core.problem remain the
fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_ba_native.so"
_SOURCES = ["interpolation_buffer.cc", "problem_builder.cc",
            "log_parser.cc"]

_lib = None


def _build() -> Path:
    srcs = [_DIR / s for s in _SOURCES]
    if _SO.exists() and all(_SO.stat().st_mtime > s.stat().st_mtime
                            for s in srcs):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_SO)] + [str(s) for s in srcs]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load():
    """Load (building if needed) the native library; raises on failure."""
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(_build()))
        _declare(_lib)
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _declare(lib):
    d = ctypes.c_double
    dp = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    vp = ctypes.c_void_p
    i = ctypes.c_int

    lib.ib_create.restype = vp
    lib.ib_create.argtypes = [i]
    lib.ib_destroy.argtypes = [vp]
    lib.ib_size.restype = i
    lib.ib_size.argtypes = [vp]
    lib.ib_add.restype = i
    lib.ib_add.argtypes = [vp, d, dp]
    lib.ib_has.restype = i
    lib.ib_has.argtypes = [vp, d]
    lib.ib_get.argtypes = [vp, d, dp]
    lib.ib_range_size.restype = i
    lib.ib_range_size.argtypes = [vp, d, d]
    lib.ib_get_range.argtypes = [vp, d, d, dp, dp]

    lib.pb_create.restype = vp
    lib.pb_create.argtypes = [i] * 6
    lib.pb_destroy.argtypes = [vp]
    lib.pb_add_camera.restype = i
    lib.pb_add_camera.argtypes = [vp, dp, i, i, dp, dp]
    lib.pb_add_pose.restype = i
    lib.pb_add_pose.argtypes = [vp, dp, dp, dp, dp, dp, i, d]
    lib.pb_add_landmark.restype = i
    lib.pb_add_landmark.argtypes = [vp, dp, i, i, i]
    lib.pb_add_projection.restype = i
    lib.pb_add_projection.argtypes = [vp, dp, i, i, i, d]
    lib.pb_add_unary.argtypes = [vp, i, dp, dp, dp]
    lib.pb_add_binary.argtypes = [vp, i, i, dp, dp, dp]
    lib.pb_add_imu.argtypes = [vp, i, i, i, dp, dp, dp]
    lib.pb_counts.argtypes = [vp, i64p]
    lib.pb_build_mask.argtypes = [vp, u8p]
    lib.pb_pack_poses.argtypes = [vp, dp, dp, dp, dp, dp, i, dp,
                                  u8p]
    lib.pb_pack_landmarks.argtypes = [vp, dp, i32p, i32p, u8p, dp, u8p]
    lib.pb_pack_cameras.argtypes = [vp, dp, i32p, dp, dp, i]
    lib.pb_pack_proj.argtypes = [vp, dp, i32p, i32p, i32p, dp, u8p, u8p]
    lib.pb_pack_unary.argtypes = [vp, dp, dp, dp, i32p, u8p]
    lib.pb_pack_binary.argtypes = [vp, dp, dp, dp, i32p, i32p, u8p]
    lib.pb_pack_imu.argtypes = [vp, i, i32p, i32p, dp, dp, dp, u8p, u8p,
                                u8p]

    lib.lp_parse.restype = vp
    lib.lp_parse.argtypes = [ctypes.c_char_p, i]
    lib.lp_counts.argtypes = [vp, i64p]
    lib.lp_imu.argtypes = [vp, dp]
    lib.lp_gps.argtypes = [vp, dp]
    lib.lp_guesses.argtypes = [vp, dp, dp]
    lib.lp_destroy.argtypes = [vp]


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _arr(x, n=None):
    a = np.ascontiguousarray(np.asarray(x, np.float64)).reshape(-1)
    if n is not None and a.size < n:
        a = np.concatenate([a, np.zeros(n - a.size)])
    return a


class InterpolationBuffer:
    """Time-indexed measurement store with linear interpolation
    (reference InterpolationBufferT, include/ba/InterpolationBuffer.h)."""

    def __init__(self, dim: int):
        self._lib = load()
        self._h = self._lib.ib_create(dim)
        self.dim = dim

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ib_destroy(self._h)
            self._h = None

    def __len__(self):
        return self._lib.ib_size(self._h)

    def add(self, time: float, value) -> None:
        v = _arr(value, self.dim)
        self._lib.ib_add(self._h, float(time), _dptr(v))

    def has(self, time: float) -> bool:
        return bool(self._lib.ib_has(self._h, float(time)))

    def get(self, time: float) -> np.ndarray:
        out = np.zeros(self.dim)
        self._lib.ib_get(self._h, float(time), _dptr(out))
        return out

    def get_range(self, t_start: float, t_end: float):
        """(times (n,), values (n, dim)) with interpolated boundary
        samples — pairs IMU spans with keyframe intervals (reference
        GetRange, InterpolationBuffer.h:184)."""
        n = self._lib.ib_range_size(self._h, float(t_start), float(t_end))
        times = np.zeros(n)
        values = np.zeros((n, self.dim))
        self._lib.ib_get_range(self._h, float(t_start), float(t_end),
                               _dptr(times), _dptr(values))
        return times, values


def parse_log(path, max_poses: int = 0):
    """Native parse + dead-reckon of a GPS/IMU/odometry log
    (reference parse_file + update_incremental_pose + add_gyro_and_speed,
    applications/unary_binary_imu_test/main.cpp:40-280; both the
    whitespace ODO/UTM/IMU format and the CSV alternate).

    Returns (imu_rows (N, 7) float64, gps list of (t, x, y, z) tuples,
    guesses list of (q (4,), t (3,)) arrays) — the exact return contract
    of the pure-Python apps/unary_binary_imu_test.parse_log fallback.
    Raises FileNotFoundError on an unreadable path."""
    lib = load()
    h = lib.lp_parse(str(path).encode(), int(max_poses))
    if not h:
        raise FileNotFoundError(path)
    try:
        counts = np.zeros(2, np.int64)
        lib.lp_counts(h, counts.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)))
        n_imu, n_gps = map(int, counts)
        imu = np.zeros((n_imu, 7))
        gps = np.zeros((n_gps, 4))
        gq = np.zeros((n_gps, 4))
        gt = np.zeros((n_gps, 3))
        lib.lp_imu(h, _dptr(imu))
        lib.lp_gps(h, _dptr(gps))
        lib.lp_guesses(h, _dptr(gq), _dptr(gt))
    finally:
        lib.lp_destroy(h)
    return (imu, [tuple(r) for r in gps],
            [(gq[i], gt[i]) for i in range(n_gps)])


class NativeProblemBuilder:
    """C++-backed drop-in for ba_tpu.core.problem.ProblemBuilder."""

    def __init__(self, config):
        from ..core.problem import BAConfig  # noqa: F401

        self.config = config
        self._lib = load()
        self._h = self._lib.pb_create(
            config.pose_dim, config.lm_size, config.calib_size,
            int(config.do_tvs), int(config.regularize_biases_in_batch),
            int(config.enable_auto_regularization))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pb_destroy(self._h)
            self._h = None

    def add_camera(self, params, model=0, tvs_q=(1.0, 0, 0, 0),
                   tvs_t=(0.0, 0, 0)) -> int:
        from ..core import camera as cam_mod

        p = _arr(params, cam_mod.MAX_PARAMS)
        return self._lib.pb_add_camera(self._h, _dptr(p), len(p),
                                       int(model), _dptr(_arr(tvs_q)),
                                       _dptr(_arr(tvs_t)))

    def add_pose(self, q, t, v=(0.0, 0, 0), b=(0.0,) * 6, active=True,
                 time=0.0, cam_params=None) -> int:
        cp = _arr(cam_params if cam_params is not None else (), 8)
        return self._lib.pb_add_pose(self._h, _dptr(_arr(q)), _dptr(_arr(t)),
                                     _dptr(_arr(v)), _dptr(_arr(b)),
                                     _dptr(cp), int(active), float(time))

    def add_landmark(self, x_w, ref_pose, ref_cam=0, active=True) -> int:
        x = _arr(x_w)
        if x.size == 3:
            x = np.concatenate([x, [1.0]])
        return self._lib.pb_add_landmark(self._h, _dptr(x), int(ref_pose),
                                         int(ref_cam), int(active))

    def add_projection_residual(self, z, meas_pose, lm, cam=0, weight=1.0):
        self._lib.pb_add_projection(self._h, _dptr(_arr(z)), int(meas_pose),
                                    int(lm), int(cam), float(weight))

    def add_unary_constraint(self, pose, q, t, cov=None):
        ci = np.eye(6) if cov is None else np.linalg.inv(
            np.asarray(cov, np.float64))
        self._lib.pb_add_unary(self._h, int(pose), _dptr(_arr(q)),
                               _dptr(_arr(t)), _dptr(_arr(ci)))

    def add_binary_constraint(self, pose1, pose2, q, t, cov=None):
        ci = np.eye(6) if cov is None else np.linalg.inv(
            np.asarray(cov, np.float64))
        self._lib.pb_add_binary(self._h, int(pose1), int(pose2),
                                _dptr(_arr(q)), _dptr(_arr(t)),
                                _dptr(_arr(ci)))

    def add_imu_residual(self, pose1, pose2, w, a, time):
        w = np.ascontiguousarray(np.asarray(w, np.float64))
        a = np.ascontiguousarray(np.asarray(a, np.float64))
        t = np.ascontiguousarray(np.asarray(time, np.float64))
        self._lib.pb_add_imu(self._h, int(pose1), int(pose2), len(t),
                             _dptr(w), _dptr(a), _dptr(t))

    def build(self, pad_multiple: int = 1):
        import jax.numpy as jnp
        from ..core import camera as cam_mod
        from ..core.problem import (BinaryResiduals, ImuResiduals,
                                    LandmarkStates, PoseStates, Problem,
                                    ProjResiduals, Rig, UnaryResiduals,
                                    build_structure_index, empty_marg_prior)
        import dataclasses as dc

        def rnd(n):
            return max(pad_multiple,
                       -(-max(n, 1) // pad_multiple) * pad_multiple)

        c = np.zeros(8, np.int64)
        self._lib.pb_counts(self._h, c.ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)))
        n_p, n_l, n_c, n_r, n_u, n_b, n_i, M = map(int, c)
        P, L, C = rnd(n_p), rnd(n_l), max(n_c, 1)
        Nr, Nu, Nb, Ni = rnd(n_r), rnd(n_u), rnd(n_b), rnd(n_i)

        def z(shape, dt=np.float64):
            return np.zeros(shape, dt)

        def u8p(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

        def i32(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        q, t, v, b = z((P, 4)), z((P, 3)), z((P, 3)), z((P, 6))
        q[:, 0] = 1.0
        pcp = z((P, cam_mod.MAX_PARAMS))
        time_, act = z(P), z(P, np.uint8)
        mask = z((P, 15), np.uint8)
        self._lib.pb_pack_poses(self._h, _dptr(q), _dptr(t), _dptr(v),
                                _dptr(b), _dptr(pcp), cam_mod.MAX_PARAMS,
                                _dptr(time_), u8p(act))
        self._lib.pb_build_mask(self._h, u8p(mask))
        poses = PoseStates(q=jnp.asarray(q), t=jnp.asarray(t),
                           v=jnp.asarray(v), b=jnp.asarray(b),
                           time=jnp.asarray(time_),
                           active=jnp.asarray(act.astype(bool)),
                           mask=jnp.asarray(mask.astype(bool)),
                           cam_params=jnp.asarray(pcp))

        x_w, zr = z((L, 4)), z((L, 2))
        rp, rc = z(L, np.int32), z(L, np.int32)
        lact, hzr = z(L, np.uint8), z(L, np.uint8)
        self._lib.pb_pack_landmarks(self._h, _dptr(x_w), i32(rp), i32(rc),
                                    u8p(lact), _dptr(zr), u8p(hzr))
        rel = np.zeros(L, bool)
        rel[:n_l] = True
        lms = LandmarkStates(x=jnp.zeros((L, 4)), x_w=jnp.asarray(x_w),
                             ref_pose=jnp.asarray(rp),
                             ref_cam=jnp.asarray(rc),
                             active=jnp.asarray(lact.astype(bool)),
                             reliable=jnp.asarray(rel),
                             z_ref=jnp.asarray(zr),
                             has_z_ref=jnp.asarray(hzr.astype(bool)))

        cp = z((C, cam_mod.MAX_PARAMS))
        cm = z(C, np.int32)
        tq, tt = z((C, 4)), z((C, 3))
        tq[:, 0] = 1.0
        if n_c:
            self._lib.pb_pack_cameras(self._h, _dptr(cp), i32(cm), _dptr(tq),
                                      _dptr(tt), cam_mod.MAX_PARAMS)
        rig = Rig(params=jnp.asarray(cp), model=jnp.asarray(cm),
                  tvs_q=jnp.asarray(tq), tvs_t=jnp.asarray(tt))

        pz = z((Nr, 2))
        pp, pl, pc = z(Nr, np.int32), z(Nr, np.int32), z(Nr, np.int32)
        pw = z(Nr)
        pv, pcond = z(Nr, np.uint8), z(Nr, np.uint8)
        self._lib.pb_pack_proj(self._h, _dptr(pz), i32(pp), i32(pl), i32(pc),
                               _dptr(pw), u8p(pv), u8p(pcond))

        uq, ut, uc = z((Nu, 4)), z((Nu, 3)), z((Nu, 6, 6))
        up, uv = z(Nu, np.int32), z(Nu, np.uint8)
        uq[:, 0] = 1.0
        self._lib.pb_pack_unary(self._h, _dptr(uq), _dptr(ut), _dptr(uc),
                                i32(up), u8p(uv))
        unary = UnaryResiduals(pose=jnp.asarray(up), q=jnp.asarray(uq),
                               t=jnp.asarray(ut), cov_inv=jnp.asarray(uc),
                               valid=jnp.asarray(uv.astype(bool)))

        bq, bt, bc = z((Nb, 4)), z((Nb, 3)), z((Nb, 6, 6))
        b1, b2, bv = z(Nb, np.int32), z(Nb, np.int32), z(Nb, np.uint8)
        bq[:, 0] = 1.0
        self._lib.pb_pack_binary(self._h, _dptr(bq), _dptr(bt), _dptr(bc),
                                 i32(b1), i32(b2), u8p(bv))

        i1, i2 = z(Ni, np.int32), z(Ni, np.int32)
        iw, ia = z((Ni, M, 3)), z((Ni, M, 3))
        it = z((Ni, M))
        imv, iv, ic = z((Ni, M), np.uint8), z(Ni, np.uint8), z(Ni, np.uint8)
        self._lib.pb_pack_imu(self._h, M, i32(i1), i32(i2), _dptr(iw),
                              _dptr(ia), _dptr(it), u8p(imv), u8p(iv),
                              u8p(ic))

        # host-side sparsity tables for block-structured assembly (shared
        # with the Python builder — see core.problem.build_structure_index)
        per_row, pidx = build_structure_index(
            pp, rp[pl], pl, pv.astype(bool),
            b1, b2, bv.astype(bool), i1, i2, iv.astype(bool),
            P, L, pad_multiple)
        proj = ProjResiduals(z=jnp.asarray(pz), pose=jnp.asarray(pp),
                             lm=jnp.asarray(pl), cam=jnp.asarray(pc),
                             weight=jnp.asarray(pw),
                             valid=jnp.asarray(pv.astype(bool)),
                             cond=jnp.asarray(pcond.astype(bool)),
                             pair=jnp.asarray(per_row["pair"]),
                             pair_swap=jnp.asarray(per_row["pair_swap"]),
                             wb_meas=jnp.asarray(per_row["wb_meas"]),
                             wb_ref=jnp.asarray(per_row["wb_ref"]))
        binary = BinaryResiduals(pose1=jnp.asarray(b1), pose2=jnp.asarray(b2),
                                 q=jnp.asarray(bq), t=jnp.asarray(bt),
                                 cov_inv=jnp.asarray(bc),
                                 valid=jnp.asarray(bv.astype(bool)),
                                 pair=jnp.asarray(per_row["bpair"]),
                                 pair_swap=jnp.asarray(per_row["bswap"]))
        imu = ImuResiduals(pose1=jnp.asarray(i1), pose2=jnp.asarray(i2),
                           w=jnp.asarray(iw), a=jnp.asarray(ia),
                           time=jnp.asarray(it),
                           meas_valid=jnp.asarray(imv.astype(bool)),
                           weight=jnp.ones(Ni),
                           valid=jnp.asarray(iv.astype(bool)),
                           cond=jnp.asarray(ic.astype(bool)),
                           pair=jnp.asarray(per_row["ipair"]),
                           pair_swap=jnp.asarray(per_row["iswap"]),
                           c9=jnp.zeros((Ni, 9, 9)),
                           c9_set=jnp.zeros((), bool))

        g = np.array([0.0, 0.0, -self.config.gravity])
        marg = empty_marg_prior(P, self.config.pose_dim, jnp.asarray(t).dtype)
        marg = dc.replace(marg, lin_q=poses.q, lin_t=poses.t, lin_v=poses.v,
                          lin_b=poses.b)
        return Problem(poses=poses, lms=lms, rig=rig, proj=proj, unary=unary,
                       binary=binary, imu=imu, g_vec=jnp.asarray(g),
                       marg=marg, pidx=pidx)
