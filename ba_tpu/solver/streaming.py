"""Online streaming fixed-lag smoother: the serving shape of the ring.

`solver.fixedlag.build_ring_schedule` needs the whole trajectory up front
(an offline batch build).  This module is the PRODUCTION VIO shape — the
reference's incremental pattern (`f_gps` in
/root/reference/applications/unary_binary_imu_test/main.cpp:141-219:
one keyframe + its measurements arrive at a time, an estimate goes out per
keyframe) — built on the same per-slide machinery:

  * `StreamingRing` accepts one keyframe + its measurements at a time
    through the `Add*` API (mirroring the reference's AddPose /
    AddProjectionResidual / AddImuResidual / AddUnaryConstraint,
    BundleAdjuster.h:292-546);
  * each arriving keyframe builds THAT slide's slot tables on the host in
    O(window) (the buffers only ever hold the live window's measurements),
  * and drives a RESIDENT compiled slide program — `fixedlag.
    ring_slide_step` jitted once at fixed capacity shapes, shared verbatim
    with the batch scan.  The per-slide tables are VALUE-IDENTICAL to the
    batch schedule's (tests/test_streaming.py asserts field-by-field
    equality) and the trajectories agree to f64 roundoff; exact bitwise
    equality across the two is impossible because the scan-embedded and
    standalone compilations of the same step reassociate at the ulp level
    (measured <= 6e-15 m over 17 slides on identical inputs).

Per retired keyframe the smoother emits the post-solve estimate of the
departing pose (the smoother's output trajectory), then folds the pose
into the compact (W*D)^2 FEJ marginalization prior.

Restrictions (same as the ring): no calibration block, no per-pose cam
params, inverse-depth or XYZ landmarks anchored at in-window poses, and
alive landmark ids distinct mod L_w within every window (asserted).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam_mod
from ..core import lie
from ..core.problem import (BAConfig, ProblemIndex, Rig,
                            build_structure_index, empty_marg_prior)
from .fixedlag import RingSchedule, _pad_rows, ring_slide_step


@dataclasses.dataclass(frozen=True)
class RingCapacities:
    """Static per-slide table shapes the resident program compiles at.

    Exceeding a capacity at runtime is an error (the program would need a
    recompile); size them at the expected per-window maxima.
    """

    L_w: int              # landmark slots
    n_proj: int           # projection rows per slide
    n_imu: int = 1        # IMU residual rows per slide
    n_unary: int = 1
    n_binary: int = 1
    imu_span: int = 1     # measurements per IMU span (M)
    # ProblemIndex table rows
    n_pair: int = 1
    n_wb: int = 1
    n_bpair: int = 1
    n_ipair: int = 1
    n_sp: int = 1

    @classmethod
    def from_schedule(cls, s: RingSchedule) -> "RingCapacities":
        """Capacities matching a batch schedule's padded shapes — gives
        the streaming smoother the exact table shapes of the batch scan
        (used by the bit-identity test)."""
        i = s.inputs
        return cls(L_w=s.L_w,
                   n_proj=int(i["proj_z"].shape[1]),
                   n_imu=int(i["imu_pose1"].shape[1]),
                   n_unary=int(i["unary_pose"].shape[1]),
                   n_binary=int(i["binary_pose1"].shape[1]),
                   imu_span=int(i["imu_w"].shape[2]),
                   n_pair=int(i["pidx"].pair_a.shape[1]),
                   n_wb=int(i["pidx"].wb_pose.shape[1]),
                   n_bpair=int(i["pidx"].bpair_a.shape[1]),
                   n_ipair=int(i["pidx"].ipair_a.shape[1]),
                   n_sp=int(i["pidx"].sp_i.shape[1]))


class StreamingRing:
    """Incremental fixed-lag smoother over a W-keyframe ring.

    Usage (one keyframe at a time, reference f_gps pattern):

        ring = StreamingRing(cfg, W=8, rig=rig, g_vec=g, caps=caps)
        for each keyframe:
            g = ring.add_pose(q, t, v, b, time)
            ring.add_imu(g - 1, g, w, a, times)        # span from previous
            ring.add_projection(z, g, lm_id)           # per observation
            out = ring.push()                          # None until warm
            if out is not None:
                ...out["q"], out["t"]...               # retired keyframe g0

    `push()` fires at most one slide: once W keyframes are buffered, every
    subsequent keyframe retires the oldest one and returns its post-solve
    estimate.
    """

    def __init__(self, config: BAConfig, W: int, rig: Rig, g_vec,
                 caps: RingCapacities, use_imu: bool = False,
                 iters_per_slide: int = 2, dtype=np.float64):
        assert config.calib_dim == 0, "streaming ring: no calibration block"
        assert not config.use_per_pose_cam_params
        self.config = config
        self.W = W
        self.caps = caps
        self.use_imu = use_imu
        self.iters = iters_per_slide
        self.rig = rig
        self.g_vec = jnp.asarray(g_vec)
        self.dtype = np.dtype(dtype)

        # host buffers (live window only — O(window) memory and per-slide
        # host work)
        self._poses: Dict[int, Dict[str, Any]] = {}
        self._lms: Dict[int, Dict[str, Any]] = {}
        self._proj: List[Dict[str, Any]] = []
        self._imu: List[Dict[str, Any]] = []
        self._unary: List[Dict[str, Any]] = []
        self._binary: List[Dict[str, Any]] = []
        self._n_poses = 0
        self._next_lm = 0
        self._next_slide = 0
        self._prev_lm = np.zeros(0, np.int64)
        self._carry = None

        # resident compiled slide program (compiles on the first push; all
        # subsequent slides reuse it — the tables are shape-static)
        self._step = jax.jit(
            ring_slide_step,
            static_argnames=("config", "use_imu", "iters_per_slide",
                             "W", "L_w"))

    # ---- Add* API (reference BundleAdjuster.h:292-546) ----

    def add_pose(self, q, t, v=None, b=None, time=0.0,
                 mask=None) -> int:
        """Buffer one keyframe (poses must arrive in id order).  Returns
        the global pose id."""
        g = self._n_poses
        self._n_poses += 1
        self._poses[g] = dict(
            q=np.asarray(q, self.dtype),
            t=np.asarray(t, self.dtype),
            v=np.zeros(3, self.dtype) if v is None
            else np.asarray(v, self.dtype),
            b=np.zeros(6, self.dtype) if b is None
            else np.asarray(b, self.dtype),
            time=float(time),
            mask=np.ones(15, bool) if mask is None
            else np.asarray(mask, bool))
        return g

    def add_landmark(self, x_w, ref_pose: int, ref_cam: int = 0,
                     z_ref=None) -> int:
        """Buffer one landmark anchored at (in-window) `ref_pose`.  The
        parameterized state is prepared from the anchor pose's CURRENT
        buffered guess (same math as `problem.prepare_landmarks`)."""
        lid = self._next_lm
        self._next_lm += 1
        x_w = np.asarray(x_w, self.dtype)
        if x_w.shape[0] == 3:
            x_w = np.concatenate([x_w, np.ones(1, self.dtype)])
        has_z = z_ref is not None
        z_ref_a = (np.asarray(z_ref, self.dtype) if has_z
                   else np.zeros(2, self.dtype))
        self._lms[lid] = dict(
            x=self._prepare_x(x_w, ref_pose, ref_cam, z_ref_a, has_z),
            x_w=x_w, ref_pose=ref_pose, ref_cam=ref_cam,
            z_ref=z_ref_a, has_z_ref=has_z)
        return lid

    def add_projection(self, z, pose: int, lm: int, cam: int = 0,
                       weight: float = 1.0, cond: bool = False) -> None:
        """In inverse-depth mode the observation from the landmark's
        reference pose+camera is not a residual (it would be identically
        zero, BundleAdjuster.h:488-501) — it is recorded as z_ref and the
        landmark ray is re-prepared from it (same as ProblemBuilder)."""
        z = np.asarray(z, self.dtype)
        d = self._lms.get(lm)
        if (self.config.lm_size == 1 and d is not None
                and pose == d["ref_pose"] and cam == d["ref_cam"]):
            d["z_ref"] = z
            d["has_z_ref"] = True
            d["x"] = self._prepare_x(d["x_w"], pose, cam, z, True)
            return
        self._proj.append(dict(z=z, pose=pose, lm=lm, cam=cam,
                               weight=weight, cond=cond))

    def add_imu(self, pose1: int, pose2: int, w, a, times,
                cond: bool = False) -> None:
        """IMU span between consecutive keyframes; padded to the
        `imu_span` capacity with invalid rows."""
        M = self.caps.imu_span
        w = np.asarray(w, self.dtype).reshape(-1, 3)
        n = w.shape[0]
        assert n <= M, f"IMU span {n} exceeds capacity {M}"
        self._imu.append(dict(
            pose1=pose1, pose2=pose2,
            w=_pad_rows(w, M),
            a=_pad_rows(np.asarray(a, self.dtype).reshape(-1, 3), M),
            time=_pad_rows(np.asarray(times, self.dtype).reshape(-1), M),
            meas_valid=_pad_rows(np.ones(n, bool), M, False),
            weight=1.0, cond=cond))

    def add_unary(self, pose: int, q, t, cov_inv) -> None:
        self._unary.append(dict(pose=pose, q=np.asarray(q, self.dtype),
                                t=np.asarray(t, self.dtype),
                                cov_inv=np.asarray(cov_inv, self.dtype)))

    def add_binary(self, pose1: int, pose2: int, q, t, cov_inv) -> None:
        self._binary.append(dict(pose1=pose1, pose2=pose2,
                                 q=np.asarray(q, self.dtype),
                                 t=np.asarray(t, self.dtype),
                                 cov_inv=np.asarray(cov_inv, self.dtype)))

    # ---- the slide ----

    def push(self) -> Optional[Dict[str, Any]]:
        """Fire the next slide if its window is complete.  Returns the
        retired keyframe's post-solve estimate
        (dict: pose id, q, t, v, b, cost) or None while warming up."""
        k = self._next_slide
        if self._n_poses < k + self.W:
            # slide k waits for pose k+W-1 (its full window)
            return None
        if self._carry is None:
            self._init_carry()
        inp = self._slide_tables(k)
        self._carry, out = self._step(
            self._carry, inp, self.rig, self.g_vec, config=self.config,
            use_imu=self.use_imu, iters_per_slide=self.iters, W=self.W,
            L_w=self.caps.L_w)
        self._next_slide = k + 1
        self._retire(k)
        res = {f: np.asarray(v) for f, v in out.items()}
        res["pose"] = k
        return res

    def current_window(self):
        """Post-solve states of the poses currently in the window (slot
        order; slot = global_id % W)."""
        if self._carry is None:
            return None
        q, t, v, b, lx, marg = self._carry
        return dict(q=np.asarray(q), t=np.asarray(t), v=np.asarray(v),
                    b=np.asarray(b))

    # ---- internals ----

    def _prepare_x(self, x_w, ref_pose, ref_cam, z_ref, has_z):
        """Single-landmark `prepare_landmarks` (problem.py:1127-1154):
        same jnp ops on 1-row arrays -> bitwise-equal prepared state."""
        cfg = self.config
        if cfg.lm_size != 1:
            return x_w.copy()
        p = self._poses[ref_pose]
        q_wv = jnp.asarray(p["q"])[None]
        t_wv = jnp.asarray(p["t"])[None]
        rc = np.asarray([ref_cam])
        T_ws = lie.se3_compose((q_wv, t_wv),
                               (self.rig.tvs_q[rc], self.rig.tvs_t[rc]))
        x_s = lie.se3_transform_homog(lie.se3_inverse(T_ws),
                                      jnp.asarray(x_w)[None])
        norm = jnp.maximum(jnp.linalg.norm(x_s[..., :3], axis=-1,
                                           keepdims=True), 1e-12)
        x_s = x_s / norm
        if has_z:
            ray = cam_mod.unproject(self.rig.params[rc],
                                    self.rig.model[rc],
                                    jnp.asarray(z_ref)[None])
            x_s = jnp.concatenate([ray, x_s[..., 3:4]], axis=-1)
        return np.asarray(x_s[0], self.dtype)

    def _alive_lms(self, k: int) -> np.ndarray:
        """Sorted global ids of landmarks anchored in window [k, k+W)."""
        return np.array(sorted(
            lid for lid, d in self._lms.items()
            if k <= d["ref_pose"] < k + self.W), np.int64)

    def _init_carry(self):
        """First-window carry, matching `build_ring_schedule`'s carry0."""
        W, L_w = self.W, self.caps.L_w
        D = self.config.pose_dim
        q = np.stack([self._poses[g]["q"] for g in range(W)])
        t = np.stack([self._poses[g]["t"] for g in range(W)])
        v = np.stack([self._poses[g]["v"] for g in range(W)])
        b = np.stack([self._poses[g]["b"] for g in range(W)])
        lm_ids0 = self._alive_lms(0)
        lx0 = np.zeros((L_w, 4), self.dtype)
        if len(lm_ids0):
            lx0[lm_ids0 % L_w] = np.stack(
                [self._lms[i]["x"] for i in lm_ids0])
        marg0 = empty_marg_prior(W, D, jnp.asarray(t).dtype)
        self._carry = (jnp.asarray(q), jnp.asarray(t), jnp.asarray(v),
                       jnp.asarray(b), jnp.asarray(lx0), marg0)
        self._prev_lm = lm_ids0

    def _slide_tables(self, k: int) -> Dict[str, Any]:
        """Slide k's slot tables — the streaming twin of the loop body in
        `fixedlag.build_ring_schedule` (kept value-identical; the
        bit-identity test pins the two)."""
        W, L_w, caps, dt = self.W, self.caps.L_w, self.caps, self.dtype
        lm_ids = self._alive_lms(k)
        assert len(lm_ids) <= L_w, \
            f"{len(lm_ids)} alive landmarks exceed L_w={L_w}"
        assert len(np.unique(lm_ids % L_w)) == len(lm_ids), \
            "alive landmark ids must map 1:1 under mod L_w"
        in_win = lambda p: (k <= p < k + W)             # noqa: E731
        alive = set(lm_ids.tolist())

        d: Dict[str, Any] = {}
        win = np.arange(k, k + W)
        slot = win % W
        inv = np.zeros(W, np.int64)
        inv[slot] = win
        d["pose_time"] = np.array([self._poses[g]["time"] for g in inv],
                                  dt)
        d["pose_mask"] = np.stack([self._poses[g]["mask"] for g in inv])
        d["pose_cam_params"] = np.zeros(
            (W, int(self.rig.params.shape[1])), dt)
        d["pose_active"] = np.ones(W, bool)
        new_mask = np.zeros(W, bool)
        if k > 0:
            new_mask[(k + W - 1) % W] = True
        d["new_pose_mask"] = new_mask
        d["new_q"] = np.stack([self._poses[g]["q"] for g in inv])
        d["new_t"] = np.stack([self._poses[g]["t"] for g in inv])
        d["new_v"] = np.stack([self._poses[g]["v"] for g in inv])
        d["new_b"] = np.stack([self._poses[g]["b"] for g in inv])

        # landmark slots
        lmg = np.zeros(L_w, np.int64)
        lm_alive = np.zeros(L_w, bool)
        if len(lm_ids):
            lmg[lm_ids % L_w] = lm_ids
            lm_alive[lm_ids % L_w] = True

        def lm_field(f, shape, fill=0):
            out = np.full((L_w,) + shape, fill,
                          dt if shape else np.int64)
            for i in lm_ids:
                out[i % L_w] = self._lms[i][f]
            return out

        d["lm_ref_pose"] = np.where(
            lm_alive, lm_field("ref_pose", ()) % W, 0).astype(np.int32)
        d["lm_ref_cam"] = np.where(
            lm_alive, lm_field("ref_cam", ()), 0).astype(np.int32)
        d["lm_active"] = lm_alive
        d["lm_z_ref"] = lm_field("z_ref", (2,))
        d["lm_has_z_ref"] = np.zeros(L_w, bool)
        for i in lm_ids:
            d["lm_has_z_ref"][i % L_w] = self._lms[i]["has_z_ref"]
        d["lm_x_w"] = lm_field("x_w", (4,))
        new_lms = (np.setdiff1d(lm_ids, self._prev_lm) if k
                   else np.zeros(0, np.int64))
        nl_mask = np.zeros(L_w, bool)
        nl_mask[new_lms % L_w] = True
        d["new_lm_mask"] = nl_mask
        new_lm_x = np.zeros((L_w, 4), dt)
        for i in new_lms:
            new_lm_x[i % L_w] = self._lms[i]["x"]
        d["new_lm_x"] = new_lm_x
        self._prev_lm = lm_ids

        # residual tables (insertion order = arrival order)
        pr = [r for r in self._proj
              if r["lm"] in alive and in_win(r["pose"])]
        assert len(pr) <= caps.n_proj, \
            f"{len(pr)} projection rows exceed capacity {caps.n_proj}"
        Np = caps.n_proj
        d["proj_z"] = _pad_rows(
            np.stack([r["z"] for r in pr]) if pr
            else np.zeros((0, 2), dt), Np)
        d["proj_pose"] = _pad_rows(
            np.array([r["pose"] % W for r in pr], np.int64), Np
        ).astype(np.int32)
        d["proj_lm"] = _pad_rows(
            np.array([r["lm"] % L_w for r in pr], np.int64), Np
        ).astype(np.int32)
        d["proj_cam"] = _pad_rows(
            np.array([r["cam"] for r in pr], np.int64), Np
        ).astype(np.int32)
        d["proj_weight"] = _pad_rows(
            np.array([r["weight"] for r in pr], dt), Np)
        d["proj_valid"] = _pad_rows(np.ones(len(pr), bool), Np, False)
        d["proj_cond"] = _pad_rows(
            np.array([r["cond"] for r in pr], bool), Np, False)

        im = [r for r in self._imu
              if in_win(r["pose1"]) and in_win(r["pose2"])]
        assert len(im) <= caps.n_imu
        Ni = caps.n_imu
        M = caps.imu_span
        d["imu_pose1"] = _pad_rows(
            np.array([r["pose1"] % W for r in im], np.int64), Ni
        ).astype(np.int32)
        d["imu_pose2"] = _pad_rows(
            np.array([r["pose2"] % W for r in im], np.int64), Ni
        ).astype(np.int32)
        d["imu_w"] = _pad_rows(
            np.stack([r["w"] for r in im]) if im
            else np.zeros((0, M, 3), dt), Ni)
        d["imu_a"] = _pad_rows(
            np.stack([r["a"] for r in im]) if im
            else np.zeros((0, M, 3), dt), Ni)
        d["imu_time"] = _pad_rows(
            np.stack([r["time"] for r in im]) if im
            else np.zeros((0, M), dt), Ni)
        d["imu_meas_valid"] = _pad_rows(
            np.stack([r["meas_valid"] for r in im]) if im
            else np.zeros((0, M), bool), Ni, False)
        d["imu_weight"] = _pad_rows(
            np.array([r["weight"] for r in im], dt), Ni, 1)
        d["imu_valid"] = _pad_rows(np.ones(len(im), bool), Ni, False)
        d["imu_cond"] = _pad_rows(
            np.array([r["cond"] for r in im], bool), Ni, False)

        un = [r for r in self._unary if in_win(r["pose"])]
        assert len(un) <= caps.n_unary
        Nu = caps.n_unary
        d["unary_pose"] = _pad_rows(
            np.array([r["pose"] % W for r in un], np.int64), Nu
        ).astype(np.int32)
        d["unary_q"] = _pad_rows(
            np.stack([r["q"] for r in un]) if un
            else np.zeros((0, 4), dt), Nu)
        d["unary_q"][len(un):, 0] = 1.0
        d["unary_t"] = _pad_rows(
            np.stack([r["t"] for r in un]) if un
            else np.zeros((0, 3), dt), Nu)
        d["unary_cov_inv"] = _pad_rows(
            np.stack([r["cov_inv"] for r in un]) if un
            else np.zeros((0, 6, 6), dt), Nu)
        d["unary_valid"] = _pad_rows(np.ones(len(un), bool), Nu, False)

        bi = [r for r in self._binary
              if in_win(r["pose1"]) and in_win(r["pose2"])]
        assert len(bi) <= caps.n_binary
        Nb = caps.n_binary
        d["binary_pose1"] = _pad_rows(
            np.array([r["pose1"] % W for r in bi], np.int64), Nb
        ).astype(np.int32)
        d["binary_pose2"] = _pad_rows(
            np.array([r["pose2"] % W for r in bi], np.int64), Nb
        ).astype(np.int32)
        d["binary_q"] = _pad_rows(
            np.stack([r["q"] for r in bi]) if bi
            else np.zeros((0, 4), dt), Nb)
        d["binary_q"][len(bi):, 0] = 1.0
        d["binary_t"] = _pad_rows(
            np.stack([r["t"] for r in bi]) if bi
            else np.zeros((0, 3), dt), Nb)
        d["binary_cov_inv"] = _pad_rows(
            np.stack([r["cov_inv"] for r in bi]) if bi
            else np.zeros((0, 6, 6), dt), Nb)
        d["binary_valid"] = _pad_rows(np.ones(len(bi), bool), Nb, False)

        # structure index over slot ids (same call as the batch build)
        per_row, pidx = build_structure_index(
            d["proj_pose"], d["lm_ref_pose"][d["proj_lm"]], d["proj_lm"],
            d["proj_valid"], d["binary_pose1"], d["binary_pose2"],
            d["binary_valid"], d["imu_pose1"], d["imu_pose2"],
            d["imu_valid"], W, L_w)
        d["proj_pair"] = per_row["pair"]
        d["proj_pair_swap"] = per_row["pair_swap"]
        d["proj_wb_meas"] = per_row["wb_meas"]
        d["proj_wb_ref"] = per_row["wb_ref"]
        d["binary_pair"] = per_row["bpair"]
        d["binary_pair_swap"] = per_row["bswap"]
        d["imu_pair"] = per_row["ipair"]
        d["imu_pair_swap"] = per_row["iswap"]
        px = jax.tree_util.tree_map(np.asarray, pidx)
        for name, cap in (("pair_a", caps.n_pair), ("wb_pose", caps.n_wb),
                          ("bpair_a", caps.n_bpair),
                          ("ipair_a", caps.n_ipair), ("sp_i", caps.n_sp)):
            assert getattr(px, name).shape[0] <= cap, \
                f"pidx.{name} {getattr(px, name).shape[0]} > cap {cap}"
        d["pidx"] = ProblemIndex(
            pair_a=_pad_rows(px.pair_a, caps.n_pair),
            pair_b=_pad_rows(px.pair_b, caps.n_pair),
            wb_pose=_pad_rows(px.wb_pose, caps.n_wb),
            wb_lm=_pad_rows(px.wb_lm, caps.n_wb),
            bpair_a=_pad_rows(px.bpair_a, caps.n_bpair),
            bpair_b=_pad_rows(px.bpair_b, caps.n_bpair),
            ipair_a=_pad_rows(px.ipair_a, caps.n_ipair),
            ipair_b=_pad_rows(px.ipair_b, caps.n_ipair),
            sp_i=_pad_rows(px.sp_i, caps.n_sp),
            sp_j=_pad_rows(px.sp_j, caps.n_sp),
            sp_valid=_pad_rows(px.sp_valid, caps.n_sp, False))
        d["drop_slot"] = np.int32(k % W)
        return jax.tree_util.tree_map(jnp.asarray, d)

    def _retire(self, k: int) -> None:
        """Prune buffers after slide k retired pose k (O(window))."""
        self._poses.pop(k, None)
        dead = [lid for lid, dd in self._lms.items()
                if dd["ref_pose"] <= k]
        for lid in dead:
            del self._lms[lid]
        self._proj = [r for r in self._proj
                      if r["pose"] > k and r["lm"] in self._lms]
        self._imu = [r for r in self._imu if r["pose1"] > k]
        self._unary = [r for r in self._unary if r["pose"] > k]
        self._binary = [r for r in self._binary if r["pose1"] > k]
