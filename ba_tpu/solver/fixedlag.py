"""Ring-buffer fixed-lag smoother: O(window) slides, independent of
trajectory length.

The naive fixed-lag pipeline (bench_window's full-problem scan) keeps the
WHOLE trajectory's arrays in the program and masks retired/future poses —
every slide pays O(P_total) residual evaluation and an O((P_total*D)^2)
dense prior, so slides get slower as the trajectory grows (measured: the
64-pose pipeline's slide step is ~11 ms while the active window is 16
poses).  This module is the TPU-idiomatic fix: the window lives in a RING
of W pose slots (slot = global_id % W) and L_w landmark slots
(slot = lm_id % L_w — alive landmark ids are a contiguous range, so the
mod map is collision-free), and each slide is a `lax.scan` step over
host-prestacked per-slide tables:

  1. overwrite the retired slots with the incoming pose / landmarks
     (initial guesses from the dataset),
  2. build the compact W-pose Problem from the carried slot states + this
     slide's residual/structure tables,
  3. `solve_fixed` (GN iterations) on the compact problem,
  4. `window.apply_marginalization` of the retiring pose into the compact
     (W*D)^2 FEJ prior (its slot rows are zeroed — ready for reuse).

Everything is static-shape; the per-slide tables are padded to the
per-trajectory maxima and stacked as scan inputs.  The reference has no
analog (its library only offers conditioning edges, SURVEY.md §5.7);
the masked-full pipeline in tests/test_fixedlag.py is the semantic oracle.

Restrictions (asserted): no calibration block, no per-pose cam params,
fresh problem (no pre-existing marginalization prior).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.problem import (BAConfig, BinaryResiduals, ImuResiduals,
                            LandmarkStates, MargPrior, PoseStates, Problem,
                            ProblemIndex, ProjResiduals, UnaryResiduals,
                            build_structure_index, empty_marg_prior,
                            prepare_landmarks)


@dataclasses.dataclass
class RingSchedule:
    """Host-built per-slide tables (stacked along a leading n_slides axis)
    + the initial ring state.  Not a pytree — pass to `run_ring`."""

    W: int                       # pose slots (window length)
    L_w: int                     # landmark slots
    n_slides: int
    inputs: Dict[str, Any]       # stacked scan inputs (jnp arrays)
    carry0: Tuple                # (q, t, v, b, lm_x, marg)
    rig: Any
    g_vec: Any


def _pad_rows(a, n, fill=0):
    a = np.asarray(a)
    if a.shape[0] >= n:
        return a[:n]
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def build_ring_schedule(problem: Problem, config: BAConfig, W: int,
                        n_slides: int | None = None) -> RingSchedule:
    """Slice a full (already `prepare_landmarks`-ed) trajectory problem
    into per-slide compact window tables.

    Slide k solves the window of global poses [k, k+W) and retires pose k;
    pose k+W and the landmarks anchored in the window enter at slide k+1.

    Host cost is O(n_slides * window-table size) (one
    `build_structure_index` per slide) — a one-time offline build.  In an
    online smoother the same tables are built incrementally per arriving
    keyframe, which is the per-slide slice of this loop.
    """
    assert config.calib_dim == 0, "ring window: no calibration block"
    assert not config.use_per_pose_cam_params
    assert problem.marg.H.shape[0] != problem.poses.q.shape[0] * \
        config.pose_dim or not bool(problem.marg.active), \
        "ring window needs a fresh problem (no marg prior)"

    po = problem.poses
    P_full = int(po.q.shape[0])
    if n_slides is None:
        n_slides = P_full - W
    assert 0 < n_slides <= P_full - W + 1

    ref_pose = np.asarray(problem.lms.ref_pose)
    lm_active = np.asarray(problem.lms.active)
    pr_pose = np.asarray(problem.proj.pose)
    pr_lm = np.asarray(problem.proj.lm)
    pr_valid = np.asarray(problem.proj.valid)
    i1 = np.asarray(problem.imu.pose1)
    i2 = np.asarray(problem.imu.pose2)
    iv = np.asarray(problem.imu.valid)
    u_pose = np.asarray(problem.unary.pose)
    uv = np.asarray(problem.unary.valid)
    b1 = np.asarray(problem.binary.pose1)
    b2 = np.asarray(problem.binary.pose2)
    bv = np.asarray(problem.binary.valid)

    # pass 1: per-slide row sets and landmark sets
    slides = []
    for k in range(n_slides):
        in_win = lambda p: (p >= k) & (p < k + W)      # noqa: E731
        alive = lm_active & in_win(ref_pose)
        lm_ids = np.where(alive)[0]
        rows_p = np.where(pr_valid & alive[pr_lm] & in_win(pr_pose))[0]
        rows_i = np.where(iv & in_win(i1) & in_win(i2))[0]
        rows_u = np.where(uv & in_win(u_pose))[0]
        rows_b = np.where(bv & in_win(b1) & in_win(b2))[0]
        slides.append((lm_ids, rows_p, rows_i, rows_u, rows_b))

    # L_w must make slot = id % L_w collision-free within every slide.
    # Any L_w >= each slide's id span works (ids in [lo, lo+span) are
    # distinct mod L_w when L_w >= span), so take the max over slides of
    # max(count, span) in ONE pass — a later slide's enlargement is then
    # automatically valid for earlier slides too.
    L_w = max(
        max(len(lm_ids),
            int(lm_ids.max() - lm_ids.min() + 1) if len(lm_ids) else 0)
        for lm_ids, *_ in slides)
    L_w = max(L_w, 1)
    for lm_ids, *_ in slides:
        assert len(np.unique(lm_ids % L_w)) == len(lm_ids), \
            "landmark ids alive in one window must map 1:1 under mod L_w"
    Np = max(max(len(s[1]) for s in slides), 1)
    Ni = max(max(len(s[2]) for s in slides), 1)
    Nu = max(max(len(s[3]) for s in slides), 1)
    Nb = max(max(len(s[4]) for s in slides), 1)

    f64 = np.asarray(po.t).dtype
    lm_x0 = np.asarray(problem.lms.x)        # prepared initial states

    per_slide = []
    prev_lm = np.zeros(0, np.int64)
    for k in range(n_slides):
        lm_ids, rows_p, rows_i, rows_u, rows_b = slides[k]
        lm_slot_of = np.zeros(int(np.asarray(problem.lms.x).shape[0]),
                              np.int64)
        lm_slot_of[lm_ids] = lm_ids % L_w

        d: Dict[str, Any] = {}
        # ---- pose-slot aux (gather window rows into slots) ----
        win = np.arange(k, k + W)
        slot = win % W
        inv = np.zeros(W, np.int64)
        inv[slot] = win                       # global id in each slot
        d["pose_time"] = np.asarray(po.time)[inv]
        d["pose_mask"] = np.asarray(po.mask)[inv]
        d["pose_cam_params"] = np.asarray(po.cam_params)[inv]
        d["pose_active"] = np.ones(W, bool)
        # incoming pose: at k=0 the whole window loads via carry0; later
        # only global pose k+W-1 (slot (k-1) % W) is new
        new_mask = np.zeros(W, bool)
        if k > 0:
            g = k + W - 1
            new_mask[g % W] = True
        d["new_pose_mask"] = new_mask
        d["new_q"] = np.asarray(po.q)[inv]
        d["new_t"] = np.asarray(po.t)[inv]
        d["new_v"] = np.asarray(po.v)[inv]
        d["new_b"] = np.asarray(po.b)[inv]

        # ---- landmark slots ----
        lmg = np.zeros(L_w, np.int64)         # global lm id per slot
        lmg[lm_ids % L_w] = lm_ids
        lm_alive = np.zeros(L_w, bool)
        lm_alive[lm_ids % L_w] = True
        d["lm_ref_pose"] = np.where(
            lm_alive, ref_pose[lmg] % W, 0).astype(np.int32)
        d["lm_ref_cam"] = np.where(
            lm_alive, np.asarray(problem.lms.ref_cam)[lmg], 0
        ).astype(np.int32)
        d["lm_active"] = lm_alive
        d["lm_z_ref"] = np.where(lm_alive[:, None],
                                 np.asarray(problem.lms.z_ref)[lmg], 0.0)
        d["lm_has_z_ref"] = np.where(
            lm_alive, np.asarray(problem.lms.has_z_ref)[lmg], False)
        d["lm_x_w"] = np.where(lm_alive[:, None],
                               np.asarray(problem.lms.x_w)[lmg], 0.0)
        new_lms = np.setdiff1d(lm_ids, prev_lm) if k else lm_ids
        nl_mask = np.zeros(L_w, bool)
        nl_mask[new_lms % L_w] = True
        if k == 0:
            nl_mask[:] = False                # k=0 loads via carry0
        d["new_lm_mask"] = nl_mask
        d["new_lm_x"] = np.where(nl_mask[:, None], lm_x0[lmg], 0.0)
        prev_lm = lm_ids

        # ---- residual tables (slot ids, padded) ----
        pp = pr_pose[rows_p] % W
        pl = lm_slot_of[pr_lm[rows_p]]
        pv = np.ones(len(rows_p), bool)
        d["proj_z"] = _pad_rows(np.asarray(problem.proj.z)[rows_p], Np)
        d["proj_pose"] = _pad_rows(pp, Np).astype(np.int32)
        d["proj_lm"] = _pad_rows(pl, Np).astype(np.int32)
        d["proj_cam"] = _pad_rows(
            np.asarray(problem.proj.cam)[rows_p], Np).astype(np.int32)
        d["proj_weight"] = _pad_rows(
            np.asarray(problem.proj.weight)[rows_p], Np)
        d["proj_valid"] = _pad_rows(pv, Np, False)
        # conditioning flags are part of the problem contract (they split
        # the robust-σ population, reference cpp:1360-1381) — relayout
        # must preserve them
        d["proj_cond"] = _pad_rows(
            np.asarray(problem.proj.cond)[rows_p], Np, False)

        ii1 = i1[rows_i] % W
        ii2 = i2[rows_i] % W
        iv_k = np.ones(len(rows_i), bool)
        d["imu_pose1"] = _pad_rows(ii1, Ni).astype(np.int32)
        d["imu_pose2"] = _pad_rows(ii2, Ni).astype(np.int32)
        d["imu_w"] = _pad_rows(np.asarray(problem.imu.w)[rows_i], Ni)
        d["imu_a"] = _pad_rows(np.asarray(problem.imu.a)[rows_i], Ni)
        d["imu_time"] = _pad_rows(np.asarray(problem.imu.time)[rows_i], Ni)
        d["imu_meas_valid"] = _pad_rows(
            np.asarray(problem.imu.meas_valid)[rows_i], Ni, False)
        d["imu_weight"] = _pad_rows(
            np.asarray(problem.imu.weight)[rows_i], Ni, 1)
        d["imu_valid"] = _pad_rows(iv_k, Ni, False)
        d["imu_cond"] = _pad_rows(
            np.asarray(problem.imu.cond)[rows_i], Ni, False)

        uu = u_pose[rows_u] % W
        d["unary_pose"] = _pad_rows(uu, Nu).astype(np.int32)
        d["unary_q"] = _pad_rows(np.asarray(problem.unary.q)[rows_u], Nu)
        d["unary_q"][len(rows_u):, 0] = 1.0
        d["unary_t"] = _pad_rows(np.asarray(problem.unary.t)[rows_u], Nu)
        d["unary_cov_inv"] = _pad_rows(
            np.asarray(problem.unary.cov_inv)[rows_u], Nu)
        d["unary_valid"] = _pad_rows(np.ones(len(rows_u), bool), Nu, False)

        bb1 = b1[rows_b] % W
        bb2 = b2[rows_b] % W
        d["binary_pose1"] = _pad_rows(bb1, Nb).astype(np.int32)
        d["binary_pose2"] = _pad_rows(bb2, Nb).astype(np.int32)
        d["binary_q"] = _pad_rows(np.asarray(problem.binary.q)[rows_b], Nb)
        d["binary_q"][len(rows_b):, 0] = 1.0
        d["binary_t"] = _pad_rows(np.asarray(problem.binary.t)[rows_b], Nb)
        d["binary_cov_inv"] = _pad_rows(
            np.asarray(problem.binary.cov_inv)[rows_b], Nb)
        d["binary_valid"] = _pad_rows(np.ones(len(rows_b), bool), Nb,
                                      False)

        # ---- per-slide structure index over SLOT ids ----
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
        d["pidx"] = jax.tree_util.tree_map(np.asarray, pidx)
        d["drop_slot"] = np.int32(k % W)
        per_slide.append(d)

    # pad the per-slide ProblemIndex tables to common shapes and stack all
    def table_max(name):
        return max(getattr(s["pidx"], name).shape[0] for s in per_slide)

    tmax = {n: table_max(n) for n in
            ("pair_a", "wb_pose", "bpair_a", "ipair_a", "sp_i")}
    for s in per_slide:
        px = s["pidx"]
        s["pidx"] = ProblemIndex(
            pair_a=_pad_rows(px.pair_a, tmax["pair_a"]),
            pair_b=_pad_rows(px.pair_b, tmax["pair_a"]),
            wb_pose=_pad_rows(px.wb_pose, tmax["wb_pose"]),
            wb_lm=_pad_rows(px.wb_lm, tmax["wb_pose"]),
            bpair_a=_pad_rows(px.bpair_a, tmax["bpair_a"]),
            bpair_b=_pad_rows(px.bpair_b, tmax["bpair_a"]),
            ipair_a=_pad_rows(px.ipair_a, tmax["ipair_a"]),
            ipair_b=_pad_rows(px.ipair_b, tmax["ipair_a"]),
            sp_i=_pad_rows(px.sp_i, tmax["sp_i"]),
            sp_j=_pad_rows(px.sp_j, tmax["sp_i"]),
            sp_valid=_pad_rows(px.sp_valid, tmax["sp_i"], False))

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.stack(xs)), *per_slide)

    # initial carry: window [0, W) states + alive-lm slot states
    lm_ids0 = slides[0][0]
    lx0 = np.zeros((L_w,) + lm_x0.shape[1:], f64)
    lx0[lm_ids0 % L_w] = lm_x0[lm_ids0]
    D = config.pose_dim
    marg0 = empty_marg_prior(W, D, jnp.asarray(po.t).dtype)
    carry0 = (jnp.asarray(np.asarray(po.q)[:W]),
              jnp.asarray(np.asarray(po.t)[:W]),
              jnp.asarray(np.asarray(po.v)[:W]),
              jnp.asarray(np.asarray(po.b)[:W]),
              jnp.asarray(lx0), marg0)
    return RingSchedule(W=W, L_w=L_w, n_slides=n_slides, inputs=stacked,
                        carry0=carry0, rig=problem.rig, g_vec=problem.g_vec)


def run_ring(schedule: RingSchedule, config: BAConfig, use_imu: bool,
             iters_per_slide: int, gn_damping: float = 1.0):
    """Scan the ring pipeline; returns (final_carry, outs) where outs is a
    dict of per-slide stacks: `cost` (last GN cost) and the retired
    keyframe's post-solve estimate `q`/`t`/`v`/`b` — i.e. the smoother's
    optimized trajectory for poses [0, n_slides).

    The whole trajectory is ONE XLA program; per-slide work is O(W), not
    O(P_total).  Jits internally with the stacked tables as ARGUMENTS —
    do not wrap in an outer jit that closes over the schedule, or the
    tables are baked into the program as constants (bloats the HLO enough
    to kill remote compiles)."""
    return _run_ring_jit(schedule.inputs, schedule.carry0, schedule.rig,
                         schedule.g_vec, config, use_imu, iters_per_slide,
                         schedule.W, schedule.L_w, gn_damping)


def ring_slide_step(carry, inp, rig, g_vec, config: BAConfig,
                    use_imu: bool, iters_per_slide: int, W: int, L_w: int,
                    gn_damping: float = 1.0):
    """ONE slide of the ring pipeline: load incoming pose/landmarks into
    their slots, solve the compact W-pose window, marginalize the retiring
    pose, emit its post-solve estimate.

    Shared verbatim by the batch scan (`run_ring`) and the online
    streaming smoother (`solver.streaming.StreamingRing`) so the two run
    the same math on value-identical tables (trajectories agree to f64
    roundoff; see streaming.py's docstring on why not bitwise)."""
    from .step import solve_fixed
    from .window import apply_marginalization

    q, t, v, b, lx, marg = carry
    dtype = t.dtype
    nm = inp["new_pose_mask"][:, None]
    q = jnp.where(nm, inp["new_q"], q)
    t = jnp.where(nm, inp["new_t"], t)
    v = jnp.where(nm, inp["new_v"], v)
    b = jnp.where(nm, inp["new_b"], b)
    lx = jnp.where(inp["new_lm_mask"][:, None], inp["new_lm_x"], lx)
    # refresh the prior's linearization rows for re-used slots (their
    # H rows are zero, so this only keeps the carried state coherent)
    marg = dataclasses.replace(
        marg,
        lin_q=jnp.where(nm, inp["new_q"], marg.lin_q),
        lin_t=jnp.where(nm, inp["new_t"], marg.lin_t),
        lin_v=jnp.where(nm, inp["new_v"], marg.lin_v),
        lin_b=jnp.where(nm, inp["new_b"], marg.lin_b))

    poses = PoseStates(q=q, t=t, v=v, b=b, time=inp["pose_time"],
                       active=inp["pose_active"],
                       mask=inp["pose_mask"],
                       cam_params=inp["pose_cam_params"])
    lms = LandmarkStates(x=lx, x_w=inp["lm_x_w"],
                         ref_pose=inp["lm_ref_pose"],
                         ref_cam=inp["lm_ref_cam"],
                         active=inp["lm_active"],
                         reliable=jnp.ones(L_w, bool),
                         z_ref=inp["lm_z_ref"],
                         has_z_ref=inp["lm_has_z_ref"])
    proj = ProjResiduals(z=inp["proj_z"], pose=inp["proj_pose"],
                         lm=inp["proj_lm"], cam=inp["proj_cam"],
                         weight=inp["proj_weight"],
                         valid=inp["proj_valid"],
                         cond=inp["proj_cond"], pair=inp["proj_pair"],
                         pair_swap=inp["proj_pair_swap"],
                         wb_meas=inp["proj_wb_meas"],
                         wb_ref=inp["proj_wb_ref"])
    unary = UnaryResiduals(pose=inp["unary_pose"], q=inp["unary_q"],
                           t=inp["unary_t"],
                           cov_inv=inp["unary_cov_inv"],
                           valid=inp["unary_valid"])
    binary = BinaryResiduals(pose1=inp["binary_pose1"],
                             pose2=inp["binary_pose2"],
                             q=inp["binary_q"], t=inp["binary_t"],
                             cov_inv=inp["binary_cov_inv"],
                             valid=inp["binary_valid"],
                             pair=inp["binary_pair"],
                             pair_swap=inp["binary_pair_swap"])
    imu = ImuResiduals(pose1=inp["imu_pose1"], pose2=inp["imu_pose2"],
                       w=inp["imu_w"], a=inp["imu_a"],
                       time=inp["imu_time"],
                       meas_valid=inp["imu_meas_valid"],
                       weight=inp["imu_weight"],
                       valid=inp["imu_valid"], cond=inp["imu_cond"],
                       pair=inp["imu_pair"],
                       pair_swap=inp["imu_pair_swap"],
                       c9=jnp.zeros(
                           (inp["imu_pose1"].shape[0], 9, 9), dtype),
                       c9_set=jnp.zeros((), bool))
    problem = Problem(poses=poses, lms=lms, rig=rig, proj=proj,
                      unary=unary, binary=binary, imu=imu,
                      g_vec=g_vec, marg=marg, pidx=inp["pidx"])
    problem, costs, _ = solve_fixed(problem, config, use_imu,
                                    iters_per_slide, gn_damping)
    drop = jnp.arange(W) == inp["drop_slot"]
    p2 = apply_marginalization(problem, config, use_imu, drop)
    new_carry = (p2.poses.q, p2.poses.t, p2.poses.v, p2.poses.b,
                 p2.lms.x, p2.marg)
    # the retiring pose's post-solve estimate IS the smoother's output
    # for that keyframe — emit it so the scan yields the full
    # optimized trajectory
    s = inp["drop_slot"]
    out = dict(cost=costs[-1], q=p2.poses.q[s], t=p2.poses.t[s],
               v=p2.poses.v[s], b=p2.poses.b[s])
    return new_carry, out



@partial(jax.jit, static_argnames=("config", "use_imu", "iters_per_slide",
                                   "W", "L_w", "gn_damping"))
def _run_ring_jit(inputs, carry0, rig, g_vec, config: BAConfig,
                  use_imu: bool, iters_per_slide: int, W: int, L_w: int,
                  gn_damping: float = 1.0):
    def slide(carry, inp):
        return ring_slide_step(carry, inp, rig, g_vec, config,
                               use_imu, iters_per_slide, W, L_w,
                               gn_damping)

    carry, outs = jax.lax.scan(slide, carry0, inputs)
    return carry, outs
