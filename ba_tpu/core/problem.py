"""Problem container: structure-of-arrays, static shapes, masks.

TPU-native redesign of the reference's problem graph
(`/root/reference/include/ba/BundleAdjuster.h:111-753` — `AddPose`,
`AddLandmark`, `AddProjectionResidual`, `AddUnaryConstraint`,
`AddBinaryConstraint`, `AddImuResidual`).  Where the reference keeps
pointer-linked structs with per-pose adjacency lists and a dense/active
`opt_id` remap, this build keeps *flat padded arrays + index tables + validity
masks*: every residual row carries the integer ids of the states it touches,
inactive or padded entries are masked rather than removed, and gauge fixing is
a per-dimension boolean mask (the reference's `param_mask` +
`regularize_pose`, BundleAdjuster.h:608-652).  That keeps all shapes static so
XLA compiles the whole solve once per problem-size bucket.

Compile-time template parameters of the reference
(`BundleAdjuster<Scalar, LmSize, PoseSize, CalibSize, DoTvs>`,
src/BundleAdjuster.cpp:1814-1831) become the hashable `BAConfig` passed as a
static argument to the jitted solver.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import camera as cam_mod
from . import lie

# ---------------------------------------------------------------------------
# Static configuration (the reference's template parameters + Options)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BAConfig:
    """Static solver configuration; hashable so it can be a jit static arg.

    Mirrors the reference template parameters (SURVEY.md §2.1 "Template
    configurations") and the runtime `Options<Scalar>`
    (/root/reference/include/ba/BundleAdjuster.h:72-107).
    """

    pose_dim: int = 6          # 6 (SE3) | 9 (+vel) | 15 (+gyro/accel bias)
    lm_size: int = 1           # 0 (pose graph) | 1 (inverse depth) | 3 (XYZ)
    calib_size: int = 0        # 0 | 5 (camera intrinsics)
    do_tvs: bool = False       # optimize camera-from-vehicle extrinsics
    # staged Tvs activation (reference translation_enabled_,
    # src/BundleAdjuster.cpp:257-271): with staging on, the Tvs
    # *translation* tangent dims stay frozen until the extrinsic rotation
    # stabilizes (se3-log diff < 0.01 between consecutive builds, >= 30
    # poses) — `solver.step.solve` carries the state across iterations and
    # flips `tvs_translation_active`
    tvs_translation_staging: bool = False
    tvs_translation_active: bool = True
    # evaluate projections with each measuring pose's own (frozen)
    # intrinsics instead of the rig camera's (reference h:96: AddPose
    # stores pose.cam_params, cpp:163-175 swaps them in per residual)
    use_per_pose_cam_params: bool = False

    # step control
    use_dogleg: bool = True
    trust_region_size: float = -1.0       # kTrustRegionAuto
    dogleg_max_inner_iterations: int = 100  # reference default, h:88
    error_change_threshold: float = 0.01
    param_change_threshold: float = 1e-3

    # reduced-system solver: dense Cholesky of S by default; the
    # matrix-free block-Jacobi PCG path (the TPU answer to the reference's
    # `use_sparse_solver` SimplicialLDLT, BundleAdjuster.h:92 /
    # cpp:752-826) never materializes S and scales to long trajectories
    use_cg_solver: bool = False
    cg_max_iterations: int = 100
    cg_tolerance: float = 1e-6

    # block half-bandwidth of the pose Hessian U along the trajectory
    # (max |pose_i - pose_j| over all two-pose residuals, + 1).  When > 0
    # (and calib/marg are off) the assembly uses a banded block grid +
    # scatter-free densification instead of per-family dense scatters —
    # set it with `ba_tpu.solver.assemble.band_width_of(problem)`.  0
    # keeps the general path.
    band_width: int = 0
    # banded direct reduced solve (solver/banded.py): the Schur complement
    # is assembled ON the band grid (the landmark co-observation span is
    # bounded by visibility) and factorized by a chunked block-tridiagonal
    # Cholesky — O(P) time/memory in the window length instead of the
    # dense O(P^3)/O(P^2).  Requires band_width > 0, no calibration block,
    # no marginalization prior (falls back to the dense path otherwise).
    use_banded_solver: bool = False
    # PCG iterations wrapped around the chunked band factorization
    # (solver/banded.py).  0 = auto (4 in f64, 12 in f32); lower is
    # faster but must still reduce the residual below the rhs or the
    # step is rejected (GnStep.ok gate).
    banded_pcg_iterations: int = 0
    # factor the chunked block-tridiagonal system by batched block CYCLIC
    # REDUCTION (log2(n_chunks) batched levels) instead of the sequential
    # lax.scan recurrence (n_chunks latency-bound steps) whenever the
    # chunk chain is >= 4 long.  Same factorization in exact arithmetic
    # (block elimination in odd-even order); both forms sit inside the
    # same short PCG wrap.  False keeps the scan.
    banded_cyclic_reduction: bool = True
    # chunk length (in poses) of the block-tridiagonal chunking; 0 = auto
    # (16, clamped to [band_width, P_window]).  The clamp keeps the
    # chunked system exactly block-tridiagonal (chunk >= band width).
    banded_chunk: int = 0
    # fleet layout (concat_problems): the pose axis is F independent
    # equal-length windows back to back.  The banded solver exploits it by
    # batching the chunked block-tridiagonal factorization ACROSS windows
    # (the chunk scan runs P/F/chunk sequential steps of F-batched MXU ops
    # instead of P/chunk rank-1 steps) — sequential depth stays that of ONE
    # window no matter the fleet size.  1 = single window.
    fleet_size: int = 1
    # banded Schur assembly + DENSE Cholesky (solver/banded.py
    # solve_reduced_banded_dense): the Schur correction is built from the
    # per-landmark W-block pair tables on the band grid — O(sum_l n_l^2)
    # small blocks instead of the O((P D)^2 L) dense W V^-1 W^T product
    # that dominates past ~512 poses — then factorized by one dense
    # Cholesky.  Requires band_width > 0 and no calibration block
    # (falls back to the dense path otherwise).
    schur_on_band: bool = False

    # robust norm (projection default True — reference BundleAdjuster.h:103)
    use_robust_norm_for_proj_residuals: bool = True
    use_robust_norm_for_unary_residuals: bool = False
    use_robust_norm_for_inertial_residuals: bool = False
    outlier_threshold: float = 1.0

    # IMU noise model (reference Types.h:33-36 defaults)
    gyro_sigma: float = 1.3088444e-3
    accel_sigma: float = 1.6968e-2
    gyro_bias_sigma: float = 1.3088444e-4
    accel_bias_sigma: float = 1.6968e-3
    gravity: float = lie.GRAVITY

    regularize_biases_in_batch: bool = True
    enable_auto_regularization: bool = True
    # freeze the IMU integration covariance after the first build
    # (reference BundleAdjuster.h:106, parallel_algos.h:190-205)
    calculate_inertial_covariance_once: bool = False

    # rotation-only switched inertial residuals (reference
    # SwitchedFullImuCostFunction, CeresCostFunctions.h:274-345): zero the
    # whitened translation (rows 0:3) and velocity (rows 6:9) residual/
    # Jacobian rows, keeping only the gyro rotation information — the
    # ViCalibrator stage-0 mode (ViCalibrator.h:435-450)
    imu_rotation_only: bool = False

    # calibration observability (reference Options, BundleAdjuster.h:92-99):
    # fill Summary.calibration_marginals by unit-vector solves of the
    # reduced system (cpp:771-785), and/or dump the reduced camera system
    # as text files to this directory (cpp:600-627; "" = off)
    calculate_calibration_marginals: bool = False
    write_reduced_camera_matrix: str = ""

    @property
    def vel_in_state(self) -> bool:
        return self.pose_dim >= 9

    @property
    def bias_in_state(self) -> bool:
        return self.pose_dim >= 15

    @property
    def calib_dim(self) -> int:
        return self.calib_size + (6 if self.do_tvs else 0)

    @property
    def tvs_offset(self) -> int:
        return self.calib_size


# ---------------------------------------------------------------------------
# Pytree state containers
# ---------------------------------------------------------------------------


def _pytree_dataclass(cls):
    cls = dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class PoseStates:
    """All poses (active + inactive), reference `PoseT` (Types.h:41-71)."""

    q: jax.Array          # (P, 4) world-from-vehicle rotation, wxyz
    t: jax.Array          # (P, 3) world-from-vehicle translation
    v: jax.Array          # (P, 3) velocity in world
    b: jax.Array          # (P, 6) [gyro bias, accel bias]
    time: jax.Array       # (P,)
    active: jax.Array     # (P,) bool — in the state vector at all
    mask: jax.Array       # (P, 15) bool — per-dim optimize flag (param_mask)
    cam_params: jax.Array  # (P, MAX_PARAMS) per-pose intrinsics (frozen
                           # inputs; used when use_per_pose_cam_params —
                           # reference PoseT::cam_params, Types.h:46)


@_pytree_dataclass
class LandmarkStates:
    """Landmarks, reference `LandmarkT` (Types.h:73-89).

    `x` is the homogeneous parameterization:
      lm_size==1: x_s in the reference *sensor* frame, unit ray norm, the
                  optimized variable is x[3] = inverse depth (rho);
      lm_size==3: x[:3] = x_w world position, x[3] = 1.
    `x_w` (world, homogeneous) is kept alongside for conversion in/out.
    """

    x: jax.Array          # (L, 4)
    x_w: jax.Array        # (L, 4)
    ref_pose: jax.Array   # (L,) int32
    ref_cam: jax.Array    # (L,) int32
    active: jax.Array     # (L,) bool
    reliable: jax.Array   # (L,) bool — cleared when inverse depth went negative
    z_ref: jax.Array      # (L, 2) reference-view pixel (for self-calib ray
                          # re-unprojection, reference LandmarkT::z_ref)
    has_z_ref: jax.Array  # (L,) bool


@_pytree_dataclass
class Rig:
    """Cameras: intrinsics + camera-from-vehicle extrinsics T_vs."""

    params: jax.Array     # (C, MAX_PARAMS)
    model: jax.Array      # (C,) int32 — camera.MODEL_*
    tvs_q: jax.Array      # (C, 4)
    tvs_t: jax.Array      # (C, 3)


@_pytree_dataclass
class ProjResiduals:
    """2D reprojection residual table (ProjectionResidualT, Types.h:255-268).

    `pair`/`pair_swap`/`wb_meas`/`wb_ref` are host-precomputed sparsity
    indices for block-structured normal-equation assembly (see
    `build_structure_index`): `pair` points into the unique
    (meas-pose, ref-pose) pair table of `ProblemIndex` (block stored
    transposed when `pair_swap`), `wb_meas`/`wb_ref` into the unique
    (pose, landmark) W-block table.
    """

    z: jax.Array          # (Nr, 2) measured pixels
    pose: jax.Array       # (Nr,) int32 measuring pose id
    lm: jax.Array         # (Nr,) int32 landmark id
    cam: jax.Array        # (Nr,) int32 camera id
    weight: jax.Array     # (Nr,) base weight (before robust reweighting)
    valid: jax.Array      # (Nr,) bool
    cond: jax.Array       # (Nr,) bool — conditioning edge (ref pose inactive)
    pair: jax.Array       # (Nr,) int32 — row in ProblemIndex.pair_a/b
    pair_swap: jax.Array  # (Nr,) bool
    wb_meas: jax.Array    # (Nr,) int32 — row in ProblemIndex.wb_pose/lm
    wb_ref: jax.Array     # (Nr,) int32


@_pytree_dataclass
class UnaryResiduals:
    """SE3 pose prior (UnaryResidualT, Types.h:270-281)."""

    pose: jax.Array       # (Nu,) int32
    q: jax.Array          # (Nu, 4) prior rotation
    t: jax.Array          # (Nu, 3) prior translation
    cov_inv: jax.Array    # (Nu, 6, 6) — robust-rescaled in place (§7.4)
    valid: jax.Array      # (Nu,) bool


@_pytree_dataclass
class BinaryResiduals:
    """Relative-pose constraint (BinaryResidualT, Types.h:283-296)."""

    pose1: jax.Array      # (Nb,) int32
    pose2: jax.Array      # (Nb,) int32
    q: jax.Array          # (Nb, 4) measured T_12 rotation
    t: jax.Array          # (Nb, 3) measured T_12 translation
    cov_inv: jax.Array    # (Nb, 6, 6)
    valid: jax.Array      # (Nb,) bool
    pair: jax.Array       # (Nb,) int32 — row in ProblemIndex.bpair_a/b
    pair_swap: jax.Array  # (Nb,) bool


@_pytree_dataclass
class ImuResiduals:
    """IMU preintegration residual spans (ImuResidualT, Types.h:298-321).

    Measurements are padded to a fixed max span length M with a validity
    mask — the ragged-span analog of the reference's per-residual
    vector<ImuMeasurementT>.
    """

    pose1: jax.Array      # (Ni,) int32
    pose2: jax.Array      # (Ni,) int32
    w: jax.Array          # (Ni, M, 3) gyro
    a: jax.Array          # (Ni, M, 3) accel
    time: jax.Array       # (Ni, M)
    meas_valid: jax.Array  # (Ni, M) bool
    weight: jax.Array     # (Ni,) robust weight state (persistent, §7.4)
    valid: jax.Array      # (Ni,) bool
    cond: jax.Array       # (Ni,) bool — conditioning edge
    pair: jax.Array       # (Ni,) int32 — row in ProblemIndex.ipair_a/b
    pair_swap: jax.Array  # (Ni,) bool
    c9: jax.Array         # (Ni, 9, 9) cached integration covariance
    c9_set: jax.Array     # () bool — cache populated
                          # (`calculate_inertial_covariance_once`,
                          # reference BundleAdjuster.h:106)


@_pytree_dataclass
class MargPrior:
    """Dense marginalization prior over all pose slots (sliding window).

    Quadratic factor at a first-estimate linearization point:
      E(x) = delta^T H delta + 2 g^T delta,   delta = x (-) lin
    with the right-tangent difference delta matching the solver retraction.
    The reference only prototypes this (matlab/marginalization.py:44-51 —
    prior = Schur complement of the departing block); here it is a
    first-class residual family (SURVEY.md §5.7).
    """

    H: jax.Array          # (P*D, P*D)
    g: jax.Array          # (P*D,)
    lin_q: jax.Array      # (P, 4)
    lin_t: jax.Array      # (P, 3)
    lin_v: jax.Array      # (P, 3)
    lin_b: jax.Array      # (P, 6)
    active: jax.Array     # () bool


def empty_marg_prior(P: int, pose_dim: int, dtype,
                     enabled: bool = True) -> MargPrior:
    """`enabled=False` allocates a degenerate (1,1) H so long-trajectory
    problems (which never marginalize in place) don't carry an O((P*D)^2)
    dense prior; the assembly skips the prior when H's shape doesn't match
    the pose dims (a static-shape gate)."""
    n = P * pose_dim if enabled else 1
    return MargPrior(H=jnp.zeros((n, n), dtype), g=jnp.zeros((n,), dtype),
                     lin_q=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype),
                                    (P, 1)),
                     lin_t=jnp.zeros((P, 3), dtype),
                     lin_v=jnp.zeros((P, 3), dtype),
                     lin_b=jnp.zeros((P, 6), dtype),
                     active=jnp.zeros((), bool))


@_pytree_dataclass
class ProblemIndex:
    """Host-precomputed sparsity tables for block-structured assembly.

    The reference's block-CCS containers (SparseBlockMatrix.h) carry the
    sparsity pattern as per-column linked storage; on TPU the pattern is
    *static per problem instance*, so it is enumerated once on the host at
    build time and the normal equations are assembled by `segment_sum` of
    per-residual block outer products into these unique-index tables — a
    collision-free formulation that replaces the O(Nr * N^2) dense-Jacobian
    matmuls of the naive scatter-J design.

    Rows beyond the real count are padding (index 0, zero blocks).
    """

    pair_a: jax.Array     # (Npr,) int32 — unique projection pose pairs a<=b
    pair_b: jax.Array     # (Npr,)
    wb_pose: jax.Array    # (Nw,) int32 — unique (pose, landmark) W blocks
    wb_lm: jax.Array      # (Nw,)
    bpair_a: jax.Array    # (Nbp,) int32 — unique binary pose pairs
    bpair_b: jax.Array
    ipair_a: jax.Array    # (Nip,) int32 — unique IMU pose pairs
    ipair_b: jax.Array
    # per-landmark W-block pairs (rows i, j of wb_pose/wb_lm with the same
    # landmark, pose[i] <= pose[j], i == j included): the sparsity of the
    # Schur correction W V^-1 W^T — each pair contributes one 6x6 block at
    # pose-pair (wb_pose[i], wb_pose[j]), which the banded solver
    # segment-sums straight onto the band grid (solver/banded.py)
    sp_i: jax.Array       # (Nsp,) int32
    sp_j: jax.Array       # (Nsp,) int32
    sp_valid: jax.Array   # (Nsp,) bool — False on padding rows


def _pair_table_np(i_idx, j_idx, valid, n_states, pad_multiple=1):
    """Canonical (a<=b) unique-pair table + per-row pair id / swap flag.

    Invalid rows map to pair 0 (their blocks are zero downstream)."""
    i_idx = np.asarray(i_idx, np.int64)
    j_idx = np.asarray(j_idx, np.int64)
    valid = np.asarray(valid, bool)
    a = np.minimum(i_idx, j_idx)
    b = np.maximum(i_idx, j_idx)
    swap = i_idx > j_idx
    m = max(int(n_states), 1)
    key = a * m + b
    pair = np.zeros(len(i_idx), np.int32)
    if valid.any():
        uniq, inv = np.unique(key[valid], return_inverse=True)
        pair[valid] = inv.astype(np.int32)
    else:
        uniq = np.zeros(0, np.int64)
    npr = _round_up(max(len(uniq), 1), pad_multiple)
    pa = np.zeros(npr, np.int32)
    pb = np.zeros(npr, np.int32)
    pa[: len(uniq)] = uniq // m
    pb[: len(uniq)] = uniq % m
    return pair, swap, pa, pb


def _wblock_table_np(pose_m, pose_r, lm, valid, n_lms, pad_multiple=1):
    """Unique (pose, landmark) W-block table + per-row block ids for the
    measuring-pose and reference-pose entries."""
    pose_m = np.asarray(pose_m, np.int64)
    pose_r = np.asarray(pose_r, np.int64)
    lm = np.asarray(lm, np.int64)
    valid = np.asarray(valid, bool)
    m = max(int(n_lms), 1)
    key_m = pose_m * m + lm
    key_r = pose_r * m + lm
    n = len(lm)
    wb_m = np.zeros(n, np.int32)
    wb_r = np.zeros(n, np.int32)
    if valid.any():
        keys = np.concatenate([key_m[valid], key_r[valid]])
        uniq, inv = np.unique(keys, return_inverse=True)
        nv = int(valid.sum())
        wb_m[valid] = inv[:nv].astype(np.int32)
        wb_r[valid] = inv[nv:].astype(np.int32)
    else:
        uniq = np.zeros(0, np.int64)
    nw = _round_up(max(len(uniq), 1), pad_multiple)
    wp = np.zeros(nw, np.int32)
    # padding rows carry the OUT-OF-RANGE landmark id m (== n_lms): their
    # blocks are zero everywhere, but an in-range fake (pose 0, lm 0) row
    # would corrupt per-landmark reductions over the table (segment_min
    # of first-observing-pose in the grouped banded Schur path); gathers
    # clip and scatters drop out-of-range ids, so consumers are unchanged
    wl = np.full(nw, m, np.int32)
    wp[: len(uniq)] = uniq // m
    wl[: len(uniq)] = uniq % m
    return wb_m, wb_r, wp, wl, len(uniq)


def _schur_pair_table_np(wp, wl, n_uniq, pad_multiple=1):
    """Per-landmark pairs of W-block rows (i, j), pose[i] <= pose[j],
    including i == j — the block sparsity of W V^-1 W^T.

    Count is sum_l n_l (n_l + 1) / 2 over observing-pose counts n_l, i.e.
    linear in the residual count times the mean track length."""
    wp = np.asarray(wp[:n_uniq], np.int64)
    wl = np.asarray(wl[:n_uniq], np.int64)
    if n_uniq == 0:
        npad = _round_up(1, pad_multiple)
        z = np.zeros(npad, np.int32)
        return z, z.copy(), np.zeros(npad, bool)
    order = np.lexsort((wp, wl))          # by landmark, then pose
    lm_s = wl[order]
    new_grp = np.r_[True, lm_s[1:] != lm_s[:-1]]
    starts = np.flatnonzero(new_grp)
    grp = np.cumsum(new_grp) - 1
    local = np.arange(n_uniq) - starts[grp]
    rep = local + 1                        # element k pairs with local+1 rows
    total = int(rep.sum())
    end = np.cumsum(rep)
    within = np.arange(total) - np.repeat(end - rep, rep)
    sp_j_sorted = np.repeat(np.arange(n_uniq), rep)
    sp_i_sorted = np.repeat(np.arange(n_uniq) - local, rep) + within
    sp_i = order[sp_i_sorted].astype(np.int32)
    sp_j = order[sp_j_sorted].astype(np.int32)
    npad = _round_up(total, pad_multiple)
    valid = np.zeros(npad, bool)
    valid[:total] = True
    return (_pad(sp_i, npad).astype(np.int32),
            _pad(sp_j, npad).astype(np.int32), valid)


def build_structure_index(proj_pose, proj_ref_pose, proj_lm, proj_valid,
                          b1, b2, b_valid, i1, i2, i_valid, P, L,
                          pad_multiple=1, as_numpy=False):
    """All host-side sparsity tables from packed numpy index arrays.

    Returns (per_row, tables): per_row has 'pair'/'pair_swap'/'wb_meas'/
    'wb_ref' for projections and 'bpair'/'bswap'/'ipair'/'iswap' for the
    binary/IMU families; `tables` is a ProblemIndex.
    """
    pair, swap, pa, pb = _pair_table_np(proj_pose, proj_ref_pose,
                                        proj_valid, P, pad_multiple)
    wb_m, wb_r, wp, wl, n_wb = _wblock_table_np(proj_pose, proj_ref_pose,
                                                proj_lm, proj_valid, L,
                                                pad_multiple)
    sp_i, sp_j, sp_valid = _schur_pair_table_np(wp, wl, n_wb, pad_multiple)
    bpair, bswap, bpa, bpb = _pair_table_np(b1, b2, b_valid, P, pad_multiple)
    ipair, iswap, ipa, ipb = _pair_table_np(i1, i2, i_valid, P, pad_multiple)
    per_row = dict(pair=pair, pair_swap=swap, wb_meas=wb_m, wb_ref=wb_r,
                   bpair=bpair, bswap=bswap, ipair=ipair, iswap=iswap)
    # `as_numpy` keeps the tables host-side: the streaming smoother packs
    # them itself, and each jnp.asarray here is a device transfer (a
    # ~25 ms round trip per table through a remote-TPU tunnel)
    conv = (lambda a: a) if as_numpy else jnp.asarray
    tables = ProblemIndex(
        pair_a=conv(pa), pair_b=conv(pb),
        wb_pose=conv(wp), wb_lm=conv(wl),
        bpair_a=conv(bpa), bpair_b=conv(bpb),
        ipair_a=conv(ipa), ipair_b=conv(ipb),
        sp_i=conv(sp_i), sp_j=conv(sp_j),
        sp_valid=conv(sp_valid))
    return per_row, tables


@_pytree_dataclass
class Problem:
    """The whole problem as one pytree of static-shape arrays."""

    poses: PoseStates
    lms: LandmarkStates
    rig: Rig
    proj: ProjResiduals
    unary: UnaryResiduals
    binary: BinaryResiduals
    imu: ImuResiduals
    g_vec: jax.Array       # (3,) gravity in world
    marg: MargPrior        # sliding-window marginalization prior
    pidx: ProblemIndex     # block-structured assembly sparsity tables


def stack_problems(problems) -> Problem:
    """Stack same-shape problems along a new leading fleet axis.

    All problems must share padded shapes (same size bucket); the result
    feeds `solver.step.solve_fleet`, which vmaps the solver over the axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *problems)


def concat_problems(problems, config: BAConfig) -> Problem:
    """Fuse B independent windows into ONE block-diagonal problem.

    The natively-batched fleet layout (no vmap): poses/landmarks/cameras of
    each window are concatenated with offset ids and the sparsity tables
    are re-enumerated, so the whole fleet solves as a single program whose
    segment sums, gathers and band grid are plain rank-1 ops — vmap's
    batched gathers/scatters and batched Cholesky measurably lose
    (BASELINE.md fleet table); this layout is how a fleet of B windows
    rides the same O(P) banded machinery as one long trajectory.

    Windows must not carry an active dense marginalization prior (the
    fused prior would be O((B P D)^2)); build with `with_marg_prior=False`
    or marginalize per-window before fusing.  No reference analog: the
    reference is single-problem single-node (SURVEY.md §2.4).

    Returns the fused Problem; per-window results can be split back by
    pose/landmark offsets (`B * P_i` slices).
    """
    import numpy as np

    if not problems:
        raise ValueError("concat_problems needs at least one problem")
    dtype = np.asarray(problems[0].poses.t).dtype

    for p in problems:
        if bool(np.asarray(p.marg.active)):
            raise ValueError("concat_problems: active marginalization "
                             "priors are per-window state; marginalize "
                             "before fusing")
    g0 = np.asarray(problems[0].g_vec)
    for p in problems[1:]:
        if not np.allclose(np.asarray(p.g_vec), g0):
            raise ValueError("concat_problems: gravity vectors differ")

    def np_of(x):
        return np.asarray(x)

    pose_off, lm_off, cam_off = [], [], []
    po = lo = co = 0
    for p in problems:
        pose_off.append(po)
        lm_off.append(lo)
        cam_off.append(co)
        po += p.poses.q.shape[0]
        lo += p.lms.x.shape[0]
        co += p.rig.params.shape[0]
    P, L, C = po, lo, co

    def cat(get, off=None, off_list=None):
        parts = []
        for i, p in enumerate(problems):
            a = np_of(get(p))
            if off_list is not None:
                a = a + off_list[i]
            parts.append(a)
        return np.concatenate(parts, axis=0)

    poses = PoseStates(
        q=jnp.asarray(cat(lambda p: p.poses.q)),
        t=jnp.asarray(cat(lambda p: p.poses.t)),
        v=jnp.asarray(cat(lambda p: p.poses.v)),
        b=jnp.asarray(cat(lambda p: p.poses.b)),
        time=jnp.asarray(cat(lambda p: p.poses.time)),
        active=jnp.asarray(cat(lambda p: p.poses.active)),
        mask=jnp.asarray(cat(lambda p: p.poses.mask)),
        cam_params=jnp.asarray(cat(lambda p: p.poses.cam_params)))
    lms = LandmarkStates(
        x=jnp.asarray(cat(lambda p: p.lms.x)),
        x_w=jnp.asarray(cat(lambda p: p.lms.x_w)),
        ref_pose=jnp.asarray(cat(lambda p: p.lms.ref_pose,
                                 off_list=pose_off).astype(np.int32)),
        ref_cam=jnp.asarray(cat(lambda p: p.lms.ref_cam,
                                off_list=cam_off).astype(np.int32)),
        active=jnp.asarray(cat(lambda p: p.lms.active)),
        reliable=jnp.asarray(cat(lambda p: p.lms.reliable)),
        z_ref=jnp.asarray(cat(lambda p: p.lms.z_ref)),
        has_z_ref=jnp.asarray(cat(lambda p: p.lms.has_z_ref)))
    rig = Rig(params=jnp.asarray(cat(lambda p: p.rig.params)),
              model=jnp.asarray(cat(lambda p: p.rig.model)),
              tvs_q=jnp.asarray(cat(lambda p: p.rig.tvs_q)),
              tvs_t=jnp.asarray(cat(lambda p: p.rig.tvs_t)))

    proj_pose = cat(lambda p: p.proj.pose, off_list=pose_off).astype(
        np.int64)
    proj_lm = cat(lambda p: p.proj.lm, off_list=lm_off).astype(np.int64)
    proj_valid = cat(lambda p: p.proj.valid)
    lm_ref_np = np_of(lms.ref_pose)
    proj_ref = lm_ref_np[proj_lm]
    b1 = cat(lambda p: p.binary.pose1, off_list=pose_off).astype(np.int64)
    b2 = cat(lambda p: p.binary.pose2, off_list=pose_off).astype(np.int64)
    b_valid = cat(lambda p: p.binary.valid)
    i1 = cat(lambda p: p.imu.pose1, off_list=pose_off).astype(np.int64)
    i2 = cat(lambda p: p.imu.pose2, off_list=pose_off).astype(np.int64)
    i_valid = cat(lambda p: p.imu.valid)
    per_row, pidx = build_structure_index(
        proj_pose, proj_ref, proj_lm, proj_valid,
        b1, b2, b_valid, i1, i2, i_valid, P, L)

    proj = ProjResiduals(
        z=jnp.asarray(cat(lambda p: p.proj.z)),
        pose=jnp.asarray(proj_pose.astype(np.int32)),
        lm=jnp.asarray(proj_lm.astype(np.int32)),
        cam=jnp.asarray(cat(lambda p: p.proj.cam,
                            off_list=cam_off).astype(np.int32)),
        weight=jnp.asarray(cat(lambda p: p.proj.weight)),
        valid=jnp.asarray(proj_valid),
        cond=jnp.asarray(cat(lambda p: p.proj.cond)),
        pair=jnp.asarray(per_row["pair"]),
        pair_swap=jnp.asarray(per_row["pair_swap"]),
        wb_meas=jnp.asarray(per_row["wb_meas"]),
        wb_ref=jnp.asarray(per_row["wb_ref"]))
    unary = UnaryResiduals(
        pose=jnp.asarray(cat(lambda p: p.unary.pose,
                             off_list=pose_off).astype(np.int32)),
        q=jnp.asarray(cat(lambda p: p.unary.q)),
        t=jnp.asarray(cat(lambda p: p.unary.t)),
        cov_inv=jnp.asarray(cat(lambda p: p.unary.cov_inv)),
        valid=jnp.asarray(cat(lambda p: p.unary.valid)))
    binary = BinaryResiduals(
        pose1=jnp.asarray(b1.astype(np.int32)),
        pose2=jnp.asarray(b2.astype(np.int32)),
        q=jnp.asarray(cat(lambda p: p.binary.q)),
        t=jnp.asarray(cat(lambda p: p.binary.t)),
        cov_inv=jnp.asarray(cat(lambda p: p.binary.cov_inv)),
        valid=jnp.asarray(b_valid),
        pair=jnp.asarray(per_row["bpair"]),
        pair_swap=jnp.asarray(per_row["bswap"]))

    M = max(p.imu.w.shape[1] for p in problems)

    def cat_imu(get):
        parts = []
        for p in problems:
            a = np_of(get(p))
            if a.shape[1] < M:
                pad = [(0, 0), (0, M - a.shape[1])] + \
                    [(0, 0)] * (a.ndim - 2)
                if a.dtype == np.bool_:
                    a = np.pad(a, pad, constant_values=False)
                elif a.ndim == 2:
                    # times: repeat the last timestamp so dt = 0 on padding
                    a = np.concatenate(
                        [a, np.repeat(a[:, -1:], M - a.shape[1], 1)], 1)
                else:
                    a = np.pad(a, pad)
            parts.append(a)
        return np.concatenate(parts, axis=0)

    imu = ImuResiduals(
        pose1=jnp.asarray(i1.astype(np.int32)),
        pose2=jnp.asarray(i2.astype(np.int32)),
        w=jnp.asarray(cat_imu(lambda p: p.imu.w)),
        a=jnp.asarray(cat_imu(lambda p: p.imu.a)),
        time=jnp.asarray(cat_imu(lambda p: p.imu.time)),
        meas_valid=jnp.asarray(cat_imu(lambda p: p.imu.meas_valid)),
        weight=jnp.asarray(cat(lambda p: p.imu.weight)),
        valid=jnp.asarray(i_valid),
        cond=jnp.asarray(cat(lambda p: p.imu.cond)),
        pair=jnp.asarray(per_row["ipair"]),
        pair_swap=jnp.asarray(per_row["iswap"]),
        c9=jnp.asarray(cat(lambda p: p.imu.c9)),
        c9_set=jnp.zeros((), bool))

    marg = empty_marg_prior(P, config.pose_dim, poses.t.dtype,
                            enabled=False)
    marg = dataclasses.replace(marg, lin_q=poses.q, lin_t=poses.t,
                               lin_v=poses.v, lin_b=poses.b)
    return Problem(poses=poses, lms=lms, rig=rig, proj=proj, unary=unary,
                   binary=binary, imu=imu,
                   g_vec=jnp.asarray(g0.astype(dtype)), marg=marg,
                   pidx=pidx)


# ---------------------------------------------------------------------------
# Host-side builder (numpy; the Add* API of the reference)
# ---------------------------------------------------------------------------


def _pad(arr, n, fill=0.0):
    arr = np.asarray(arr)
    if arr.shape[0] == n:
        return arr
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], 0)


def _round_up(n, mult):
    return max(mult, ((n + mult - 1) // mult) * mult)


class ProblemBuilder:
    """Incremental host-side problem construction, then `.build()` to arrays.

    API parity with the reference's Add* surface
    (BundleAdjuster.h:259-546); padding to static shapes happens at build
    time so the jitted solver compiles once per size bucket.
    """

    def __init__(self, config: BAConfig, dtype=np.float64):
        self.config = config
        self.dtype = dtype
        self.cams: list[tuple[np.ndarray, int, np.ndarray, np.ndarray]] = []
        self.poses: list[dict] = []
        self.lms: list[dict] = []
        self.proj: list[dict] = []
        self.unary: list[dict] = []
        self.binary: list[dict] = []
        self.imu: list[dict] = []
        self.manual_masks: dict[int, dict] = {}   # regularize_pose
        self.gravity_vec: Optional[np.ndarray] = None

    def set_gravity(self, g_vec) -> None:
        """Explicit world gravity vector (reference SetGravity, h:254-257);
        default is (0, 0, -config.gravity)."""
        self.gravity_vec = np.asarray(g_vec, self.dtype)

    # -- cameras ---------------------------------------------------------
    def add_camera(self, params, model=cam_mod.MODEL_LINEAR,
                   tvs_q=(1.0, 0, 0, 0), tvs_t=(0.0, 0, 0)) -> int:
        p = np.zeros(cam_mod.MAX_PARAMS, self.dtype)
        p[: len(params)] = params
        self.cams.append((p, int(model), np.asarray(tvs_q, self.dtype),
                          np.asarray(tvs_t, self.dtype)))
        return len(self.cams) - 1

    # -- states ----------------------------------------------------------
    def add_pose(self, q, t, v=(0.0, 0, 0), b=(0.0,) * 6, active=True,
                 time=0.0, cam_params=None) -> int:
        """`cam_params` are the pose's own frozen intrinsics (reference
        AddPose, h:292-303), used when `use_per_pose_cam_params`."""
        cp = np.zeros(cam_mod.MAX_PARAMS, self.dtype)
        if cam_params is not None:
            cp[: len(cam_params)] = cam_params
        self.poses.append(dict(q=np.asarray(q, self.dtype),
                               t=np.asarray(t, self.dtype),
                               v=np.asarray(v, self.dtype),
                               b=np.asarray(b, self.dtype),
                               active=bool(active), time=float(time),
                               cam_params=cp))
        return len(self.poses) - 1

    def regularize_pose(self, pose_id: int, translation: bool = True,
                        gravity: bool = False, bias: bool = False,
                        rotation: bool = False) -> None:
        """Manually fix pose dims (reference RegularizePose, h:608-631):
        the pose gets an explicit all-optimized mask minus the selected
        groups, and is exempted from automatic gauge fixing.  `gravity`
        fixes only the rotation axis most aligned with gravity
        (GetGravityRegularizationDimension, h:634-652).

        Deviation: the reference's `rotation` branch clears indices
        {2, 4, 5} — index 2 is translation-z, an apparent transcription
        bug (quirk family of SURVEY.md §7); here rotation means {3, 4, 5}.
        """
        self.manual_masks[int(pose_id)] = dict(
            translation=bool(translation), gravity=bool(gravity),
            bias=bool(bias), rotation=bool(rotation))

    def add_landmark(self, x_w, ref_pose: int, ref_cam: int = 0,
                     active=True) -> int:
        x_w = np.asarray(x_w, self.dtype)
        if x_w.shape == (3,):
            x_w = np.concatenate([x_w, [1.0]])
        self.lms.append(dict(x_w=x_w, ref_pose=int(ref_pose),
                             ref_cam=int(ref_cam), active=bool(active),
                             z_ref=None))
        return len(self.lms) - 1

    # -- residuals -------------------------------------------------------
    def add_projection_residual(self, z, meas_pose: int, lm: int,
                                cam: int = 0, weight=1.0):
        """Skips the reference observation in inverse-depth mode (the
        residual would be identically zero — BundleAdjuster.h:488-501).

        Only the observation from the reference *camera* at the reference
        pose is skipped (cam_id == lm.ref_cam_id, h:480-501): a same-pose
        observation from the other camera of a stereo rig is the primary
        depth constraint and must be kept.
        """
        if (self.config.lm_size == 1
                and meas_pose == self.lms[lm]["ref_pose"]
                and cam == self.lms[lm]["ref_cam"]):
            # record the reference-view pixel: self-calibration re-unprojects
            # the landmark ray from it when intrinsics move (reference
            # BundleAdjuster.h:488-501 + ApplyUpdate cpp:58-68)
            self.lms[lm]["z_ref"] = np.asarray(z, self.dtype)
            return
        cond = (not self.poses[self.lms[lm]["ref_pose"]]["active"]
                and self.poses[meas_pose]["active"])
        self.proj.append(dict(z=np.asarray(z, self.dtype), pose=meas_pose,
                              lm=lm, cam=cam, weight=float(weight),
                              cond=cond))

    def add_unary_constraint(self, pose: int, q, t, cov=None):
        cov_inv = (np.eye(6, dtype=self.dtype) if cov is None
                   else np.linalg.inv(np.asarray(cov, self.dtype)))
        self.unary.append(dict(pose=pose, q=np.asarray(q, self.dtype),
                               t=np.asarray(t, self.dtype), cov_inv=cov_inv))

    def add_binary_constraint(self, pose1: int, pose2: int, q, t, cov=None):
        cov_inv = (np.eye(6, dtype=self.dtype) if cov is None
                   else np.linalg.inv(np.asarray(cov, self.dtype)))
        self.binary.append(dict(pose1=pose1, pose2=pose2,
                                q=np.asarray(q, self.dtype),
                                t=np.asarray(t, self.dtype), cov_inv=cov_inv))

    def add_imu_residual(self, pose1: int, pose2: int, w, a, time):
        cond = (not self.poses[pose1]["active"]
                and self.poses[pose2]["active"])
        self.imu.append(dict(pose1=pose1, pose2=pose2,
                             w=np.asarray(w, self.dtype),
                             a=np.asarray(a, self.dtype),
                             time=np.asarray(time, self.dtype), cond=cond))

    # -- build -----------------------------------------------------------
    def build(self, pad_multiple: int = 1,
              with_marg_prior: bool = True) -> Problem:
        dt = self.dtype
        P = _round_up(len(self.poses), pad_multiple)
        L = _round_up(max(len(self.lms), 1), pad_multiple)
        C = max(len(self.cams), 1)
        Nr = _round_up(max(len(self.proj), 1), pad_multiple)
        Nu = _round_up(max(len(self.unary), 1), pad_multiple)
        Nb = _round_up(max(len(self.binary), 1), pad_multiple)
        Ni = _round_up(max(len(self.imu), 1), pad_multiple)
        M = max([m["w"].shape[0] for m in self.imu] + [1])

        n_p = len(self.poses)
        poses = PoseStates(
            q=jnp.asarray(_pad(np.stack([p["q"] for p in self.poses])
                               if n_p else np.zeros((0, 4), dt), P)
                          + np.concatenate([np.zeros((min(n_p, P), 4)),
                                            np.tile([1.0, 0, 0, 0],
                                                    (P - n_p, 1))])),
            t=jnp.asarray(_pad(np.stack([p["t"] for p in self.poses])
                               if n_p else np.zeros((0, 3), dt), P)),
            v=jnp.asarray(_pad(np.stack([p["v"] for p in self.poses])
                               if n_p else np.zeros((0, 3), dt), P)),
            b=jnp.asarray(_pad(np.stack([p["b"] for p in self.poses])
                               if n_p else np.zeros((0, 6), dt), P)),
            time=jnp.asarray(_pad(np.array([p["time"] for p in self.poses],
                                           dt), P)),
            active=jnp.asarray(_pad(np.array([p["active"]
                                              for p in self.poses],
                                             bool), P, False)),
            mask=jnp.asarray(self._build_param_mask(P)),
            cam_params=jnp.asarray(_pad(
                np.stack([p["cam_params"] for p in self.poses]) if n_p
                else np.zeros((0, cam_mod.MAX_PARAMS), dt), P)),
        )

        n_l = len(self.lms)
        lms = LandmarkStates(
            x=jnp.zeros((L, 4), dt),  # filled by prepare_landmarks
            x_w=jnp.asarray(_pad(np.stack([l["x_w"] for l in self.lms])
                                 if n_l else np.zeros((0, 4), dt), L)),
            ref_pose=jnp.asarray(_pad(np.array([l["ref_pose"]
                                                for l in self.lms],
                                               np.int32), L)),
            ref_cam=jnp.asarray(_pad(np.array([l["ref_cam"]
                                               for l in self.lms],
                                              np.int32), L)),
            active=jnp.asarray(_pad(np.array([l["active"] for l in self.lms],
                                             bool), L, False)),
            reliable=jnp.asarray(_pad(np.ones(n_l, bool), L, False)),
            z_ref=jnp.asarray(_pad(np.stack(
                [l["z_ref"] if l["z_ref"] is not None else np.zeros(2, dt)
                 for l in self.lms]) if n_l else np.zeros((0, 2), dt), L)),
            has_z_ref=jnp.asarray(_pad(np.array(
                [l["z_ref"] is not None for l in self.lms], bool), L,
                False)),
        )

        if self.cams:
            cam_arrs = self.cams
        else:
            cam_arrs = [(np.zeros(cam_mod.MAX_PARAMS, dt), 0,
                         np.array([1.0, 0, 0, 0], dt), np.zeros(3, dt))]
        rig = Rig(
            params=jnp.asarray(np.stack([c[0] for c in cam_arrs])),
            model=jnp.asarray(np.array([c[1] for c in cam_arrs], np.int32)),
            tvs_q=jnp.asarray(np.stack([c[2] for c in cam_arrs])),
            tvs_t=jnp.asarray(np.stack([c[3] for c in cam_arrs])),
        )

        n_r = len(self.proj)
        proj_pose = _pad(np.array([r["pose"] for r in self.proj], np.int32),
                         Nr)
        proj_lm = _pad(np.array([r["lm"] for r in self.proj], np.int32), Nr)
        proj_valid = _pad(np.ones(n_r, bool), Nr, False)
        lm_ref = np.array([l["ref_pose"] for l in self.lms] + [0],
                          np.int32)
        proj_ref = lm_ref[proj_lm]
        b1_np = _pad(np.array([r["pose1"] for r in self.binary], np.int32),
                     Nb)
        b2_np = _pad(np.array([r["pose2"] for r in self.binary], np.int32),
                     Nb)
        b_valid = _pad(np.ones(len(self.binary), bool), Nb, False)
        i1_np = _pad(np.array([r["pose1"] for r in self.imu], np.int32), Ni)
        i2_np = _pad(np.array([r["pose2"] for r in self.imu], np.int32), Ni)
        i_valid = _pad(np.ones(len(self.imu), bool), Ni, False)
        per_row, pidx = build_structure_index(
            proj_pose, proj_ref, proj_lm, proj_valid,
            b1_np, b2_np, b_valid, i1_np, i2_np, i_valid,
            P, L, pad_multiple)
        proj = ProjResiduals(
            z=jnp.asarray(_pad(np.stack([r["z"] for r in self.proj])
                               if n_r else np.zeros((0, 2), dt), Nr)),
            pose=jnp.asarray(_pad(np.array([r["pose"] for r in self.proj],
                                           np.int32), Nr)),
            lm=jnp.asarray(_pad(np.array([r["lm"] for r in self.proj],
                                         np.int32), Nr)),
            cam=jnp.asarray(_pad(np.array([r["cam"] for r in self.proj],
                                          np.int32), Nr)),
            weight=jnp.asarray(_pad(np.array([r["weight"]
                                              for r in self.proj], dt), Nr)),
            valid=jnp.asarray(proj_valid),
            cond=jnp.asarray(_pad(np.array([r["cond"] for r in self.proj],
                                           bool), Nr, False)),
            pair=jnp.asarray(per_row["pair"]),
            pair_swap=jnp.asarray(per_row["pair_swap"]),
            wb_meas=jnp.asarray(per_row["wb_meas"]),
            wb_ref=jnp.asarray(per_row["wb_ref"]),
        )

        n_u = len(self.unary)
        id_q = np.tile(np.array([1.0, 0, 0, 0], dt), (Nu, 1))
        q_u = np.stack([r["q"] for r in self.unary]) if n_u else \
            np.zeros((0, 4), dt)
        id_q[:n_u] = q_u
        unary = UnaryResiduals(
            pose=jnp.asarray(_pad(np.array([r["pose"] for r in self.unary],
                                           np.int32), Nu)),
            q=jnp.asarray(id_q),
            t=jnp.asarray(_pad(np.stack([r["t"] for r in self.unary])
                               if n_u else np.zeros((0, 3), dt), Nu)),
            cov_inv=jnp.asarray(_pad(np.stack([r["cov_inv"]
                                               for r in self.unary])
                                     if n_u else np.zeros((0, 6, 6), dt),
                                     Nu)),
            valid=jnp.asarray(_pad(np.ones(n_u, bool), Nu, False)),
        )

        n_b = len(self.binary)
        id_qb = np.tile(np.array([1.0, 0, 0, 0], dt), (Nb, 1))
        q_b = np.stack([r["q"] for r in self.binary]) if n_b else \
            np.zeros((0, 4), dt)
        id_qb[:n_b] = q_b
        binary = BinaryResiduals(
            pose1=jnp.asarray(b1_np),
            pose2=jnp.asarray(b2_np),
            q=jnp.asarray(id_qb),
            t=jnp.asarray(_pad(np.stack([r["t"] for r in self.binary])
                               if n_b else np.zeros((0, 3), dt), Nb)),
            cov_inv=jnp.asarray(_pad(np.stack([r["cov_inv"]
                                               for r in self.binary])
                                     if n_b else np.zeros((0, 6, 6), dt),
                                     Nb)),
            valid=jnp.asarray(b_valid),
            pair=jnp.asarray(per_row["bpair"]),
            pair_swap=jnp.asarray(per_row["bswap"]),
        )

        n_i = len(self.imu)
        w_arr = np.zeros((Ni, M, 3), dt)
        a_arr = np.zeros((Ni, M, 3), dt)
        t_arr = np.zeros((Ni, M), dt)
        mv_arr = np.zeros((Ni, M), bool)
        for i, r in enumerate(self.imu):
            k = r["w"].shape[0]
            w_arr[i, :k] = r["w"]
            a_arr[i, :k] = r["a"]
            t_arr[i, :k] = r["time"]
            # pad trailing times with the last time so dt=0 on padded steps
            t_arr[i, k:] = r["time"][-1] if k else 0.0
            mv_arr[i, :k] = True
        imu = ImuResiduals(
            pose1=jnp.asarray(i1_np),
            pose2=jnp.asarray(i2_np),
            w=jnp.asarray(w_arr), a=jnp.asarray(a_arr),
            time=jnp.asarray(t_arr), meas_valid=jnp.asarray(mv_arr),
            weight=jnp.ones(Ni, dt),
            valid=jnp.asarray(i_valid),
            cond=jnp.asarray(_pad(np.array([r["cond"] for r in self.imu],
                                           bool), Ni, False)),
            pair=jnp.asarray(per_row["ipair"]),
            pair_swap=jnp.asarray(per_row["iswap"]),
            c9=jnp.zeros((Ni, 9, 9), dt),
            c9_set=jnp.zeros((), bool),
        )

        g = (np.asarray(self.gravity_vec, dt) if self.gravity_vec is not None
             else np.array([0.0, 0.0, -self.config.gravity], dt))
        marg = empty_marg_prior(P, self.config.pose_dim, poses.t.dtype,
                                enabled=with_marg_prior)
        marg = dataclasses.replace(marg, lin_q=poses.q, lin_t=poses.t,
                                   lin_v=poses.v, lin_b=poses.b)
        return Problem(poses=poses, lms=lms, rig=rig, proj=proj, unary=unary,
                       binary=binary, imu=imu, g_vec=jnp.asarray(g),
                       marg=marg, pidx=pidx)

    # -- gauge fixing / regularization (reference cpp:1252-1330) ---------
    def _build_param_mask(self, P):
        cfg = self.config
        n_p = len(self.poses)
        mask = np.zeros((P, 15), dtype=bool)
        for i, p in enumerate(self.poses):
            if not p["active"]:
                continue
            mask[i, :6] = True
            if cfg.vel_in_state:
                mask[i, 6:9] = True
            if cfg.bias_in_state:
                mask[i, 9:15] = True

        # poses with no inertial residuals: mask velocity/bias
        # (reference cpp:1263-1279)
        has_inertial = np.zeros(n_p, bool)
        for r in self.imu:
            has_inertial[r["pose1"]] = True
            has_inertial[r["pose2"]] = True
        for i in range(n_p):
            if not has_inertial[i]:
                mask[i, 6:15] = False

        # poses with no residuals at all: fully masked (cpp:1252-1258)
        has_any = has_inertial.copy()
        for r in self.proj:
            has_any[r["pose"]] = True
            has_any[self.lms[r["lm"]]["ref_pose"]] = True
        for r in self.unary:
            has_any[r["pose"]] = True
        for r in self.binary:
            has_any[r["pose1"]] = True
            has_any[r["pose2"]] = True
        for i in range(n_p):
            if not has_any[i]:
                mask[i, :] = False

        # manual masks (reference RegularizePose, h:608-631): explicit
        # all-optimized-minus-groups, intersected with the residual-based
        # trimming above
        for pid, sel in self.manual_masks.items():
            if not self.poses[pid]["active"]:
                continue
            if sel["translation"]:
                mask[pid, 0:3] = False
            if sel["rotation"]:
                mask[pid, 3:6] = False
            if sel["gravity"]:
                mask[pid, self._gravity_axis_dim(pid)] = False
            if sel["bias"] and cfg.bias_in_state:
                mask[pid, 9:15] = False

        # auto gauge fixing (cpp:1285-1330): when every pose is active and
        # there is no unary prior, fix the root pose translation (+biases,
        # +rotation — fully if no velocity in state, else only the
        # gravity-aligned axis).  A manual mask on the root pose takes
        # precedence (reference is_param_mask_used, cpp:1285).
        all_active = all(p["active"] for p in self.poses) and n_p > 0
        if (self.config.enable_auto_regularization and all_active
                and not self.unary and 0 not in self.manual_masks):
            root = 0
            mask[root, 0:3] = False
            if cfg.bias_in_state and cfg.regularize_biases_in_batch:
                mask[root, 9:15] = False
            if not cfg.vel_in_state:
                mask[root, 3:6] = False
            else:
                mask[root, self._gravity_axis_dim(root)] = False
        return mask

    def _gravity_axis_dim(self, pose_id: int) -> int:
        """Rotation dim most aligned with gravity
        (GetGravityRegularizationDimension, h:634-652)."""
        q = self.poses[pose_id]["q"]
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]])
        g_body = R.T @ np.array([0.0, 0.0, -1.0])
        return 3 + int(np.argmax(np.abs(g_body)))


# ---------------------------------------------------------------------------
# Landmark world<->sensor conversion (Solve prologue/epilogue, cpp:288-296,
# 672-678)
# ---------------------------------------------------------------------------


def _t_ws(poses: PoseStates, rig: Rig, ref_pose, ref_cam):
    """World-from-sensor transform of each landmark's reference camera."""
    q_wv = poses.q[ref_pose]
    t_wv = poses.t[ref_pose]
    q_vs = rig.tvs_q[ref_cam]
    t_vs = rig.tvs_t[ref_cam]
    return lie.se3_compose((q_wv, t_wv), (q_vs, t_vs))


def prepare_landmarks(problem: Problem, config: BAConfig) -> Problem:
    """x_w -> parameterization `x`.  Inverse-depth mode normalizes the ray to
    unit length so x[3] is the inverse depth (reference cpp:288-296).

    When the reference-view pixel z_ref is known, the ray *direction* comes
    from unprojecting it (measurement-consistent even when intrinsics or
    T_vs are being calibrated); only the depth comes from x_w.
    """
    lms = problem.lms
    if config.lm_size == 1:
        T_ws = _t_ws(problem.poses, problem.rig, lms.ref_pose, lms.ref_cam)
        x_s = lie.se3_transform_homog(lie.se3_inverse(T_ws), lms.x_w)
        norm = jnp.maximum(jnp.linalg.norm(x_s[..., :3], axis=-1,
                                           keepdims=True), 1e-12)
        x_s = x_s / norm
        if config.use_per_pose_cam_params:
            params_l = problem.poses.cam_params[lms.ref_pose]
        else:
            params_l = problem.rig.params[lms.ref_cam]
        model_l = problem.rig.model[lms.ref_cam]
        ray = cam_mod.unproject(params_l, model_l, lms.z_ref)
        x_meas = jnp.concatenate([ray, x_s[..., 3:4]], axis=-1)
        x = jnp.where(lms.has_z_ref[:, None], x_meas, x_s)
    else:
        x = lms.x_w
    return dataclasses.replace(problem,
                               lms=dataclasses.replace(lms, x=x))


def finalize_landmarks(problem: Problem, config: BAConfig) -> Problem:
    """Parameterization `x` -> world x_w (reference cpp:672-678)."""
    lms = problem.lms
    if config.lm_size == 1:
        T_ws = _t_ws(problem.poses, problem.rig, lms.ref_pose, lms.ref_cam)
        x_w = lie.se3_transform_homog(T_ws, lms.x)
        # normalize homogeneous so x_w[3] = 1 where depth is finite
        w = x_w[..., 3:4]
        safe = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
        x_w = jnp.where(jnp.abs(w) < 1e-12, x_w, x_w / safe)
    else:
        x_w = lms.x
    return dataclasses.replace(problem,
                               lms=dataclasses.replace(lms, x_w=x_w))
