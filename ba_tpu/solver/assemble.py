"""Normal-equation assembly + Schur complement, as dense MXU-friendly algebra.

TPU-native replacement for the reference's block-CCS machinery
(`SparseBlockMatrix.h` / `SparseBlockMatrixOps.h`) and the JtJ/Schur phase of
`BundleAdjuster::Solve` (src/BundleAdjuster.cpp:327-644).  Design stance
(SURVEY.md §8): the problem's sparsity is expressed as *batched dense blocks
scattered into dense operators*, not pointer-chased block-compressed storage —

  * the per-residual Jacobian blocks are scatter-placed into a dense
    J (rows, P*6 + K) — projections/priors assemble at pose width 6 and
    pad-expand once (the reference's stride trick, the XLA way);
  * U = J^T J, W = J^T J_l, rhs = J^T r are plain matmuls that XLA tiles
    onto the MXU;
  * V stays block-diagonal as a (L, lm, lm) batch (segment_sum over
    residuals), inverted in one batched closed-form inverse;
  * S = U - W V^-1 W^T is again a dense matmul (the reference's
    `jt_pr_j_l_vi` chain, cpp:448-490).

Each residual family produces an additive `Contribution` to the normal
equations.  Contributions are linear in the residual set, so a device mesh
can compute them on *shards* of the residual tables and `psum` the partials
(ba_tpu.parallel.shard) — the distributed backend the reference lacks
entirely (SURVEY.md §2.4).

The reference's pose-dim "stride trick" (6-dof projection blocks into 15-dof
pose slots, SparseBlockMatrixOps.h:7-38) is simply writing the first 6 columns
of each D-wide pose block.

Masked parameter dims get their Jacobian columns zeroed and S diagonal set to
1e6 (reference cpp:586-598, 1622-1629).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import robust
from ..core.problem import BAConfig, Problem
from ..core.residuals import prior, reprojection
from ..utils.linalg import block_diag_inv


class Contribution(NamedTuple):
    """Additive partial sums of the normal equations from one residual
    family (or one shard of one family)."""

    U: jax.Array          # (N, N)
    rhs_p: jax.Array      # (N,)
    W: jax.Array          # (N, L*lm)
    V: jax.Array          # (L, lm, lm)
    rhs_l: jax.Array      # (L*lm,)
    cost: jax.Array       # scalar


class Assembly(NamedTuple):
    S: jax.Array          # (N, N) reduced camera system (masked diag set)
    rhs_sc: jax.Array     # (N,) Schur-reduced rhs
    U: jax.Array          # (N, N) pose-pose Hessian (pre-mask-diagonal)
    rhs_p: jax.Array      # (N,)
    W: jax.Array          # (N, L*lm) pose-landmark coupling
    V: jax.Array          # (L, lm, lm)
    vinv: jax.Array       # (L, lm, lm)
    rhs_l: jax.Array      # (L*lm,)
    col_mask: jax.Array   # (N,) bool — optimized dims
    cost: jax.Array       # scalar — total weighted squared error
    proj_w: jax.Array     # (Nr,) effective projection weights (base*robust)


def dims(problem: Problem, config: BAConfig):
    D = config.pose_dim
    K = config.calib_dim
    P = problem.poses.q.shape[0]
    L = problem.lms.x.shape[0]
    lm = max(config.lm_size, 1)
    return D, K, P, L, lm, P * D + K


def col_mask(problem: Problem, config: BAConfig, width=None) -> jax.Array:
    """Optimized-dim mask; `width` selects a compact pose width (e.g. 6 for
    the projection/prior compact system)."""
    D = width or config.pose_dim
    pm = problem.poses.mask[:, :D] & problem.poses.active[:, None]
    m = pm.reshape(-1)
    if config.calib_dim:
        cm = jnp.ones((config.calib_dim,), bool)
        if (config.do_tvs and config.tvs_translation_staging
                and not config.tvs_translation_active):
            # staged Tvs: translation tangent dims frozen until the
            # extrinsic stabilizes (reference translation_enabled_,
            # cpp:257-271); se3 tangent order is [t(3), w(3)]
            cm = cm.at[config.tvs_offset: config.tvs_offset + 3].set(False)
        m = jnp.concatenate([m, cm])
    return m


def _scatter_blocks(dst, blocks, row0, col0):
    """dst[(row0_n + i, col0_n + j)] += blocks[n, i, j] — block scatter-add
    with *unique* block positions (collision-free, fast TPU scatter)."""
    br, bc = blocks.shape[-2], blocks.shape[-1]
    r_idx = row0[:, None, None] + jnp.arange(br)[None, :, None]
    c_idx = col0[:, None, None] + jnp.arange(bc)[None, None, :]
    return dst.at[r_idx, c_idx].add(blocks)


# one-hot-matmul segment sum pays off below this segment count: the
# (nseg, n) one-hot runs on the MXU instead of TPU's serialized
# scatter-add (measured 9% whole-iteration win on the flagship), but its
# materialization is O(nseg * n) — past ~512 segments the scatter wins.
_ONEHOT_NSEG_MAX = 512


# per-window one-hot budget for fused fleets: total one-hot bytes
# (nseg * n * 4 / F) must stay under this for the batched-matmul form
_ONEHOT_FLEET_BYTES = 256_000_000


def seg_sum_blocks(vals, ids, nseg, fleet: int = 1):
    """segment_sum of (n, *block) values, flattened to (n, prod(block)).

    Measured on TPU v5e: XLA lowers the 2-D form ~7x faster than the same
    reduction on (n, b1, b2)-shaped operands; small segment counts
    (per-pose / per-landmark sums) go through a one-hot MXU matmul
    instead of the scatter.  Out-of-range ids drop their rows in both
    forms (used for padding).

    `fleet` > 1 (concat_problems layout: rows AND segments split into F
    equal independent windows, every row's segment inside its own window)
    batches the one-hot matmul per window — measured ~2x over the TPU
    scatter for the per-pose/per-landmark sums at fleet sizes where the
    global one-hot would not fit."""
    shape = vals.shape
    n = shape[0]
    v2 = vals.reshape(n, -1)
    if (fleet > 1 and n % fleet == 0 and nseg % fleet == 0
            and nseg // fleet > 0
            and nseg * n * 4 // fleet <= _ONEHOT_FLEET_BYTES):
        F = fleet
        ns_w = nseg // F
        ids_l = ids.reshape(F, n // F) \
            - (jnp.arange(F, dtype=ids.dtype) * ns_w)[:, None]
        oh = (ids_l[:, None, :]
              == jnp.arange(ns_w, dtype=ids.dtype)[None, :, None])
        out = jnp.einsum("fsn,fnb->fsb", oh.astype(v2.dtype),
                         v2.reshape(F, n // F, -1),
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape((nseg,) + shape[1:])
    if nseg <= _ONEHOT_NSEG_MAX:
        oh = ids[None, :] == jnp.arange(nseg, dtype=ids.dtype)[:, None]
        out = jnp.dot(oh.astype(v2.dtype), v2,
                      preferred_element_type=v2.dtype)
    else:
        out = jax.ops.segment_sum(v2, ids, num_segments=nseg)
    return out.reshape((nseg,) + shape[1:])


def band_to_dense(band):
    """(P, B, D, D) block band (band[p, d] = block (p, p+d), d >= 0) ->
    dense symmetric (P*D, P*D), with NO scatter: the band strips are placed
    on the block diagonals by a pad/flatten/reshape trick (each block-row's
    strip lands D*W + D flat elements after the previous one, which is
    exactly a row pad of D), then symmetrized.

    TPU scatters run at ~70M elem/s; this runs at memcpy speed.
    """
    P, B, D, _ = band.shape
    Wd = P * D
    # zero blocks that would wrap past the last pose
    pd = jnp.arange(P)[:, None] + jnp.arange(B)[None, :]
    band = band * (pd < P)[:, :, None, None].astype(band.dtype)

    def strips(b):
        Bb = b.shape[1]
        R = b.transpose(0, 2, 1, 3).reshape(P, D, Bb * D)
        R = jnp.pad(R, ((0, 0), (0, 0), (0, Wd - Bb * D)))
        R = jnp.pad(R.reshape(P, D * Wd), ((0, 0), (0, D)))
        return R.reshape(-1)[: Wd * Wd].reshape(Wd, Wd)

    upper = strips(band)
    # diagonal blocks are symmetric and appear in both `upper` and its
    # transpose -> subtract one copy
    return upper + upper.T - strips(band[:, :1])


def _pair_system(N, P, D, dtype, j1, j2, idx1, idx2, pair, swap, pair_a,
                 pair_b, r, j_cal=None):
    """Dense (U, rhs) of one two-pose residual family from per-residual
    blocks, via collision-free segment_sum + block scatter.

    This replaces the reference's `SparseBlockProduct` JtJ chain
    (SparseBlockMatrixOps.h:183-254, used cpp:327-406) AND the round-1
    dense-scatter-J design: per-residual block outer products are
    segment-summed into the host-enumerated unique pose/pose-pair tables,
    so no (Nr, P*D) Jacobian is ever materialized and the flop count is
    O(Nr * D^2) instead of O(Nr * (P*D)^2).

    j1/j2: (n, rdim, D) weighted blocks wrt pose idx1/idx2; the stored
    pair block is the contribution to U[a, b] (a = min, b = max,
    transposed when `swap`); scattering `block` at (a, b) and `block^T`
    at (b, a) is correct for a == b too (the two cross terms both land on
    the diagonal block).
    """
    ids2 = jnp.concatenate([idx1, idx2])
    jcat = jnp.concatenate([j1, j2], axis=0)
    diag = jax.ops.segment_sum(jnp.einsum("nik,nil->nkl", jcat, jcat),
                               ids2, num_segments=P)
    B = jnp.einsum("nik,nil->nkl", j1, j2)
    B = jnp.where(swap[:, None, None], jnp.swapaxes(B, 1, 2), B)
    Bp = jax.ops.segment_sum(B, pair, num_segments=pair_a.shape[0])

    U = jnp.zeros((N, N), dtype)
    pd = jnp.arange(P, dtype=jnp.int32) * D
    U = _scatter_blocks(U, diag, pd, pd)
    U = _scatter_blocks(U, Bp, pair_a * D, pair_b * D)
    U = _scatter_blocks(U, jnp.swapaxes(Bp, 1, 2), pair_b * D, pair_a * D)

    rcat = jnp.concatenate([r, r], axis=0)
    rhs_pose = jax.ops.segment_sum(jnp.einsum("nik,ni->nk", jcat, rcat),
                                   ids2, num_segments=P)
    rhs = jnp.zeros((N,), dtype).at[: P * D].set(rhs_pose.reshape(-1))

    if j_cal is not None:
        K = j_cal.shape[-1]
        jc2 = jnp.concatenate([j_cal, j_cal], axis=0)
        Uc = jax.ops.segment_sum(jnp.einsum("nik,nil->nkl", jcat, jc2),
                                 ids2, num_segments=P).reshape(P * D, K)
        U = U.at[: P * D, N - K:].add(Uc)
        U = U.at[N - K:, : P * D].add(Uc.T)
        U = U.at[N - K:, N - K:].add(
            jnp.einsum("nik,nil->kl", j_cal, j_cal))
        rhs = rhs.at[N - K:].add(jnp.einsum("nik,ni->k", j_cal, r))
    return U, rhs


def expand_contribution(c: Contribution, P: int, D: int, K: int,
                        D_c: int = 6) -> Contribution:
    """Expand a compact (P*D_c + K)-dim pose system into (P*D + K) dims.

    Projection/prior Jacobians only touch the first 6 of up to 15 pose dims
    (the reference's stride trick, SparseBlockMatrixOps.h:7-38); assembling
    them at width 6 and pad-expanding once cuts the dominant J^T J matmul
    flops by (D/6)^2.
    """
    if D == D_c:
        return c
    n_c = P * D_c

    def expand_rows(M):
        # (P*D_c + K, X) -> (P*D + K, X)
        pose = M[:n_c].reshape(P, D_c, -1)
        pose = jnp.pad(pose, ((0, 0), (0, D - D_c), (0, 0)))
        return jnp.concatenate([pose.reshape(P * D, -1), M[n_c:]], axis=0)

    U = expand_rows(expand_rows(c.U).T).T
    rhs_p = expand_rows(c.rhs_p[:, None])[:, 0]
    W = expand_rows(c.W)
    return c._replace(U=U, rhs_p=rhs_p, W=W)


def _empty_contrib(N, L, lm, dtype) -> Contribution:
    return Contribution(U=jnp.zeros((N, N), dtype),
                        rhs_p=jnp.zeros((N,), dtype),
                        W=jnp.zeros((N, L * lm), dtype),
                        V=jnp.zeros((L, lm, lm), dtype),
                        rhs_l=jnp.zeros((L * lm,), dtype),
                        cost=jnp.zeros((), dtype))


def _add(a: Contribution, b: Contribution) -> Contribution:
    return Contribution(*(x + y for x, y in zip(a, b)))


class ProjBlocks(NamedTuple):
    """Weighted, column-masked per-residual projection blocks — the shared
    input of both the dense assembly and the matrix-free CG operator."""

    j_m: jax.Array       # (Nr, 2, 6)
    j_r: jax.Array       # (Nr, 2, 6)
    j_l: jax.Array       # (Nr, 2, lm)
    j_c: Optional[jax.Array]   # (Nr, 2, K) or None
    r: jax.Array         # (Nr, 2) weighted residuals
    pose: jax.Array      # (Nr,) int32
    ref: jax.Array       # (Nr,) int32
    lm: jax.Array        # (Nr,) int32
    w: jax.Array         # (Nr,) effective weights
    cost: jax.Array      # scalar


def proj_blocks(problem: Problem, config: BAConfig, colm6,
                axis_name=None) -> ProjBlocks:
    """Evaluate + weight + column-mask the projection family."""
    D_full, K, P, L, lm, _ = dims(problem, config)
    D = 6
    dtype = problem.poses.t.dtype

    pe = reprojection.evaluate(problem, config, with_jacobians=True)
    pr = problem.proj
    base_w = jnp.where(pr.valid, pr.weight, 0.0)
    err_sq_w = base_w * pe.err_sq
    if config.use_robust_norm_for_proj_residuals:
        w_rob = robust.huber_weights(err_sq_w, pr.valid, pr.cond,
                                     config.outlier_threshold,
                                     axis_name=axis_name)
    else:
        w_rob = jnp.ones_like(base_w)
    w = base_w * w_rob
    sw = jnp.sqrt(w)[:, None, None]

    # `reliable` is reporting-only, matching the reference: a negative-
    # inverse-depth trial reverts that landmark's delta for that step only
    # (apply_update) and flags it (cpp:127-134); is_reliable gates nothing
    # in BuildProblem (accessor h:590), so the landmark stays optimizable
    # and can recover on later steps.
    lm_ok = problem.lms.active[pr.lm]
    if config.lm_size == 0:
        # pose-graph-only mode: landmark system is a 1-wide dummy block
        j_lm = jnp.zeros((pr.z.shape[0], 2, 1), dtype)
    else:
        j_lm = jnp.where(lm_ok[:, None, None], pe.j_lm, 0.0)

    pose_m = pr.pose.astype(jnp.int32)
    ref_pose = problem.lms.ref_pose[pr.lm].astype(jnp.int32)
    # per-pose column mask (the reference zeroes masked-dim Jacobian
    # columns, cpp:1622-1629); the calib-column mask gates staged-frozen
    # Tvs translation dims (all-ones otherwise) — masking at the source
    # keeps rhs_p zero there too, so the dogleg CAUCHY step cannot move
    # frozen dims (it uses the pre-Schur gradient, not the masked rhs_sc)
    cm_p = colm6[: P * D].reshape(P, D)
    cm_k = colm6[P * D:]
    return ProjBlocks(
        j_m=pe.j_meas * sw * cm_p[pose_m][:, None, :],
        j_r=pe.j_ref * sw * cm_p[ref_pose][:, None, :],
        j_l=j_lm * sw,
        j_c=(pe.j_cal * sw * cm_k[None, None, :]) if K else None,
        r=pe.r * sw[:, :, 0],
        pose=pose_m, ref=ref_pose, lm=pr.lm.astype(jnp.int32),
        w=w, cost=jnp.sum(w * pe.err_sq))


def proj_contribution(problem: Problem, config: BAConfig, colm6,
                      axis_name=None):
    """Projection-family partial sums in the *compact* width-6 pose system
    (expand with `expand_contribution`).  Works identically on a shard of
    the projection table (all other problem fields replicated); pass
    `axis_name` inside shard_map so the robust median is global."""
    D_full, K, P, L, lm, _ = dims(problem, config)
    D = 6
    N = P * D + K
    dtype = problem.poses.t.dtype

    pb = proj_blocks(problem, config, colm6, axis_name)
    pr = problem.proj
    j_m, j_r, j_c, j_lm_w, rw = pb.j_m, pb.j_r, pb.j_c, pb.j_l, pb.r
    pose_m, ref_pose, lm_ids = pb.pose, pb.ref, pb.lm
    w = pb.w

    idx = problem.pidx
    U, rhs_p = _pair_system(N, P, D, dtype, j_m, j_r, pose_m, ref_pose,
                            pr.pair, pr.pair_swap, idx.pair_a, idx.pair_b,
                            rw, j_cal=j_c)

    # landmark system: V blocks + rhs_l by landmark segment_sum; W from
    # the unique (pose, landmark) block table (the reference's
    # jt_pr_j_l_ product, cpp:448-490)
    V = jax.ops.segment_sum(jnp.einsum("nik,nil->nkl", j_lm_w, j_lm_w),
                            lm_ids, num_segments=L)
    rhs_l = jax.ops.segment_sum(jnp.einsum("nil,ni->nl", j_lm_w, rw),
                                lm_ids, num_segments=L).reshape(-1)
    wb_blocks = jnp.concatenate([
        jnp.einsum("nik,nil->nkl", j_m, j_lm_w),
        jnp.einsum("nik,nil->nkl", j_r, j_lm_w)], axis=0)
    wb_ids = jnp.concatenate([pr.wb_meas, pr.wb_ref])
    Wb = jax.ops.segment_sum(wb_blocks, wb_ids,
                             num_segments=idx.wb_pose.shape[0])
    W = jnp.zeros((N, L * lm), dtype)
    W = _scatter_blocks(W, Wb, idx.wb_pose * D, idx.wb_lm * lm)
    if K:
        Wc = jax.ops.segment_sum(jnp.einsum("nik,nil->nkl", j_c, j_lm_w),
                                 lm_ids, num_segments=L)       # (L, K, lm)
        W = W.at[N - K:, :].add(
            jnp.transpose(Wc, (1, 0, 2)).reshape(K, L * lm))

    contrib = Contribution(U=U, rhs_p=rhs_p, W=W, V=V, rhs_l=rhs_l,
                           cost=pb.cost)
    return contrib, w


def prior_contribution(problem: Problem, config: BAConfig, colm6):
    """Unary + binary pose-graph partial sums (compact width-6 system)."""
    D_full, K, P, L, lm, _ = dims(problem, config)
    D = 6
    N = P * D + K
    dtype = problem.poses.t.dtype
    out = _empty_contrib(N, L, lm, dtype)
    cm_p = colm6[: P * D].reshape(P, D)
    pd = jnp.arange(P, dtype=jnp.int32) * D

    ue = prior.evaluate_unary(problem, config, with_jacobians=True)
    up = problem.unary.pose.astype(jnp.int32)
    ju = ue.j1 * cm_p[up][:, None, :]
    Ud = jax.ops.segment_sum(jnp.einsum("nik,nil->nkl", ju, ju), up,
                             num_segments=P)
    U = _scatter_blocks(out.U, Ud, pd, pd)
    rhs_u = jax.ops.segment_sum(jnp.einsum("nik,ni->nk", ju, ue.r), up,
                                num_segments=P)
    rhs = out.rhs_p.at[: P * D].add(rhs_u.reshape(-1))
    out = out._replace(U=U, rhs_p=rhs, cost=out.cost + jnp.sum(ue.err_sq))

    be = prior.evaluate_binary(problem, config, with_jacobians=True)
    bn = problem.binary
    b1 = bn.pose1.astype(jnp.int32)
    b2 = bn.pose2.astype(jnp.int32)
    jb1 = be.j1 * cm_p[b1][:, None, :]
    jb2 = be.j2 * cm_p[b2][:, None, :]
    Ub, rhs_b = _pair_system(N, P, D, dtype, jb1, jb2, b1, b2, bn.pair,
                             bn.pair_swap, problem.pidx.bpair_a,
                             problem.pidx.bpair_b, be.r)
    return out._replace(U=out.U + Ub, rhs_p=out.rhs_p + rhs_b,
                        cost=out.cost + jnp.sum(be.err_sq))


def imu_contribution(problem: Problem, config: BAConfig, colm, imu_eval):
    D, K, P, L, lm, N = dims(problem, config)
    dtype = problem.poses.t.dtype
    out = _empty_contrib(N, L, lm, dtype)
    ie = imu_eval
    im = problem.imu
    cm_p = colm[: P * D].reshape(P, D)
    i1 = im.pose1.astype(jnp.int32)
    i2 = im.pose2.astype(jnp.int32)
    j1 = ie.j1 * cm_p[i1][:, None, :]
    j2 = ie.j2 * cm_p[i2][:, None, :]
    Ui, rhs_i = _pair_system(N, P, D, dtype, j1, j2, i1, i2, im.pair,
                             im.pair_swap, problem.pidx.ipair_a,
                             problem.pidx.ipair_b, ie.r)
    return out._replace(U=out.U + Ui, rhs_p=out.rhs_p + rhs_i,
                        cost=out.cost + jnp.sum(ie.err_sq))


def finish(contrib: Contribution, cmask, proj_w) -> Assembly:
    """Schur-complement the landmark blocks and apply the dim mask."""
    N = contrib.U.shape[0]
    L, lm, _ = contrib.V.shape
    dtype = contrib.U.dtype

    vinv = block_diag_inv(contrib.V)
    W3 = contrib.W.reshape(N, L, lm)
    WVi = jnp.einsum("nlk,lkj->nlj", W3, vinv).reshape(N, L * lm)
    S = contrib.U - WVi @ contrib.W.T
    rhs_sc = contrib.rhs_p - WVi @ contrib.rhs_l

    S = S + jnp.diag(jnp.where(cmask, 0.0, 1e6).astype(dtype))
    rhs_sc = jnp.where(cmask, rhs_sc, 0.0)

    return Assembly(S=S, rhs_sc=rhs_sc, U=contrib.U, rhs_p=contrib.rhs_p,
                    W=contrib.W, V=contrib.V, vinv=vinv,
                    rhs_l=contrib.rhs_l, col_mask=cmask, cost=contrib.cost,
                    proj_w=proj_w)




# ---------------------------------------------------------------------------
# Marginalization prior (sliding window) — see solver/window.py for the
# marginalization step itself.
# ---------------------------------------------------------------------------

from ..core import lie as _lie


def pose_tangent(poses, marg, pose_dim: int):
    """delta = x (-) lin, right tangent, flattened (P*pose_dim,)."""
    dt = poses.t - marg.lin_t
    dw = _lie.so3_log(_lie.quat_mul(_lie.quat_conj(marg.lin_q), poses.q))
    parts = [dt, dw]
    if pose_dim >= 9:
        parts.append(poses.v - marg.lin_v)
    if pose_dim >= 15:
        parts.append(poses.b - marg.lin_b)
    return jnp.concatenate(parts, axis=-1).reshape(-1)


def marg_contribution(problem: Problem, config: BAConfig, colm):
    """Additive Contribution of the marginalization prior (zero when
    inactive): U += H, rhs += H delta + g, cost += d^T H d + 2 g^T d."""
    D, K, P, L, lm, N = dims(problem, config)
    dtype = problem.poses.t.dtype
    out = _empty_contrib(N, L, lm, dtype)
    m = problem.marg
    n = P * D
    if m.H.shape[0] != n:       # prior disabled at build time (static gate)
        return out
    on = m.active.astype(dtype)
    delta = pose_tangent(problem.poses, m, D)
    H = m.H * on
    grad = H @ delta + m.g * on
    U = out.U.at[:n, :n].add(H * colm[:n, None] * colm[None, :n])
    rhs = out.rhs_p.at[:n].add(grad * colm[:n])
    cost = delta @ H @ delta + 2.0 * (m.g * on) @ delta
    return out._replace(U=U, rhs_p=rhs, cost=cost)


def marg_cost(problem: Problem, config: BAConfig):
    m = problem.marg
    dtype = problem.poses.t.dtype
    P = problem.poses.q.shape[0]
    if m.H.shape[0] != P * config.pose_dim:
        return jnp.zeros((), dtype)
    on = m.active.astype(dtype)
    delta = pose_tangent(problem.poses, m, config.pose_dim)
    return on * (delta @ m.H @ delta + 2.0 * m.g @ delta)


def band_width_of(problem: Problem) -> int:
    """Host-side: block half-bandwidth + 1 of the *Schur-reduced* pose
    Hessian, from the precomputed unique-pair tables — the max over
    two-pose residual spans AND landmark co-observation spans (the Schur
    correction W V^-1 W^T couples every pair of poses seeing the same
    landmark).  Pass the result as `BAConfig.band_width` to enable the
    banded assembly / banded solve fast paths."""
    import numpy as np

    idx = problem.pidx
    b = 0
    for a_t, b_t in ((idx.pair_a, idx.pair_b), (idx.bpair_a, idx.bpair_b),
                     (idx.ipair_a, idx.ipair_b)):
        d = np.asarray(b_t) - np.asarray(a_t)
        if d.size:
            b = max(b, int(d.max()))
    # co-observation span per landmark (padding rows carry the
    # out-of-range landmark id n_lms — they only add a harmless extra
    # zero-span entry at index n_lms)
    wp = np.asarray(idx.wb_pose, np.int64)
    wl = np.asarray(idx.wb_lm, np.int64)
    if wp.size:
        n_lm = int(wl.max()) + 1
        mx = np.full(n_lm, -1, np.int64)
        mn = np.full(n_lm, np.iinfo(np.int64).max, np.int64)
        np.maximum.at(mx, wl, wp)
        np.minimum.at(mn, wl, wp)
        span = mx - mn
        b = max(b, int(span[mx >= 0].max(initial=0)))
    return b + 1


def _band_pair_blocks(j1, j2, idx1, idx2, B):
    """Cross-term blocks + band-grid ids for one two-pose family.

    Returns (blocks (2n, d, d), ids (2n,)): the (a, b) block oriented
    a->b at segment a*B + (b-a), plus its transpose masked to the
    same-pose (d == 0) case (where both cross terms land on the diagonal
    block — the dense path's `_pair_system` invariant)."""
    a = jnp.minimum(idx1, idx2)
    d = jnp.abs(idx1 - idx2)
    blk = jnp.einsum("nik,nil->nkl", j1, j2)
    blk = jnp.where((idx1 > idx2)[:, None, None],
                    jnp.swapaxes(blk, 1, 2), blk)
    blk_t = jnp.swapaxes(blk, 1, 2) * (d == 0)[:, None, None]
    ids = a * B + jnp.minimum(d, B - 1)
    return (jnp.concatenate([blk, blk_t], axis=0),
            jnp.concatenate([ids, ids]))


def assemble(problem: Problem, config: BAConfig, imu_eval=None) -> Assembly:
    """Build the (Schur-reduced) normal equations at the current state.

    `imu_eval` is an optional precomputed ImuEval (ba_tpu.core.residuals.imu)
    so the IMU preintegration scan is shared with cost evaluation.

    When `config.band_width > 0` (and there is no calibration block) U is
    assembled on a banded block grid and densified without any scatter —
    the fast path for long trajectories.  A marginalization prior (dense,
    pose-dims only) is added after densification.
    """
    D, K, P, L, lm, N = dims(problem, config)
    cmask = col_mask(problem, config)
    colm = cmask.astype(problem.poses.t.dtype)
    colm6 = col_mask(problem, config, 6).astype(problem.poses.t.dtype)
    if config.band_width and config.band_width <= P and K == 0:
        return _assemble_banded(problem, config, imu_eval, cmask, colm,
                                colm6)
    comp, w = proj_contribution(problem, config, colm6)
    comp = _add(comp, prior_contribution(problem, config, colm6))
    contrib = expand_contribution(comp, P, D, K)
    if imu_eval is not None:
        contrib = _add(contrib,
                       imu_contribution(problem, config, colm, imu_eval))
    contrib = _add(contrib, marg_contribution(problem, config, colm))
    return finish(contrib, cmask, w)


def _assemble_banded(problem: Problem, config: BAConfig, imu_eval, cmask,
                     colm, colm6) -> Assembly:
    """Banded-grid assembly: same Assembly output as the general path,
    built without per-family dense scatters/adds."""
    D, K, P, L, lm, N = dims(problem, config)
    dtype = problem.poses.t.dtype
    pb = proj_blocks(problem, config, colm6)
    cm_p = colm6[: P * 6].reshape(P, 6)

    ue = prior.evaluate_unary(problem, config, with_jacobians=True)
    u_pose = problem.unary.pose.astype(jnp.int32)
    ju = ue.j1 * cm_p[u_pose][:, None, :]
    be = prior.evaluate_binary(problem, config, with_jacobians=True)
    b1 = problem.binary.pose1.astype(jnp.int32)
    b2 = problem.binary.pose2.astype(jnp.int32)
    jb1 = be.j1 * cm_p[b1][:, None, :]
    jb2 = be.j2 * cm_p[b2][:, None, :]

    B = config.band_width

    self6 = jnp.concatenate([
        jnp.einsum("nik,nil->nkl", pb.j_m, pb.j_m),
        jnp.einsum("nik,nil->nkl", pb.j_r, pb.j_r),
        jnp.einsum("nik,nil->nkl", ju, ju),
        jnp.einsum("nik,nil->nkl", jb1, jb1),
        jnp.einsum("nik,nil->nkl", jb2, jb2)], axis=0)
    self_ids = jnp.concatenate([pb.pose, pb.ref, u_pose, b1, b2]) * B
    cross_p, ids_p = _band_pair_blocks(pb.j_m, pb.j_r, pb.pose, pb.ref, B)
    cross_b, ids_b = _band_pair_blocks(jb1, jb2, b1, b2, B)
    grid6 = seg_sum_blocks(
        jnp.concatenate([self6, cross_p, cross_b], axis=0),
        jnp.concatenate([self_ids, ids_p, ids_b]), P * B)
    grid = jnp.zeros((P * B, D, D), dtype).at[:, :6, :6].add(grid6)

    rhs6 = seg_sum_blocks(
        jnp.concatenate([jnp.einsum("nik,ni->nk", pb.j_m, pb.r),
                         jnp.einsum("nik,ni->nk", pb.j_r, pb.r),
                         jnp.einsum("nik,ni->nk", ju, ue.r),
                         jnp.einsum("nik,ni->nk", jb1, be.r),
                         jnp.einsum("nik,ni->nk", jb2, be.r)], axis=0),
        jnp.concatenate([pb.pose, pb.ref, u_pose, b1, b2]), P)
    rhs = jnp.zeros((P, D), dtype).at[:, :6].add(rhs6)
    cost = pb.cost + jnp.sum(ue.err_sq) + jnp.sum(be.err_sq)

    if imu_eval is not None:
        i1 = problem.imu.pose1.astype(jnp.int32)
        i2 = problem.imu.pose2.astype(jnp.int32)
        cm_pD = colm[: P * D].reshape(P, D)
        ji1 = imu_eval.j1 * cm_pD[i1][:, None, :]
        ji2 = imu_eval.j2 * cm_pD[i2][:, None, :]
        selfD = jnp.concatenate([
            jnp.einsum("nik,nil->nkl", ji1, ji1),
            jnp.einsum("nik,nil->nkl", ji2, ji2)], axis=0)
        crossD, idsD = _band_pair_blocks(ji1, ji2, i1, i2, B)
        grid = grid + seg_sum_blocks(
            jnp.concatenate([selfD, crossD], axis=0),
            jnp.concatenate([jnp.concatenate([i1, i2]) * B, idsD]), P * B)
        rhs = rhs + seg_sum_blocks(
            jnp.concatenate([jnp.einsum("nik,ni->nk", ji1, imu_eval.r),
                             jnp.einsum("nik,ni->nk", ji2, imu_eval.r)],
                            axis=0),
            jnp.concatenate([i1, i2]), P)
        cost = cost + jnp.sum(imu_eval.err_sq)

    U = band_to_dense(grid.reshape(P, B, D, D))
    rhs_p = rhs.reshape(-1)

    # landmark system + dense W (single block scatter)
    lm_ids = pb.lm
    j_lm_w = pb.j_l
    V = seg_sum_blocks(jnp.einsum("nik,nil->nkl", j_lm_w, j_lm_w),
                       lm_ids, L)
    rhs_l = seg_sum_blocks(jnp.einsum("nil,ni->nl", j_lm_w, pb.r),
                           lm_ids, L).reshape(-1)
    wb_blocks = jnp.concatenate([
        jnp.einsum("nik,nil->nkl", pb.j_m, j_lm_w),
        jnp.einsum("nik,nil->nkl", pb.j_r, j_lm_w)], axis=0)
    wb_ids = jnp.concatenate([problem.proj.wb_meas, problem.proj.wb_ref])
    idx = problem.pidx
    Wb = seg_sum_blocks(wb_blocks, wb_ids, idx.wb_pose.shape[0])
    W = jnp.zeros((N, L * lm), dtype)
    W = _scatter_blocks(W, Wb, idx.wb_pose * D, idx.wb_lm * lm)

    contrib = Contribution(U=U, rhs_p=rhs_p, W=W, V=V, rhs_l=rhs_l,
                           cost=cost)
    # marginalization prior: dense over pose dims only — added onto the
    # densified U (it has no band structure, but U is dense from here on)
    contrib = _add(contrib, marg_contribution(problem, config, colm))
    return finish(contrib, cmask, pb.w)


def evaluate_cost(problem: Problem, config: BAConfig, imu_eval=None,
                  proj_w=None):
    """Total weighted squared error without Jacobians (the reference's
    EvaluateResiduals, cpp:144-236).

    `proj_w` carries the robust weights frozen at BuildProblem time so a
    trust-region trial compares like against like (the reference evaluates
    trial costs with the weights set during the last build).
    """
    pe = reprojection.evaluate(problem, config, with_jacobians=False)
    pr = problem.proj
    if proj_w is None:
        proj_w = jnp.where(pr.valid, pr.weight, 0.0)
    cost = jnp.sum(proj_w * pe.err_sq)
    ue = prior.evaluate_unary(problem, config, with_jacobians=False)
    cost = cost + jnp.sum(ue.err_sq)
    be = prior.evaluate_binary(problem, config, with_jacobians=False)
    cost = cost + jnp.sum(be.err_sq)
    if imu_eval is not None:
        cost = cost + jnp.sum(imu_eval.err_sq)
    cost = cost + marg_cost(problem, config)
    return cost
