"""Banded direct solve of the Schur-reduced camera system.

The scalable TPU counterpart of the reference's sparse reduced solve
(`use_sparse_solver` -> Eigen `SimplicialLDLT`,
/root/reference/src/BundleAdjuster.cpp:752-826), exploiting the structure a
general sparse factorization only rediscovers: along a trajectory the
reduced Hessian S = U - W V^-1 W^T is a *block band* — two-pose residuals
couple nearby poses, and the Schur correction couples poses that co-observe
a landmark, a span bounded by visibility (`band_width_of`).

Pipeline (never materializes a dense S or W):

  1. U is segment-summed onto a (P, B) block band grid (same formulation
     as `assemble._assemble_banded`).
  2. The Schur correction is segment-summed onto the SAME grid from the
     host-enumerated per-landmark W-block pair table (`ProblemIndex.sp_*`):
     each pair (i, j) of W blocks of one landmark contributes
     -Wb_i V^-1 Wb_j^T at pose-pair (pose_i, pose_j).
  3. The band is Jacobi-scaled (same scaling as `linear.solve_reduced` —
     essential in f32, the entries span pixel^2..IMU-mahalanobis units)
     and factorized by a CHUNKED BLOCK-TRIDIAGONAL Cholesky: chunks of
     `chunk >= B` poses make the band system block-tridiagonal in chunks,
     so the factorization is a `lax.scan` over ~P/B steps whose per-step
     work is dense (chunk*D)^2 MXU ops — O(P) time and memory in the
     window length (the dense path is O(P^3) / O(P^2)).
  4. One step of iterative refinement through a banded matvec, then
     matrix-free landmark back-substitution (shared with solver/cg.py).

Memory: O(P * B * D^2) for the band + O(n_chunks * (chunk*D)^2) for the
factors.  Flops: O(P * B^2 * D^3) — linear in the trajectory length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..core.problem import BAConfig, Problem
from . import cg as cg_mod
from .linear import GnStep


def _band_self_cross(P, B, D, dtype, pb, ju, u_pose, jb1, jb2, b1, b2,
                     ji1, ji2, i1, i2, extra6=None, extra6_ids=None):
    """U on the (P*B,) band grid from weighted family blocks (band[p, d] =
    U[p, p+d] block, d >= 0).

    `extra6`/`extra6_ids` are additional pre-formed (n, 6, 6) blocks merged
    into the SAME segment sum (one scatter instead of two — the Schur
    correction rides along in band_S)."""
    from .assemble import _band_pair_blocks, seg_sum_blocks

    self6 = jnp.concatenate([
        jnp.einsum("nik,nil->nkl", pb.j_m, pb.j_m),
        jnp.einsum("nik,nil->nkl", pb.j_r, pb.j_r),
        jnp.einsum("nik,nil->nkl", ju, ju),
        jnp.einsum("nik,nil->nkl", jb1, jb1),
        jnp.einsum("nik,nil->nkl", jb2, jb2)], axis=0)
    self_ids = jnp.concatenate([pb.pose, pb.ref, u_pose, b1, b2]) * B
    cross_p, ids_p = _band_pair_blocks(pb.j_m, pb.j_r, pb.pose, pb.ref, B)
    cross_b, ids_b = _band_pair_blocks(jb1, jb2, b1, b2, B)
    rows = [self6, cross_p, cross_b]
    ids = [self_ids, ids_p, ids_b]
    if extra6 is not None:
        rows.append(extra6)
        ids.append(extra6_ids)
    grid6 = seg_sum_blocks(jnp.concatenate(rows, axis=0),
                           jnp.concatenate(ids), P * B)
    grid = jnp.zeros((P * B, D, D), dtype).at[:, :6, :6].add(grid6)

    if ji1 is not None:
        selfD = jnp.concatenate([
            jnp.einsum("nik,nil->nkl", ji1, ji1),
            jnp.einsum("nik,nil->nkl", ji2, ji2)], axis=0)
        crossD, idsD = _band_pair_blocks(ji1, ji2, i1, i2, B)
        grid = grid + seg_sum_blocks(
            jnp.concatenate([selfD, crossD], axis=0),
            jnp.concatenate([jnp.concatenate([i1, i2]) * B, idsD]), P * B)
    return grid


# Switch the banded Schur correction from the per-pair scatter to the
# grouped per-landmark formulation past this many pair-table rows: the
# sp-pair scatter-add moves O(sum_l n_l^2) 6x6 blocks through TPU's
# serialized scatter (profiled 2026-08-20 at P=2048/L=8192: 2.8M pairs,
# ~92 ms of a 165 ms iteration in sp gathers + sort + scatter), while the
# grouped form is three batched einsums + ONE L-row scatter.  Below the
# threshold the pair path wins (no (L, B, B, 6, 6) materialization).
_GROUPED_SP_MIN = 200_000
# ... but never materialize more than this many bytes of per-landmark
# pair blocks (L * B^2 * 36 * 4)
_GROUPED_C_BYTES_MAX = 4_000_000_000


def _band_schur_grouped(idx, Wb, vinv, P: int, B: int, dtype):
    """Banded Schur correction WITHOUT the per-pair table: every landmark's
    observing poses span < B (the band contract), so its W blocks fit a
    LOCAL (B, 6, lm) strip anchored at its first observing pose.  The
    full per-landmark pair products are then one batched MXU einsum
    (L, B, B, 6, 6), summed onto a per-anchor grid by an L-row
    segment_sum, and folded onto the band by B static shifted adds —
    replacing the O(sum_l n_l^2) serialized scatter-add of the sp-pair
    formulation with pure batched matmul + one small scatter.

    Returns corr (P, B, 6, 6): corr[a, d] = sum over landmarks of
    Wb_{a,l} V_l^-1 Wb_{a+d,l}^T (the quantity band_S subtracts).
    """
    L, lm, _ = vinv.shape
    wl = idx.wb_lm                       # padding rows carry wl == L
    wp = idx.wb_pose
    # first observing pose per landmark; padding rows (wl == L) are
    # dropped by the out-of-range segment id
    big = jnp.iinfo(jnp.int32).max
    first = jax.ops.segment_min(wp, wl, num_segments=L)
    first_safe = jnp.where(first == big, 0, first)
    i_loc = wp - first_safe[jnp.clip(wl, 0, L - 1)]
    ok_row = (wl < L) & (i_loc >= 0) & (i_loc < B)
    seg = jnp.where(ok_row, wl * B + jnp.clip(i_loc, 0, B - 1), L * B)
    from .assemble import seg_sum_blocks

    Wl = seg_sum_blocks(Wb, seg, L * B).reshape(L, B, 6, lm)
    WlVi = jnp.einsum("lbik,lkm->lbim", Wl, vinv)
    C = jnp.einsum("lbim,lcjm->lbcij", WlVi, Wl)     # (L, B, B, 6, 6)
    G = jax.ops.segment_sum(C.reshape(L, -1),
                            jnp.clip(first_safe, 0, P - 1),
                            num_segments=P).reshape(P, B, B, 6, 6)
    # corr[a, d] = sum_i G[a - i, i, i + d]  (upper triangle j = i + d)
    corr = jnp.zeros((P, B, 6, 6), dtype)
    for i in range(B):
        Gi = G[: P - i, i, i:]                       # (P - i, B - i, 6, 6)
        corr = corr.at[i:, : B - i].add(Gi)
    return corr


def band_S(problem: Problem, config: BAConfig, bs: cg_mod.BlockSystem,
           P: int, D: int, lm_offset=None,
           add_identity: bool = True) -> jax.Array:
    """Schur-reduced band (P, B, D, D): band[p, d] = S[p, p+d] (d >= 0,
    diagonal blocks full/symmetric), with masked dims as identity rows.

    `config.band_width` MUST come from `band_width_of` (which bounds both
    residual spans and landmark co-observation spans) — out-of-band
    contributions are an indexing-contract violation, not clipped.

    Inside shard_map (landmark-sharded layout, `parallel.shard`): pass
    `lm_offset` = the shard's landmark-chunk start and
    `add_identity=False`.  Every term is a sum over shard-local residual
    rows / owned landmarks (non-owned W blocks segment-sum to zero, so
    their pair contributions vanish), so the per-shard bands psum to the
    global band; the caller adds the masked-dim identity ONCE after the
    psum (`band_add_identity`).
    """
    from .assemble import seg_sum_blocks

    B = config.band_width
    dtype = bs.rhs_sc.dtype

    # Schur correction on the band: for each per-landmark W-block pair
    # (i, j) with a = pose_i <= b = pose_j, subtract Wb_i V^-1 Wb_j^T at
    # band segment (a, b - a).  i == j covers the diagonal block once.
    # The negated blocks merge into the SAME segment sum as the residual
    # families (one scatter total, not two).
    idx = problem.pidx
    pj = bs.pj
    wb_blocks = jnp.concatenate([
        jnp.einsum("nik,nil->nkl", pj.j_m, pj.j_l),
        jnp.einsum("nik,nil->nkl", pj.j_r, pj.j_l)], axis=0)
    wb_ids = jnp.concatenate([problem.proj.wb_meas, problem.proj.wb_ref])
    Wb = seg_sum_blocks(wb_blocks, wb_ids, idx.wb_pose.shape[0])

    lm = bs.vinv.shape[1]
    grouped = (lm_offset is None
               and idx.sp_i.shape[0] >= _GROUPED_SP_MIN
               and (bs.vinv.shape[0] * B * B * 36
                    * jnp.dtype(dtype).itemsize) <= _GROUPED_C_BYTES_MAX)
    if grouped:
        corr_g = _band_schur_grouped(idx, Wb, bs.vinv, P, B, dtype)
        grid = _band_self_cross(P, B, D, dtype, bs.pj, bs.ju, bs.u_pose,
                                bs.jb1, bs.jb2, bs.b1, bs.b2, bs.ji1,
                                bs.ji2, bs.i1, bs.i2)
        band = grid.reshape(P, B, D, D)
        band = band.at[:, :, :6, :6].add(-corr_g)
        pd = jnp.arange(P)[:, None] + jnp.arange(B)[None, :]
        band = band * (pd < P)[:, :, None, None].astype(dtype)
        if add_identity:
            band = band_add_identity(band, bs.col_mask, P, D)
        return band

    wb_lm = idx.wb_lm
    if lm_offset is not None:
        # localize to the shard's vinv chunk; non-owned rows have Wb == 0
        # so the gathered (wrong) inverse is annihilated
        wb_lm = jnp.clip(wb_lm - lm_offset, 0, bs.vinv.shape[0] - 1)
    WbVi = jnp.einsum("nkl,nlm->nkm", Wb, bs.vinv[jnp.clip(
        wb_lm, 0, bs.vinv.shape[0] - 1)])

    a = idx.wb_pose[idx.sp_i]
    d = idx.wb_pose[idx.sp_j] - a
    corr = jnp.einsum("nkl,nql->nkq", WbVi[idx.sp_i], Wb[idx.sp_j])
    corr = corr * idx.sp_valid[:, None, None].astype(dtype)
    seg = jnp.where(idx.sp_valid & (d < B), a * B + d, P * B)  # drop pad

    grid = _band_self_cross(P, B, D, dtype, bs.pj, bs.ju, bs.u_pose,
                            bs.jb1, bs.jb2, bs.b1, bs.b2, bs.ji1, bs.ji2,
                            bs.i1, bs.i2, extra6=-corr, extra6_ids=seg)

    band = grid.reshape(P, B, D, D)
    # zero blocks that would wrap past the last pose
    pd = jnp.arange(P)[:, None] + jnp.arange(B)[None, :]
    band = band * (pd < P)[:, :, None, None].astype(dtype)

    if add_identity:
        band = band_add_identity(band, bs.col_mask, P, D)
    return band


def band_add_identity(band, col_mask, P, D):
    """Masked dims -> identity rows/cols (Jacobian columns are already
    zeroed; the dense path's 1e6 diagonal collapses to identity in the
    masked subspace).  Split out of `band_S` so the sharded path can add
    it once AFTER the psum of per-shard partial bands."""
    dtype = band.dtype
    mD = col_mask[: P * D].reshape(P, D).astype(dtype)
    return band.at[:, 0].add(
        jnp.eye(D, dtype=dtype)[None] * (1.0 - mD)[:, :, None])


def band_matvec(band, x):
    """y = S x for the symmetric band representation; x (P*D,)."""
    P, B, D, _ = band.shape
    X = x.reshape(P, D)
    up = jnp.arange(P)[:, None] + jnp.arange(B)[None, :]
    Xu = X[jnp.clip(up, 0, P - 1)] * (up < P)[:, :, None].astype(x.dtype)
    y = jnp.einsum("pbij,pbj->pi", band, Xu)
    # strictly-lower part: y_q += band[q-d, d]^T x_{q-d}, d >= 1
    lo = jnp.arange(P)[:, None] - jnp.arange(1, B)[None, :]
    lo_c = jnp.clip(lo, 0, P - 1)
    bg = band[lo_c, jnp.arange(1, B)[None, :]]
    Xl = X[lo_c] * (lo >= 0)[:, :, None].astype(x.dtype)
    y = y + jnp.einsum("pbij,pbi->pj", bg, Xl)
    return y.reshape(-1)


def _chunk_windows(band, chunk):
    """(n_c, chunk*D, 2*chunk*D) dense windows: rows = the chunk's poses,
    cols = this chunk + the next (scatter-free pad/flatten placement, same
    trick as assemble.band_to_dense)."""
    P, B, D, _ = band.shape
    n_c = P // chunk
    n = chunk * D
    W2 = 2 * n

    def window(ch):                     # (chunk, Bb, D, D) -> (n, W2)
        Bb = ch.shape[1]
        R = ch.transpose(0, 2, 1, 3).reshape(chunk, D, Bb * D)
        R = jnp.pad(R, ((0, 0), (0, 0), (0, W2 - Bb * D)))
        R = jnp.pad(R.reshape(chunk, D * W2), ((0, 0), (0, D)))
        return R.reshape(-1)[: n * W2].reshape(n, W2)

    chunks = band.reshape(n_c, chunk, B, D, D)
    win = jax.vmap(window)(chunks)                      # (n_c, n, W2)
    diag_once = jax.vmap(window)(chunks[:, :, :1])[:, :, :n]
    upper = win[:, :, :n]
    Dg = upper + jnp.swapaxes(upper, 1, 2) - diag_once  # (n_c, n, n)
    Eg = win[:, :, n:]                                  # coupling to next
    return Dg, Eg


def _factor(Dg, Eg):
    """Block-tridiagonal Cholesky: S = L L^T with L block lower-bidiagonal
    (diag C_i, subdiag M_i).  Returns (C, M, ok)."""
    n = Dg.shape[1]
    dtype = Dg.dtype
    C0 = jnp.eye(n, dtype=dtype)
    E0 = jnp.zeros((n, n), dtype)

    def step(carry, inp):
        C_prev, E_prev = carry
        D_i, E_i = inp
        X = solve_triangular(C_prev, E_prev, lower=True)   # C^-1 E
        # the sequential chunk Schur complements are where the f32
        # factorization loses digits — pay for an exact-f32 product here
        # (one (n, n) matmul per chunk; the factor quality sets how many
        # PCG wrap iterations the solve needs)
        XtX = jax.lax.dot_general(X, X, (((0,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST)
        C_i = jnp.linalg.cholesky(D_i - XtX)
        return (C_i, E_i), (C_i, X.T)

    (_, _), (C, M) = jax.lax.scan(step, (C0, E0), (Dg, Eg))
    ok = jnp.all(jnp.isfinite(C))
    return C, M, ok


def _cho_solve_b(c, b):
    """Batched SPD solve from batched lower-Cholesky factors c (..., n, n)
    against b (..., n) or (..., n, k)."""
    vec = b.ndim == c.ndim - 1
    if vec:
        b = b[..., None]
    y = solve_triangular(c, b, lower=True)
    x = solve_triangular(c, y, lower=True, trans=1)
    return x[..., 0] if vec else x


def _bcr_factor(Dg, Eg):
    """Block CYCLIC REDUCTION factorization of the SPD block-tridiagonal
    chunk system — the log-depth, fully batched alternative to the
    sequential `_factor` scan.

    The scan's recurrence runs n_c dependent steps of tiny (n, n) dense
    ops; on TPU each step is launch/latency-bound, so long windows pay
    O(n_c) in *latency*, not flops.  Cyclic reduction eliminates all odd
    chunks at once per level (one batched Cholesky + a few batched
    matmuls over n_c/2 blocks), halving the system log2(n_c) times:
    ~7 batched levels replace 128 sequential steps at P=2048.  Standard
    BCR for the system  E_{i-1}^T x_{i-1} + D_i x_i + E_i x_{i+1} = b_i:
    per level, for kept (even) blocks
        D'_k = D_2k - B_{k-1}^T Dodd_{k-1}^{-1} B_{k-1}
                    - A_k Dodd_k^{-1} A_k^T
        E'_k = -A_k Dodd_k^{-1} B_k
    with A_k = E_{2k}, B_k = E_{2k+1}, Dodd_k = D_{2k+1}.

    Returns (levels, ok): levels = [(chol(Dodd), A, B), ...] outer-to-
    inner plus the base-case Cholesky last; `ok` is the all-levels-finite
    flag (same contract as `_factor`).  Exact in exact arithmetic (it is
    block Gaussian elimination in odd-even order); used — like the scan
    factor — as the preconditioner of the short PCG wrap in f32.
    """
    m, n, _ = Dg.shape
    dtype = Dg.dtype
    M2 = 1 << max(m - 1, 0).bit_length()          # next power of two
    if M2 > m:
        pad = M2 - m
        Dg = jnp.concatenate(
            [Dg, jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))])
        Eg = jnp.concatenate([Eg, jnp.zeros((pad, n, n), dtype)])
        m = M2
    levels = []
    ok = jnp.asarray(True)
    D, E = Dg, Eg
    # The level-wise Schur products are where the f32 factorization loses
    # digits (same reasoning as _factor's XtX, which the default-on BCR
    # path replaces): pay for exact-f32 matmuls here so the 4-iteration
    # PCG wrap keeps the convergence it was tuned against.
    hi = jax.lax.Precision.HIGHEST
    while m > 1:
        A = E[0::2]                                # E_{2k}   (h, n, n)
        B = E[1::2]                                # E_{2k+1} (h, n, n)
        Dodd = D[1::2]
        c = jnp.linalg.cholesky(Dodd)
        ok = ok & jnp.all(jnp.isfinite(c))
        X = _cho_solve_b(c, jnp.swapaxes(A, -1, -2))   # Dodd^{-1} A^T
        Z = _cho_solve_b(c, B)                         # Dodd^{-1} B
        T1 = jnp.einsum("kij,kil->kjl", B, Z, precision=hi)
        T1 = jnp.concatenate([jnp.zeros_like(T1[:1]), T1[:-1]])
        T2 = jnp.einsum("kij,kjl->kil", A, X, precision=hi)
        levels.append((c, A, B))
        D = D[0::2] - T1 - T2
        E = -jnp.einsum("kij,kjl->kil", A, Z, precision=hi)
        m //= 2                                        # ends with E[m-1]=0
    c0 = jnp.linalg.cholesky(D[0])
    ok = ok & jnp.all(jnp.isfinite(c0))
    levels.append(c0)
    return levels, ok


def _bcr_solve(levels, b, m_orig):
    """x = S^-1 b through the cyclic-reduction levels; b (m_orig, n)."""
    n = b.shape[1]
    m_pad = 2 ** (len(levels) - 1)
    if m_pad > m_orig:
        b = jnp.concatenate(
            [b, jnp.zeros((m_pad - m_orig, n), b.dtype)])

    hi = jax.lax.Precision.HIGHEST

    def rec(li, b):
        if li == len(levels) - 1:
            return _cho_solve_b(levels[li], b[0])[None]
        c, A, B = levels[li]
        b_odd, b_even = b[1::2], b[0::2]
        u = _cho_solve_b(c, b_odd)
        t1 = jnp.einsum("kij,ki->kj", B, u, precision=hi)  # -> even k+1
        t1 = jnp.concatenate([jnp.zeros_like(t1[:1]), t1[:-1]])
        t2 = jnp.einsum("kij,kj->ki", A, u, precision=hi)  # -> even k
        x_even = rec(li + 1, b_even - t1 - t2)
        x_right = jnp.concatenate(
            [x_even[1:], jnp.zeros_like(x_even[:1])])
        rhs_odd = (b_odd - jnp.einsum("kij,ki->kj", A, x_even, precision=hi)
                   - jnp.einsum("kij,kj->ki", B, x_right, precision=hi))
        x_odd = _cho_solve_b(c, rhs_odd)
        return jnp.stack([x_even, x_odd], axis=1).reshape(-1, n)

    return rec(0, b)[:m_orig].reshape(-1)


def _solve_factored(C, M, b):
    """x = (L L^T)^-1 b given the chunked factors; b (n_c, n)."""
    n = C.shape[1]
    y0 = jnp.zeros((n,), C.dtype)

    def fwd(y_prev, inp):
        C_i, M_i, b_i = inp
        y_i = solve_triangular(C_i, b_i - M_i @ y_prev, lower=True)
        return y_i, y_i

    _, Y = jax.lax.scan(fwd, y0, (C, M, b))
    M_next = jnp.concatenate([M[1:], jnp.zeros_like(M[:1])], axis=0)

    def bwd(x_next, inp):
        C_i, Mn_i, y_i = inp
        x_i = solve_triangular(C_i, y_i - Mn_i.T @ x_next, lower=True,
                               trans=1)
        return x_i, x_i

    _, X = jax.lax.scan(bwd, y0, (C, M_next, Y), reverse=True)
    return X.reshape(-1)


def solve_reduced_banded_dense(problem: Problem, config: BAConfig,
                               bs: cg_mod.BlockSystem, P: int, D: int,
                               marg_H=None) -> GnStep:
    """Banded S assembly + DENSE Jacobi-scaled Cholesky + matrix-free
    landmark back-substitution.

    The large-window sweet spot between the plain band path and the
    chunked O(P) factorization: the Schur correction comes from the
    per-landmark W-block pair tables (O(sum_l n_l^2) tiny blocks — never
    the O(N^2 L) dense W V^-1 W^T product that dominates past ~512
    poses), while the factorization stays one dense Cholesky (exact, no
    sequential chunk scan).  Mirrors `linear.solve_reduced` numerics.
    """
    band = band_S(problem, config, bs, P, D)
    delta_p, ok = banded_dense_solve(band, bs.rhs_sc, bs.col_mask, marg_H)
    delta_l = cg_mod.back_substitute_blocks(bs, delta_p, P, D, 0)
    return GnStep(delta_p=delta_p, delta_l=delta_l, ok=ok)


def banded_dense_solve(band, rhs_sc, col_mask, marg_H=None):
    """Densify an assembled band, optionally add the dense marginalization
    prior curvature, and solve by Jacobi-scaled Cholesky + one refinement
    step (mirrors `linear.solve_reduced` numerics).  Returns (delta_p, ok).

    Pure function of the (replicated) band — runs unchanged inside
    shard_map after the per-shard partial bands are psum'd
    (`parallel.shard._sharded_build_banded_dense`), which is how the
    DISTRIBUTED sliding window carries its FEJ prior: the prior is a
    replicated dense factor that cannot ride the band, so it joins at the
    dense stage after ONE band psum."""
    dtype = rhs_sc.dtype
    S = band_to_dense_sym(band)
    if marg_H is not None:
        S = S + marg_H

    d = jnp.diagonal(S)
    scal = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    Ss = S * scal[:, None] * scal[None, :]
    eps = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)
    Ss = Ss + eps * jnp.eye(S.shape[0], dtype=dtype)
    c, low = jax.scipy.linalg.cho_factor(Ss, lower=True)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(c)))

    def scaled_solve(rhs):
        return jax.scipy.linalg.cho_solve((c, low), rhs * scal) * scal

    delta_p = scaled_solve(rhs_sc)
    delta_p = delta_p + scaled_solve(rhs_sc - S @ delta_p)
    delta_p = jnp.where(jnp.isfinite(delta_p), delta_p, 0.0)
    delta_p = jnp.where(col_mask, delta_p, 0.0)
    return delta_p, ok


def band_to_dense_sym(band):
    """(P, B, D, D) band -> dense symmetric (P*D, P*D) (band_to_dense
    twin; local import keeps the assemble<->banded import graph acyclic)."""
    from .assemble import band_to_dense

    return band_to_dense(band)


def _effective_pcg_iters(n_config: int, backend: str) -> int:
    """PCG wrap count for the chunked band factorization.

    0 = auto (4: with the exact-f32 chunk Schur product in `_factor`, 4
    iterations converge identically to 12 on 64-2048-pose windows).
    KNOWN FAULT (ROADMAP item 2 / BASELINE.md): the n_pcg=3 program
    hard-faults the TPU at exactly P=512 (same XLA bug class as the rolled
    banded-matvec fault) — the clamp below pins the workaround so a config
    can never resurrect it; tests/test_parity3.py guards it."""
    n = n_config or 4
    if n == 3 and backend == "tpu":
        n = 4
    return n


def solve_reduced_fleet_dense(problem: Problem, config: BAConfig,
                              bs: cg_mod.BlockSystem, P: int,
                              D: int) -> GnStep:
    """Fleet reduced solve: per-window DENSE Schur complement + ONE batched
    Cholesky — (F, n_w, n_w) with n_w = (P/F)*D.

    Windows never couple (concat_problems is block-diagonal), so
      * U comes off the banded family grid, densified window-by-window at
        memcpy speed (band_to_dense vmapped);
      * the Schur correction is a *batched MXU matmul*
        S_f = U_f - (W_f V^-1) W_f^T over each window's dense
        (n_w, L_w*lm) coupling block — NOT the per-landmark pair-table
        scatter (profiled 2026-08-19: the sp-table path moved ~1M tiny
        blocks per iteration and dominated band_S at 23 ms; the dense
        product is ~11 GFLOP of pure batched matmul at the flagship fleet
        size);
      * one batched `cho_factor`, no sequential chunk scan, no PCG wrap;
        numerics match `linear.solve_reduced` per window.
    The right fleet path whenever one window's dense factor fits (n_w up
    to a few thousand); the chunked O(P) path remains for long single
    trajectories.
    """
    from .assemble import band_to_dense

    dtype = bs.rhs_sc.dtype
    F = config.fleet_size
    P_w = P // F
    n_w = P_w * D
    B = config.band_width
    L = bs.V.shape[0]
    lm = bs.V.shape[1]
    L_w = L // F

    # families-only U on the band grid (no Schur correction rows)
    grid = _band_self_cross(P, B, D, dtype, bs.pj, bs.ju, bs.u_pose,
                            bs.jb1, bs.jb2, bs.b1, bs.b2, bs.ji1, bs.ji2,
                            bs.i1, bs.i2)
    band = grid.reshape(P, B, D, D)
    pd = jnp.arange(P)[:, None] + jnp.arange(B)[None, :]
    band = band * (pd < P)[:, :, None, None].astype(dtype)
    # masked dims -> identity rows (as band_S does)
    mD = bs.col_mask[: P * D].reshape(P, D).astype(dtype)
    band = band.at[:, 0].add(
        jnp.eye(D, dtype=dtype)[None] * (1.0 - mD)[:, :, None])
    U = jax.vmap(band_to_dense)(band.reshape(F, P_w, B, D, D))

    # per-window dense W in TRANSPOSED strip layout W_T (F, L_w, lm, n_w):
    # every raw projection row scatters one contiguous (D,)-wide strip at
    # flat row ((f*L_w + l)*lm + k), col pose_local*D — a row scatter of
    # ~2 Nr strips, no intermediate unique-block table, no per-element
    # index tuples (the naive (F, n_w, L*lm) block scatter profiled
    # 6.4 ms; this form is a plain strip scatter like the rhs sums)
    pj = bs.pj
    strips = jnp.concatenate([
        jnp.einsum("nik,nil->nlk", pj.j_m, pj.j_l),
        jnp.einsum("nik,nil->nlk", pj.j_r, pj.j_l)], axis=0)  # (2n, lm, 6)
    strips = jnp.pad(strips, ((0, 0), (0, 0), (0, D - 6)))    # (2n, lm, D)
    lm_g = jnp.concatenate([pj.lm, pj.lm])
    pose_g = jnp.concatenate([pj.pose, pj.ref])
    # single flat row index (landmark-slot-major, pose minor) so the
    # scatter is a plain ROW scatter with D-wide update windows — the
    # two-index form lowered to element-granular writes (profiled 9 ms)
    row = (lm_g[:, None] * lm
           + jnp.arange(lm, dtype=lm_g.dtype)[None, :]) * P_w \
        + (pose_g % P_w)[:, None]                             # (2n, lm)
    Wt = jnp.zeros((F * L_w * lm * P_w, D), dtype)
    Wt = Wt.at[row.reshape(-1)].add(strips.reshape(-1, D))
    W_T = Wt.reshape(F, L_w * lm, n_w)

    # batched Schur complement on the MXU
    vinvF = bs.vinv.reshape(F, L_w, lm, lm)
    WVi_T = jnp.einsum("flkm,flmn->flkn", vinvF,
                       W_T.reshape(F, L_w, lm, n_w))
    WVi_T = WVi_T.reshape(F, L_w * lm, n_w)
    S = U - jnp.einsum("fln,flq->fnq", WVi_T, W_T)

    d = jnp.diagonal(S, axis1=-2, axis2=-1)
    scal = jax.lax.rsqrt(jnp.maximum(d, 1e-12))           # (F, n_w)
    Ss = S * scal[:, :, None] * scal[:, None, :]
    eps = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)
    Ss = Ss + eps * jnp.eye(n_w, dtype=dtype)[None]
    c = jnp.linalg.cholesky(Ss)
    ok = jnp.all(jnp.isfinite(c))

    rhsF = (bs.rhs_sc * scal.reshape(-1)).reshape(F, n_w)

    def tri_solve(cF, bF):
        y = jax.scipy.linalg.solve_triangular(cF, bF[:, :, None],
                                              lower=True)
        return jax.scipy.linalg.solve_triangular(
            cF, y, lower=True, trans=1)[:, :, 0]

    x = tri_solve(c, rhsF)
    # one step of iterative refinement in the scaled space
    r = rhsF - jnp.einsum("fij,fj->fi", Ss, x)
    x = x + tri_solve(c, r)
    delta_p = (x.reshape(-1)) * scal.reshape(-1)
    delta_p = jnp.where(jnp.isfinite(delta_p), delta_p, 0.0)
    delta_p = jnp.where(bs.col_mask, delta_p, 0.0)
    delta_l = cg_mod.back_substitute_blocks(bs, delta_p, P, D, 0)
    return GnStep(delta_p=delta_p, delta_l=delta_l, ok=ok)


def solve_reduced_banded(problem: Problem, config: BAConfig,
                         bs: cg_mod.BlockSystem, P: int, D: int) -> GnStep:
    """Banded S assembly + chunked block-tridiagonal factorization (batched
    cyclic reduction by default, sequential scan otherwise) used as the
    preconditioner of a short PCG wrap + matrix-free landmark
    back-substitution.

    Mirrors `linear.solve_reduced` numerically (same Jacobi scaling, same
    relative eps damping) so the two paths agree to f64 roundoff.
    """
    band = band_S(problem, config, bs, P, D)
    delta_p, ok = banded_pcg_solve(band, bs.rhs_sc, bs.col_mask, config,
                                   P, D)
    delta_l = cg_mod.back_substitute_blocks(bs, delta_p, P, D, 0)
    return GnStep(delta_p=delta_p, delta_l=delta_l, ok=ok)


def banded_pcg_solve(band, rhs_sc, col_mask, config: BAConfig,
                     P: int, D: int):
    """Factor + solve the assembled band: Jacobi scaling, chunked
    block-tridiagonal Cholesky (or batched block cyclic reduction), short
    PCG wrap.  Returns (delta_p, ok).

    Pure function of the (replicated) band — runs unchanged inside
    shard_map after the per-shard partial bands are psum'd
    (`parallel.shard._sharded_build_banded`)."""
    dtype = rhs_sc.dtype
    B = band.shape[1]

    # Jacobi scaling in band form: band'[p,d,i,j] = s[p,i] band s[p+d,j]
    diag = jnp.diagonal(band[:, 0], axis1=-2, axis2=-1)       # (P, D)
    scal = jax.lax.rsqrt(jnp.maximum(diag, 1e-12))
    up = jnp.clip(jnp.arange(P)[:, None] + jnp.arange(B)[None, :], 0, P - 1)
    band_s = band * scal[:, None, :, None] * scal[up][:, :, None, :]
    eps = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)
    band_s = band_s.at[:, 0].add(eps * jnp.eye(D, dtype=dtype)[None])

    # fleet layout: F independent equal windows back to back — batch the
    # factorization across windows so sequential depth stays one window's
    F = config.fleet_size if (config.fleet_size > 1
                              and P % config.fleet_size == 0) else 1
    P_w = P // F

    # chunk size >= B makes the system block-tridiagonal in chunks; pad
    # each window with identity diagonal blocks
    chunk = max(B, min(P_w, config.banded_chunk or 16))
    n_c = -(-P_w // chunk)
    Pp_w = n_c * chunk
    bandF = band_s.reshape(F, P_w, B, D, D)
    if Pp_w > P_w:
        band_p = jnp.zeros((F, Pp_w, B, D, D), dtype)
        band_p = band_p.at[:, :P_w].set(bandF)
        band_p = band_p.at[:, P_w:, 0].set(jnp.eye(D, dtype=dtype))
        bandF = band_p

    Dg, Eg = jax.vmap(lambda b_: _chunk_windows(b_, chunk))(bandF)
    # log-depth batched cyclic reduction when the chunk chain is deep
    # enough to be latency-bound; the 2-chunk system has nothing to gain
    use_bcr = config.banded_cyclic_reduction and n_c >= 4
    if use_bcr:
        levels, okF = jax.vmap(_bcr_factor)(Dg, Eg)
    else:
        C, M, okF = jax.vmap(_factor)(Dg, Eg)     # (F, n_c, n, n) factors
    ok = jnp.all(okF)

    # The chunked block-tridiagonal Cholesky is an EXACT factorization of
    # the band (coupling never reaches past the next chunk when
    # chunk >= B) in exact arithmetic — but in f32 the *sequential* chunk
    # Schur complements lose digits a flat Cholesky would keep, and on
    # ill-conditioned windows plain iterative refinement with a sloppy
    # factor can amplify instead of contract.  So the factor is used as a
    # PRECONDITIONER inside a short unrolled PCG: monotone in the S-norm
    # even when the factorization is only approximate, and each iteration
    # is one banded matvec + one factored solve (both O(P)).  Unrolled
    # straight-line code on purpose: wrapping the banded matvec's gathers
    # in a `fori_loop`/`while_loop` nested inside the outer solve scan
    # hard-faults the TPU at P >= 512 (XLA bug — the unrolled forms
    # compile and run fine).
    # The PCG runs in the UNPADDED fused space (band_matvec over the whole
    # band — cross-window blocks are structurally zero); the factored
    # preconditioner solve pads each window, solves all windows batched,
    # and unpads (padded poses have identity diagonal and zero rhs, so
    # their components stay exactly zero).
    def precond(r):
        rF = r.reshape(F, P_w * D)
        rF = jnp.pad(rF, ((0, 0), (0, (Pp_w - P_w) * D)))
        if use_bcr:
            z = jax.vmap(lambda lv, bi: _bcr_solve(
                lv, bi.reshape(n_c, chunk * D), n_c))(levels, rF)
        else:
            z = jax.vmap(lambda Ci, Mi, bi:
                         _solve_factored(Ci, Mi,
                                         bi.reshape(n_c, chunk * D)))(
                             C, M, rF)
        return z[:, : P_w * D].reshape(-1)

    b = rhs_sc * scal.reshape(-1)
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = r @ z
    # With the exact-f32 chunk Schur product in `_factor`, 4 wrap
    # iterations converge identically to 12 on 64-2048-pose windows
    # (measured 2026-08-18: P=512 11.8k -> 14.9k kf/s, P=1024 11.2k ->
    # 14.4k, P=2048 7.7k -> 8.9k); the `ok` residual guard below rejects
    # the step if a harder system needs more — raise
    # `banded_pcg_iterations` then.  (3 also converges, but the n_pcg=3
    # program hard-faults the TPU at exactly P=512 — same class of XLA
    # bug as the rolled-matvec fault documented above — so 4 it is.)
    n_pcg = _effective_pcg_iters(config.banded_pcg_iterations,
                                 jax.default_backend())
    # residual-based early-stop: once ||r|| has dropped below rel_tol of
    # ||b|| further iterations are masked no-ops (alpha = 0), so a fixed
    # unrolled count cannot *over*-iterate and accumulate f32 drift on
    # easy systems.  (A data-dependent while_loop would genuinely exit
    # early, but rolled loops around the banded matvec hard-fault the TPU
    # at P >= 512 — see the comment above — so masking is the safe form.)
    rel_tol2 = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-10, dtype)
    b2 = b @ b
    for _ in range(n_pcg):
        live = r @ r > rel_tol2 * b2
        Ap = band_matvec(band_s, p)
        pAp = p @ Ap
        alpha = jnp.where(live & (pAp > 0),
                          rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = r @ z
        beta = jnp.where(live & (rz > 0),
                         rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = jnp.where(live, z + beta * p, p)
        rz = jnp.where(live, rz_new, rz)
    delta_p = x[: P * D] * scal.reshape(-1)
    # guard: reject steps the short PCG failed to stabilize (residual not
    # reduced below the rhs) — `ok=False` makes GN/dogleg fall back to
    # rejection instead of applying garbage
    ok = ok & (r @ r <= b @ b)

    delta_p = jnp.where(jnp.isfinite(delta_p), delta_p, 0.0)
    delta_p = jnp.where(col_mask, delta_p, 0.0)
    return delta_p, ok
