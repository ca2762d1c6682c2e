"""Matrix-free block-Jacobi PCG for the Schur-reduced camera system.

The TPU answer to the reference's sparse reduced solve
(`use_sparse_solver` -> Eigen `SimplicialLDLT` on `s_.sparseView()`,
/root/reference/src/BundleAdjuster.cpp:752-826).  A sparse direct
factorization is the wrong shape for the MXU; instead the reduced system

    S x = (U - W V^-1 W^T) x = rhs_sc

is solved by preconditioned conjugate gradients where S is never
materialized: every matvec is evaluated *through the residual blocks*

    U x       = sum_fam  J_f^T (J_f x)          (gather -> tiny dense ops
                                                  -> segment_sum)
    W^T x     = sum_r    j_l^T (J_p x)_r         (segment_sum by landmark)
    W z       = sum_r    J_p^T (j_l z_lm)        (segment_sum by pose)

so the cost per matvec is O(Nr * d^2) flops and O(Nr) memory — independent
of the pose count — and the same formulation shards over a device mesh by
residual/landmark rows with one psum per matvec (SURVEY.md §5.8).

Preconditioner: block-Jacobi of S (exact per-pose D x D diagonal blocks of
the Schur complement, plus the calibration block), the standard choice for
Schur-CG bundle adjustment.  Masked dims act as identity rows (the dense
path's `S_diag = 1e6` regularization, cpp:586-598).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.problem import BAConfig, Problem
from ..core.residuals import prior
from ..utils.linalg import block_diag_inv
from . import assemble as asm
from .linear import GnStep


class BlockSystem(NamedTuple):
    """Weighted residual blocks + landmark inverses: everything a Schur
    matvec needs, nothing quadratic in the pose count."""

    # projection family (width-6 pose blocks)
    pj: asm.ProjBlocks
    # unary / binary (width 6)
    ju: jax.Array        # (Nu, 6, 6)
    u_pose: jax.Array
    jb1: jax.Array       # (Nb, 6, 6)
    jb2: jax.Array
    b1: jax.Array
    b2: jax.Array
    # imu (width D)
    ji1: Optional[jax.Array]   # (Ni, R, D)
    ji2: Optional[jax.Array]
    i1: jax.Array
    i2: jax.Array
    # landmark system
    V: jax.Array         # (L, lm, lm)
    vinv: jax.Array
    rhs_l: jax.Array     # (L*lm,)
    # reduced rhs + masking
    rhs_p: jax.Array     # (N,) pose+calib gradient (pre-Schur)
    rhs_sc: jax.Array    # (N,) Schur-reduced, masked
    col_mask: jax.Array  # (N,) bool
    # preconditioner (inverted S diagonal blocks)
    minv_pose: jax.Array        # (P, D, D)
    minv_cal: Optional[jax.Array]  # (K, K)
    # Levenberg damping scale: diag(S) (1.0 on masked dims)
    dscale: jax.Array    # (N,)
    cost: jax.Array
    proj_w: jax.Array


def _seg2(j1, j2, idx1, idx2, u1, u2, P, fleet: int = 1):
    """segment_sum of j1^T u1 (to idx1) and j2^T u2 (to idx2) -> (P, w).

    In fleet mode the two halves sum separately (concatenation would break
    the window-contiguous row layout `seg_sum_blocks` batches over)."""
    if fleet > 1:
        return (asm.seg_sum_blocks(jnp.einsum("nik,ni->nk", j1, u1),
                                   idx1, P, fleet)
                + asm.seg_sum_blocks(jnp.einsum("nik,ni->nk", j2, u2),
                                     idx2, P, fleet))
    y = jnp.concatenate([jnp.einsum("nik,ni->nk", j1, u1),
                         jnp.einsum("nik,ni->nk", j2, u2)], axis=0)
    return jax.ops.segment_sum(y, jnp.concatenate([idx1, idx2]),
                               num_segments=P)


def _proj_u(bs: BlockSystem, xp6, xk):
    """(Jp x) rows for the projection family: (Nr, 2)."""
    pj = bs.pj
    u = (jnp.einsum("nik,nk->ni", pj.j_m, xp6[pj.pose])
         + jnp.einsum("nik,nk->ni", pj.j_r, xp6[pj.ref]))
    if pj.j_c is not None:
        u = u + jnp.einsum("nik,k->ni", pj.j_c, xk)
    return u


def _wt_apply(bs: BlockSystem, xp6, xk):
    """W^T x -> (L, lm)."""
    L = bs.V.shape[0]
    u = _proj_u(bs, xp6, xk)
    return jax.ops.segment_sum(jnp.einsum("nil,ni->nl", bs.pj.j_l, u),
                               bs.pj.lm, num_segments=L)


def _w_apply(bs: BlockSystem, z, P, D, K):
    """W z -> (N,) from z: (L, lm)."""
    pj = bs.pj
    v = jnp.einsum("nil,nl->ni", pj.j_l, z[pj.lm])
    yp6 = _seg2(pj.j_m, pj.j_r, pj.pose, pj.ref, v, v, P)
    y = jnp.zeros((P, D), yp6.dtype).at[:, :6].add(yp6).reshape(-1)
    if K:
        yk = jnp.einsum("nik,ni->k", pj.j_c, v)
        return jnp.concatenate([y, yk])
    return y


def _u_apply(bs: BlockSystem, xm, P, D, K, marg_H=None):
    """U x (all families + marginalization prior) -> (N,)."""
    xp = xm[: P * D].reshape(P, D)
    xp6 = xp[:, :6]
    xk = xm[P * D:]
    dtype = xm.dtype

    y = jnp.zeros((P, D), dtype)
    yk = jnp.zeros((K,), dtype) if K else None

    # projection
    u = _proj_u(bs, xp6, xk)
    y = y.at[:, :6].add(_seg2(bs.pj.j_m, bs.pj.j_r, bs.pj.pose, bs.pj.ref,
                              u, u, P))
    if K:
        yk = yk + jnp.einsum("nik,ni->k", bs.pj.j_c, u)
    # unary
    uu = jnp.einsum("nik,nk->ni", bs.ju, xp6[bs.u_pose])
    y = y.at[:, :6].add(jax.ops.segment_sum(
        jnp.einsum("nik,ni->nk", bs.ju, uu), bs.u_pose, num_segments=P))
    # binary
    ub = (jnp.einsum("nik,nk->ni", bs.jb1, xp6[bs.b1])
          + jnp.einsum("nik,nk->ni", bs.jb2, xp6[bs.b2]))
    y = y.at[:, :6].add(_seg2(bs.jb1, bs.jb2, bs.b1, bs.b2, ub, ub, P))
    # imu (full width D)
    if bs.ji1 is not None:
        ui = (jnp.einsum("nik,nk->ni", bs.ji1, xp[bs.i1])
              + jnp.einsum("nik,nk->ni", bs.ji2, xp[bs.i2]))
        y = y + _seg2(bs.ji1, bs.ji2, bs.i1, bs.i2, ui, ui, P)
    y = y.reshape(-1)
    if marg_H is not None:
        y = y + marg_H @ xm[: P * D]
    if K:
        return jnp.concatenate([y, yk])
    return y


def s_matvec(bs: BlockSystem, x, P, D, K, lam, marg_H=None,
             axis_name=None):
    """(S + lam*diag(S)) x in the masked subspace; identity on masked dims.

    With `axis_name` (inside shard_map, landmark-sharded layout): the
    residual/landmark sums are shard-local partials, psum'd once per
    matvec — only (N,) crosses the ICI, vs the (N, N) dense S psum of the
    direct sharded path.  The replicated marginalization prior and
    damping are applied after the psum (counted once)."""
    xm = jnp.where(bs.col_mask, x, 0.0)
    y = _u_apply(bs, xm, P, D, K, marg_H if axis_name is None else None)
    wt = _wt_apply(bs, xm[: P * D].reshape(P, D)[:, :6], xm[P * D:])
    z = jnp.einsum("lij,lj->li", bs.vinv, wt)
    y = y - _w_apply(bs, z, P, D, K)
    if axis_name is not None:
        y = jax.lax.psum(y, axis_name)
        if marg_H is not None:
            y = y.at[: P * D].add(marg_H @ xm[: P * D])
    y = y + lam * bs.dscale * xm
    return jnp.where(bs.col_mask, y, x)


def _precond(bs: BlockSystem, r, P, D, K):
    rp = r[: P * D].reshape(P, D)
    y = jnp.einsum("pij,pj->pi", bs.minv_pose, rp).reshape(-1)
    if K:
        yk = bs.minv_cal @ r[P * D:]
        return jnp.concatenate([y, yk])
    return y


def assemble_blocks(problem: Problem, config: BAConfig,
                    imu_eval=None, axis_name=None,
                    with_precond: bool = True,
                    lm_offset=0) -> BlockSystem:
    """Evaluate all residual families into weighted blocks + the exact
    block-Jacobi preconditioner of S (`with_precond=False` skips the
    preconditioner blocks — the banded direct solver doesn't need them).

    With `axis_name` (inside shard_map, landmark-sharded layout from
    `parallel.partition`): the caller passes a problem whose `proj.lm`
    ids are already localized to the shard's landmark chunk and
    `lm_offset` = the chunk's global start.  V / vinv / rhs_l stay
    shard-local; rhs_p, cost, the Schur-reduced rhs and the block-Jacobi
    preconditioner are psum'd (they are sums over residuals); the
    replicated marginalization prior is added once after the psum."""
    D, K, P, L, lm, N = asm.dims(problem, config)
    dtype = problem.poses.t.dtype
    cmask = asm.col_mask(problem, config)
    colm6 = asm.col_mask(problem, config, 6).astype(dtype)
    cm6 = colm6[: P * 6].reshape(P, 6)
    cmD = cmask[: P * D].reshape(P, D).astype(dtype)

    pb = asm.proj_blocks(problem, config, colm6, axis_name)

    ue = prior.evaluate_unary(problem, config, with_jacobians=True)
    u_pose = problem.unary.pose.astype(jnp.int32)
    ju = ue.j1 * cm6[u_pose][:, None, :]
    be = prior.evaluate_binary(problem, config, with_jacobians=True)
    b1 = problem.binary.pose1.astype(jnp.int32)
    b2 = problem.binary.pose2.astype(jnp.int32)
    jb1 = be.j1 * cm6[b1][:, None, :]
    jb2 = be.j2 * cm6[b2][:, None, :]

    i1 = problem.imu.pose1.astype(jnp.int32)
    i2 = problem.imu.pose2.astype(jnp.int32)
    if imu_eval is not None:
        ji1 = imu_eval.j1 * cmD[i1][:, None, :]
        ji2 = imu_eval.j2 * cmD[i2][:, None, :]
        imu_cost = jnp.sum(imu_eval.err_sq)
        ri = imu_eval.r
    else:
        ji1 = ji2 = None
        imu_cost = jnp.zeros((), dtype)
        ri = None

    # fleet mode (concat_problems layout): per-window one-hot MXU segment
    # sums replace the serialized scatters (seg_sum_blocks fleet path);
    # single-window and sharded problems keep plain segment_sum (measured
    # faster there — the global one-hot form LOST ~25% whole-flagship
    # throughput when it accidentally took over the F=1 path, 2026-08-19)
    F = config.fleet_size if axis_name is None else 1

    def _ss(vals, ids, nseg):
        if F > 1:
            return asm.seg_sum_blocks(vals, ids, nseg, F)
        return jax.ops.segment_sum(vals, ids, num_segments=nseg)

    # landmark system
    lm_ids = pb.lm
    V = _ss(jnp.einsum("nik,nil->nkl", pb.j_l, pb.j_l), lm_ids, L)
    vinv = block_diag_inv(V)
    rhs_l = _ss(jnp.einsum("nil,ni->nl", pb.j_l, pb.r), lm_ids, L)

    # gradient rhs_p = J^T r over pose+calib dims
    yp = jnp.zeros((P, D), dtype)
    yp = yp.at[:, :6].add(_seg2(pb.j_m, pb.j_r, pb.pose, pb.ref,
                                pb.r, pb.r, P, F))
    yp = yp.at[:, :6].add(_ss(jnp.einsum("nik,ni->nk", ju, ue.r),
                              u_pose, P))
    yp = yp.at[:, :6].add(_seg2(jb1, jb2, b1, b2, be.r, be.r, P, F))
    if ji1 is not None:
        yp = yp + _seg2(ji1, ji2, i1, i2, ri, ri, P, F)
    rhs_p = yp.reshape(-1)
    if K:
        rk = jnp.einsum("nik,ni->k", pb.j_c, pb.r)
        rhs_p = jnp.concatenate([rhs_p, rk])
    cost = (pb.cost + jnp.sum(ue.err_sq) + jnp.sum(be.err_sq) + imu_cost)
    if axis_name is not None:
        rhs_p = jax.lax.psum(rhs_p, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    # marginalization prior: gradient + curvature (static-shape gate);
    # a replicated factor — added once, after the psum
    marg = problem.marg
    marg_H = None
    if marg.H.shape[0] == P * D:
        on = marg.active.astype(dtype)
        delta = asm.pose_tangent(problem.poses, marg, D)
        H = marg.H * on
        colmD = cmask[: P * D].astype(dtype)
        marg_H = H * colmD[:, None] * colmD[None, :]
        grad = (H @ delta + marg.g * on) * colmD
        rhs_p = rhs_p.at[: P * D].add(grad)
        cost = cost + delta @ H @ delta + 2.0 * (marg.g * on) @ delta

    # Schur-reduced rhs
    z0 = jnp.einsum("lij,lj->li", vinv, rhs_l)
    pre_bs = dict(pj=pb, ju=ju, u_pose=u_pose, jb1=jb1, jb2=jb2, b1=b1,
                  b2=b2, ji1=ji1, ji2=ji2, i1=i1, i2=i2, V=V, vinv=vinv,
                  rhs_l=rhs_l.reshape(-1))
    # (need a BlockSystem instance for the apply helpers; fill the rest
    # with placeholders first)
    tmp = BlockSystem(**pre_bs, rhs_p=rhs_p, rhs_sc=rhs_p, col_mask=cmask,
                      minv_pose=jnp.zeros((P, D, D), dtype),
                      minv_cal=None, dscale=jnp.ones((N,), dtype),
                      cost=cost, proj_w=pb.w)
    w_z0 = _w_apply(tmp, z0, P, D, K)
    if axis_name is not None:
        w_z0 = jax.lax.psum(w_z0, axis_name)
    rhs_sc = rhs_p - w_z0
    rhs_sc = jnp.where(cmask, rhs_sc, 0.0)

    if not with_precond:
        return tmp._replace(rhs_sc=rhs_sc, cost=cost), marg_H

    # --- exact block-Jacobi diagonal of S -----------------------------
    # U diagonal blocks per pose
    diag6 = jax.ops.segment_sum(
        jnp.concatenate([
            jnp.einsum("nik,nil->nkl", pb.j_m, pb.j_m),
            jnp.einsum("nik,nil->nkl", pb.j_r, pb.j_r),
            jnp.einsum("nik,nil->nkl", ju, ju),
            jnp.einsum("nik,nil->nkl", jb1, jb1),
            jnp.einsum("nik,nil->nkl", jb2, jb2)], axis=0),
        jnp.concatenate([pb.pose, pb.ref, u_pose, b1, b2]),
        num_segments=P)
    diag = jnp.zeros((P, D, D), dtype).at[:, :6, :6].add(diag6)
    if ji1 is not None:
        diag = diag + jax.ops.segment_sum(
            jnp.concatenate([jnp.einsum("nik,nil->nkl", ji1, ji1),
                             jnp.einsum("nik,nil->nkl", ji2, ji2)], axis=0),
            jnp.concatenate([i1, i2]), num_segments=P)
    # Schur correction: sum_l Wb_{p,l} V_l^-1 Wb_{p,l}^T via the W-block
    # table (host-enumerated unique (pose, lm) blocks).  Sharded: the wb
    # table is global but a shard's residuals only ever populate its own
    # landmarks' rows (partition_by_landmark ownership) — foreign rows
    # segment-sum to exactly zero, so the clipped vinv gather is inert.
    idx = problem.pidx
    wb_lm = idx.wb_lm
    if axis_name is not None:
        wb_lm = jnp.clip(wb_lm - lm_offset, 0, L - 1)
    wb_blocks = jnp.concatenate([
        jnp.einsum("nik,nil->nkl", pb.j_m, pb.j_l),
        jnp.einsum("nik,nil->nkl", pb.j_r, pb.j_l)], axis=0)
    wb_ids = jnp.concatenate([problem.proj.wb_meas, problem.proj.wb_ref])
    Wb = jax.ops.segment_sum(wb_blocks, wb_ids,
                             num_segments=idx.wb_pose.shape[0])
    G = jnp.einsum("nkl,nlm,nqm->nkq", Wb, vinv[wb_lm], Wb)
    corr6 = jax.ops.segment_sum(G, idx.wb_pose, num_segments=P)
    diag = diag.at[:, :6, :6].add(-corr6)
    if axis_name is not None:
        diag = jax.lax.psum(diag, axis_name)
    if marg_H is not None:
        Hd = marg_H.reshape(P, D, P, D)
        diag = diag + jax.vmap(lambda p: Hd[p, :, p, :])(jnp.arange(P))

    # masked dims -> identity rows/cols (the dense path's 1e6 diagonal
    # regularization collapses to exact identity in the masked subspace)
    mD = cmD
    diag = diag * mD[:, :, None] * mD[:, None, :]
    diag = diag + jnp.eye(D, dtype=dtype)[None] * (1.0 - mD)[:, :, None]

    lam = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)
    dscale_p = jnp.maximum(jax.vmap(jnp.diag)(diag), 1e-12)
    diag = diag + lam * jax.vmap(jnp.diag)(dscale_p)
    minv_pose = block_diag_inv(diag)

    minv_cal = None
    dscale = jnp.where(cmask, 1.0, 1.0).astype(dtype)
    dscale = dscale.at[: P * D].set(dscale_p.reshape(-1))
    if K:
        Uc = jnp.einsum("nik,nil->kl", pb.j_c, pb.j_c)
        Wc = jax.ops.segment_sum(
            jnp.einsum("nik,nil->nkl", pb.j_c, pb.j_l), lm_ids,
            num_segments=L)
        Sc = Uc - jnp.einsum("lkm,lmn,lqn->kq", Wc, vinv, Wc)
        if axis_name is not None:
            Sc = jax.lax.psum(Sc, axis_name)
        dk = jnp.maximum(jnp.diag(Sc), 1e-12)
        Sc = Sc + lam * jnp.diag(dk)
        minv_cal = jnp.linalg.inv(
            Sc + 1e-12 * jnp.eye(K, dtype=dtype))
        dscale = dscale.at[P * D:].set(dk)

    return BlockSystem(**pre_bs, rhs_p=rhs_p, rhs_sc=rhs_sc,
                       col_mask=cmask, minv_pose=minv_pose,
                       minv_cal=minv_cal, dscale=dscale, cost=cost,
                       proj_w=pb.w), marg_H


def solve_reduced_cg(bs: BlockSystem, marg_H, config: BAConfig,
                     P, D, K, axis_name=None) -> GnStep:
    """PCG on S delta_p = rhs_sc, then landmark back-substitution.

    Runs unchanged inside shard_map (`axis_name` set): rhs_sc and the
    preconditioner are replicated after assembly's psums, every matvec
    psums its (N,) partial, so all CG scalars stay replicated and the
    iteration is device-count-invariant."""
    dtype = bs.rhs_sc.dtype
    lam = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)

    def mv(x):
        return s_matvec(bs, x, P, D, K, lam, marg_H, axis_name)

    b = bs.rhs_sc
    x0 = jnp.zeros_like(b)
    r0 = b  # x0 = 0
    z0 = _precond(bs, r0, P, D, K)
    rz0 = r0 @ z0
    bnorm = jnp.sqrt(b @ b)
    tol2 = (config.cg_tolerance * bnorm) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (r @ r > tol2) & (k < config.cg_max_iterations)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = mv(p)
        denom = p @ Ap
        alpha = rz / jnp.where(denom > 0, denom, 1.0)
        alpha = jnp.where(denom > 0, alpha, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = _precond(bs, r, P, D, K)
        rz_new = r @ z
        beta = rz_new / jnp.where(rz > 0, rz, 1.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    state = (x0, r0, z0, z0, rz0, jnp.asarray(0))
    x, r, _, _, _, _ = jax.lax.while_loop(cond, body, state)

    delta_p = jnp.where(jnp.isfinite(x), x, 0.0)
    delta_p = jnp.where(bs.col_mask, delta_p, 0.0)

    delta_l = back_substitute_blocks(bs, delta_p, P, D, K)
    ok = jnp.all(jnp.isfinite(x))
    return GnStep(delta_p=delta_p, delta_l=delta_l, ok=ok)


def back_substitute_blocks(bs: BlockSystem, delta_p, P, D, K) -> jax.Array:
    """delta_l = V^-1 (rhs_l - W^T delta_p), matrix-free through the
    projection blocks (reference GetLandmarkDelta, cpp:709-744)."""
    L, lm, _ = bs.vinv.shape
    xp6 = delta_p[: P * D].reshape(P, D)[:, :6]
    wt = _wt_apply(bs, xp6, delta_p[P * D:])
    resid = bs.rhs_l.reshape(L, lm) - wt
    return jnp.einsum("lij,lj->li", bs.vinv, resid).reshape(-1)


def cauchy_factor(bs: BlockSystem, marg_H, P, D, K, axis_name=None):
    """alpha = ||rhs||^2 / (rhs^T H rhs) over pose+landmark dims (the
    dogleg Cauchy step, reference cpp:857-925), through the blocks.
    Sharded: rhs_p is replicated, rhs_l/V local — the landmark terms and
    the residual-sum quadratic are psum'd, the marg term counted once."""
    L, lm, _ = bs.V.shape
    rl = bs.rhs_l.reshape(L, lm)
    rp = jnp.where(bs.col_mask, bs.rhs_p, 0.0)
    Ur = _u_apply(bs, rp, P, D, K,
                  marg_H if axis_name is None else None)
    num_l = jnp.sum(bs.rhs_l ** 2)
    den = (bs.rhs_p @ Ur
           + 2.0 * (bs.rhs_p @ _w_apply(bs, rl, P, D, K))
           + jnp.einsum("li,lij,lj->", rl, bs.V, rl))
    if axis_name is not None:
        num_l = jax.lax.psum(num_l, axis_name)
        den = jax.lax.psum(den, axis_name)
        if marg_H is not None:
            den = den + rp[: P * D] @ (marg_H @ rp[: P * D])
    num = jnp.sum(bs.rhs_p ** 2) + num_l
    return num / jnp.maximum(den, 1e-30)
