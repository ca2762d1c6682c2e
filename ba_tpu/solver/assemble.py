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
        m = jnp.concatenate([m, jnp.ones((config.calib_dim,), bool)])
    return m


def _dense_rows(pose_blocks, P, D, K, calib_block=None):
    """Build the dense per-residual Jacobian (Nr, rdim, P*D [+K]) from pose
    blocks `(J (Nr, rdim, k<=D), pose_idx (Nr,))` by scatter-add.

    (Measured on TPU: the scatter fuses well here and beats a one-hot
    outer-product formulation 2x — the latter materializes the 90MB
    intermediate twice.)
    """
    J0, _ = pose_blocks[0]
    Nr, rdim, _ = J0.shape
    dtype = J0.dtype
    out = jnp.zeros((Nr, rdim, P * D), dtype)
    r_idx = jnp.arange(Nr)[:, None, None]
    d_idx = jnp.arange(rdim)[None, :, None]
    for blk, idx in pose_blocks:
        k = blk.shape[-1]
        cols = (idx[:, None] * D + jnp.arange(k)[None, :])[:, None, :]
        out = out.at[r_idx, d_idx, cols].add(blk)
    if K:
        cal = calib_block if calib_block is not None else \
            jnp.zeros((Nr, rdim, K), dtype)
        out = jnp.concatenate([out, cal], axis=-1)
    return out


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


def proj_contribution(problem: Problem, config: BAConfig, colm6):
    """Projection-family partial sums in the *compact* width-6 pose system
    (expand with `expand_contribution`).  Works identically on a shard of
    the projection table (all other problem fields replicated)."""
    D_full, K, P, L, lm, _ = dims(problem, config)
    D = 6
    N = P * D + K
    dtype = problem.poses.t.dtype

    pe = reprojection.evaluate(problem, config, with_jacobians=True)
    pr = problem.proj
    base_w = jnp.where(pr.valid, pr.weight, 0.0)
    err_sq_w = base_w * pe.err_sq
    if config.use_robust_norm_for_proj_residuals:
        w_rob = robust.huber_weights(err_sq_w, pr.valid, pr.cond,
                                     config.outlier_threshold)
    else:
        w_rob = jnp.ones_like(base_w)
    w = base_w * w_rob
    sw = jnp.sqrt(w)[:, None, None]

    lm_ok = (problem.lms.active & problem.lms.reliable)[pr.lm]
    if config.lm_size == 0:
        # pose-graph-only mode: landmark system is a 1-wide dummy block
        j_lm = jnp.zeros((pr.z.shape[0], 2, 1), dtype)
    else:
        j_lm = jnp.where(lm_ok[:, None, None], pe.j_lm, 0.0)

    blocks = [
        (pe.j_meas * sw, pr.pose.astype(jnp.int32)),
        (pe.j_ref * sw, problem.lms.ref_pose[pr.lm].astype(jnp.int32)),
    ]
    Jp = _dense_rows(blocks, P, D, K,
                     calib_block=(pe.j_cal * sw) if K else None)
    Jp = (Jp * colm6[None, None, :]).reshape(-1, N)
    rw = (pe.r * sw[:, :, 0]).reshape(-1)

    j_lm_w = j_lm * sw
    Nr = pr.z.shape[0]
    Jl = jnp.zeros((Nr, 2, L * lm), dtype)
    r_idx = jnp.arange(Nr)[:, None, None]
    d_idx = jnp.arange(2)[None, :, None]
    lcols = (pr.lm.astype(jnp.int32)[:, None] * lm
             + jnp.arange(lm)[None, :])[:, None, :]
    Jl = Jl.at[r_idx, d_idx, lcols].add(j_lm_w).reshape(-1, L * lm)

    contrib = Contribution(
        U=Jp.T @ Jp,
        rhs_p=Jp.T @ rw,
        W=Jp.T @ Jl,
        V=jax.ops.segment_sum(jnp.einsum("nik,nil->nkl", j_lm_w, j_lm_w),
                              pr.lm.astype(jnp.int32), num_segments=L),
        rhs_l=Jl.T @ rw,
        cost=jnp.sum(w * pe.err_sq),
    )
    return contrib, w


def prior_contribution(problem: Problem, config: BAConfig, colm6):
    """Unary + binary pose-graph partial sums (compact width-6 system)."""
    D_full, K, P, L, lm, _ = dims(problem, config)
    D = 6
    N = P * D + K
    dtype = problem.poses.t.dtype
    out = _empty_contrib(N, L, lm, dtype)

    ue = prior.evaluate_unary(problem, config, with_jacobians=True)
    Ju = _dense_rows([(ue.j1, problem.unary.pose.astype(jnp.int32))],
                     P, D, K)
    Ju = (Ju * colm6[None, None, :]).reshape(-1, N)
    ru = ue.r.reshape(-1)
    out = out._replace(U=out.U + Ju.T @ Ju, rhs_p=out.rhs_p + Ju.T @ ru,
                       cost=out.cost + jnp.sum(ue.err_sq))

    be = prior.evaluate_binary(problem, config, with_jacobians=True)
    Jb = _dense_rows(
        [(be.j1, problem.binary.pose1.astype(jnp.int32)),
         (be.j2, problem.binary.pose2.astype(jnp.int32))],
        P, D, K)
    Jb = (Jb * colm6[None, None, :]).reshape(-1, N)
    rb = be.r.reshape(-1)
    return out._replace(U=out.U + Jb.T @ Jb, rhs_p=out.rhs_p + Jb.T @ rb,
                        cost=out.cost + jnp.sum(be.err_sq))


def imu_contribution(problem: Problem, config: BAConfig, colm, imu_eval):
    D, K, P, L, lm, N = dims(problem, config)
    dtype = problem.poses.t.dtype
    out = _empty_contrib(N, L, lm, dtype)
    ie = imu_eval
    Ji = _dense_rows(
        [(ie.j1, problem.imu.pose1.astype(jnp.int32)),
         (ie.j2, problem.imu.pose2.astype(jnp.int32))],
        P, D, K)
    Ji = (Ji * colm[None, None, :]).reshape(-1, N)
    ri = ie.r.reshape(-1)
    return out._replace(U=out.U + Ji.T @ Ji, rhs_p=out.rhs_p + Ji.T @ ri,
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
    on = m.active.astype(dtype)
    delta = pose_tangent(problem.poses, m, config.pose_dim)
    return on * (delta @ m.H @ delta + 2.0 * m.g @ delta)


def assemble(problem: Problem, config: BAConfig, imu_eval=None) -> Assembly:
    """Build the (Schur-reduced) normal equations at the current state.

    `imu_eval` is an optional precomputed ImuEval (ba_tpu.core.residuals.imu)
    so the IMU preintegration scan is shared with cost evaluation.
    """
    D, K, P, L, lm, N = dims(problem, config)
    cmask = col_mask(problem, config)
    colm = cmask.astype(problem.poses.t.dtype)
    colm6 = col_mask(problem, config, 6).astype(problem.poses.t.dtype)
    comp, w = proj_contribution(problem, config, colm6)
    comp = _add(comp, prior_contribution(problem, config, colm6))
    contrib = expand_contribution(comp, P, D, K)
    if imu_eval is not None:
        contrib = _add(contrib,
                       imu_contribution(problem, config, colm, imu_eval))
    contrib = _add(contrib, marg_contribution(problem, config, colm))
    return finish(contrib, cmask, w)


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
