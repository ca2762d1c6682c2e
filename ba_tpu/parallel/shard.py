"""Multi-device sharded assembly: the distributed backend the reference lacks.

The reference is single-process/single-node with TBB-only parallelism
(SURVEY.md §2.4); its only scaling strategy is fixed-lag windowing.  Here the
residual tables are sharded across a `jax.sharding.Mesh` axis and each device
computes the *partial sums* of the normal equations over its residual shard;
`psum` over ICI reduces U / W / V / rhs (they are sums over residuals), the
small reduced camera system S is solved replicated, and landmark
back-substitution is shard-local arithmetic on replicated deltas — exactly
the plan in SURVEY.md §5.8.

Layout (v1):
  * states (poses, landmarks, rig) replicated;
  * projection residual rows sharded along the mesh axis;
  * IMU / unary / binary residual rows sharded along the same axis;
  * collectives: one `psum` per contribution tensor per iteration.

The residual tables must be padded to a multiple of the mesh axis size
(ProblemBuilder.build(pad_multiple=n_devices) — padded rows are invalid and
contribute zeros, so sharding them is free).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import BAConfig, Problem
from ..solver import assemble as asm
from ..solver.step import (IterResult, _cost, _imu_eval, apply_update,
                           apply_robust_reweighting)
from ..solver.linear import solve_reduced

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def problem_shardings(problem: Problem, mesh: Mesh,
                      landmark_sharded: bool = False):
    """NamedSharding pytree for `jax.device_put`: residual tables sharded on
    axis 0, states replicated.  With `landmark_sharded` the landmark tables
    are row-sharded too (use `partition.partition_by_landmark` first so each
    device's projection rows reference only its own landmark chunk)."""
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(AXIS))

    def rows_except_scalars(table):
        return jax.tree_util.tree_map(
            lambda a: row if a.ndim else repl, table)

    out = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: repl, problem),
        proj=rows_except_scalars(problem.proj),
        unary=rows_except_scalars(problem.unary),
        binary=rows_except_scalars(problem.binary),
        imu=rows_except_scalars(problem.imu),
    )
    if landmark_sharded:
        out = dataclasses.replace(
            out, lms=rows_except_scalars(problem.lms))
    return out


def sharded_assemble(problem: Problem, config: BAConfig, use_imu: bool,
                     mesh: Mesh):
    """Assembly with residual-sharded partial sums + psum, inside shard_map."""
    D, K, Pn, L, lm, N = asm.dims(problem, config)
    cmask = asm.col_mask(problem, config)
    colm = cmask.astype(problem.poses.t.dtype)
    colm6 = asm.col_mask(problem, config, 6).astype(problem.poses.t.dtype)

    def _rows(table):
        return jax.tree_util.tree_map(
            lambda a: P(AXIS) if a.ndim else P(), table)

    in_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: P(), problem),
        proj=_rows(problem.proj),
        unary=_rows(problem.unary),
        binary=_rows(problem.binary),
        imu=_rows(problem.imu),
    )

    def local(problem_shard, colm_, colm6_):
        comp, w = asm.proj_contribution(problem_shard, config, colm6_,
                                        axis_name=AXIS)
        comp = asm._add(
            comp, asm.prior_contribution(problem_shard, config, colm6_))
        if use_imu:
            ie = _imu_eval(problem_shard, config, True, True)
            full = asm.imu_contribution(problem_shard, config, colm_, ie)
        else:
            full = asm._empty_contrib(N, L, lm, problem_shard.poses.t.dtype)
        # psum the *compact* projection/prior sums (less ICI traffic), the
        # full-width IMU sums separately
        comp = jax.lax.psum(comp, AXIS)
        full = jax.lax.psum(full, AXIS)
        return comp, full, w

    contrib_specs = asm.Contribution(*([P()] * 6))
    comp, full, w_sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(in_specs, P(), P()),
        out_specs=(contrib_specs, contrib_specs, P(AXIS)),
        # scan carries initialized from replicated zeros feed shard-varying
        # updates (IMU covariance propagation); skip the vma consistency
        # check rather than pcast every init.
        check_vma=False,
    )(problem, colm, colm6)
    contrib = asm._add(asm.expand_contribution(comp, Pn, D, K), full)
    # marginalization prior is a dense replicated factor — added outside the
    # sharded region (it is not a sum over residual rows)
    contrib = asm._add(contrib, asm.marg_contribution(problem, config, colm))
    return asm.finish(contrib, cmask, w_sharded)


@partial(jax.jit, static_argnames=("config", "use_imu", "mesh",
                                   "gn_damping"))
def sharded_gn_iteration(problem: Problem, config: BAConfig, use_imu: bool,
                         mesh: Mesh, gn_damping: float = 1.0) -> IterResult:
    """One distributed GN iteration: sharded evaluation + psum-reduced
    normal equations, replicated reduced solve, replicated update."""
    # persistent unary/IMU robust rescaling (§7.4) — runs at jit level over
    # the global (sharded) tables; XLA inserts the gathers the median needs
    problem = apply_robust_reweighting(problem, config, use_imu)
    a = sharded_assemble(problem, config, use_imu, mesh)
    step = solve_reduced(a)
    candidate = apply_update(problem, config, step.delta_p, step.delta_l,
                             scale=gn_damping)
    post = _cost(candidate, config, use_imu, a.proj_w)
    accept = (post <= a.cost) & step.ok
    out = jax.tree_util.tree_map(
        lambda x, y: jnp.where(accept, x, y), candidate, problem)
    dn = gn_damping * jnp.sqrt(jnp.sum(step.delta_p**2)
                               + jnp.sum(step.delta_l**2))
    # rejected iterations report the *committed* state's cost and a zero
    # step (same contract as step.gn_iteration, step.py:271-274): the
    # trial cost was never applied, so convergence logic must not see it
    return IterResult(problem=out, pre_cost=a.cost,
                      post_cost=jnp.where(accept, post, a.cost),
                      delta_norm=jnp.where(accept, dn, 0.0),
                      accepted=accept,
                      trust_radius=jnp.zeros_like(a.cost),
                      solver_ok=step.ok,
                      pre_solve_norm=a.cost, post_solve_norm=post,
                      inner_trials=jnp.ones((), jnp.int32))


# ---------------------------------------------------------------------------
# Landmark-sharded distributed Schur (SURVEY §5.8, second stage): each device
# owns a contiguous landmark chunk + exactly its residuals (see
# parallel.partition).  V, W columns, rhs_l, and back-substitution are
# shard-local; only pose-space partial sums and the reduced system S cross
# the ICI (one psum).  The reduced solve runs replicated on every device
# inside the shard_map (pose count is small — the same asymmetry the Schur
# trick exploits).
# ---------------------------------------------------------------------------

import jax.numpy as _jnp

from ..solver.assemble import Assembly
from ..solver.linear import solve_reduced as _solve_reduced


def _lm_local_schur(problem_shard, config, colm6, P_n, D, K, Lk, lm, dtype):
    """Shard-local projection-family pieces: compact-width U/rhs partial
    sums + the *local* landmark system (V, W columns, rhs_l)."""
    k = jax.lax.axis_index(AXIS)
    pr = problem_shard.proj
    pr_local = dataclasses.replace(pr, lm=pr.lm - k * Lk)
    p_local = dataclasses.replace(problem_shard, proj=pr_local)
    pb = asm.proj_blocks(p_local, config, colm6, axis_name=AXIS)

    N6 = P_n * 6 + K
    U6, rhs6 = asm._pair_system(
        N6, P_n, 6, dtype, pb.j_m, pb.j_r, pb.pose, pb.ref,
        pr.pair, pr.pair_swap, problem_shard.pidx.pair_a,
        problem_shard.pidx.pair_b, pb.r, j_cal=pb.j_c)

    lm_loc = pr_local.lm.astype(_jnp.int32)
    V_loc = jax.ops.segment_sum(
        _jnp.einsum("nik,nil->nkl", pb.j_l, pb.j_l), lm_loc,
        num_segments=Lk)
    rhs_l_loc = jax.ops.segment_sum(
        _jnp.einsum("nil,ni->nl", pb.j_l, pb.r), lm_loc, num_segments=Lk)

    # local W columns by dense (pose, local-landmark) block segment_sum —
    # collision-free without a localized W-block table
    ids = _jnp.concatenate([pb.pose, pb.ref]) * Lk \
        + _jnp.concatenate([lm_loc, lm_loc])
    blocks = _jnp.concatenate([
        _jnp.einsum("nik,nil->nkl", pb.j_m, pb.j_l),
        _jnp.einsum("nik,nil->nkl", pb.j_r, pb.j_l)], axis=0)
    Wblk = jax.ops.segment_sum(blocks, ids, num_segments=P_n * Lk)
    W6 = Wblk.reshape(P_n, Lk, 6, lm).transpose(0, 2, 1, 3) \
        .reshape(P_n * 6, Lk * lm)
    if K:
        Wc = jax.ops.segment_sum(
            _jnp.einsum("nik,nil->nkl", pb.j_c, pb.j_l), lm_loc,
            num_segments=Lk)
        W6 = _jnp.concatenate(
            [W6, _jnp.transpose(Wc, (1, 0, 2)).reshape(K, Lk * lm)], axis=0)
    return pb, U6, rhs6, V_loc, rhs_l_loc, W6


def _sharded_build_lm(problem: Problem, config: BAConfig, use_imu: bool,
                      mesh: Mesh):
    """Landmark-sharded build + replicated reduced solve.

    Per-device memory for the landmark system is 1/n of the replicated
    design; the only cross-device traffic is the psum of the pose-space
    partial sums (U, rhs, W V^-1 W^T and W V^-1 rhs_l, all (N,)- or
    (N,N)-sized) and the all-gather of the sharded landmark delta.

    Returns (delta_p, delta_l, rhs_p, rhs_l, cost, cauchy_alpha, ok, w).
    """
    D, K, Pn, L, lm, N = asm.dims(problem, config)
    n_dev = mesh.devices.size
    Lk = L // n_dev
    dtype = problem.poses.t.dtype
    cmask = asm.col_mask(problem, config)
    colm = cmask.astype(dtype)
    colm6 = asm.col_mask(problem, config, 6).astype(dtype)

    row = P(AXIS)
    repl = P()

    def rows_except_scalars(table):
        return jax.tree_util.tree_map(
            lambda a: row if a.ndim else repl, table)

    in_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: repl, problem),
        proj=rows_except_scalars(problem.proj),
        unary=rows_except_scalars(problem.unary),
        binary=rows_except_scalars(problem.binary),
        imu=rows_except_scalars(problem.imu),
        lms=rows_except_scalars(problem.lms),
    )

    def local(problem_shard, colm_, colm6_):
        pb, U6, rhs6, V_loc, rhs_l_loc, W6 = _lm_local_schur(
            problem_shard, config, colm6_, Pn, D, K, Lk, lm, dtype)
        prior = asm.prior_contribution(problem_shard, config, colm6_)
        U6 = U6 + prior.U
        rhs6 = rhs6 + prior.rhs_p
        cost_local = pb.cost + prior.cost

        # expand compact width-6 pose system to full width D
        comp = asm.Contribution(U=U6, rhs_p=rhs6, W=W6,
                                V=V_loc, rhs_l=rhs_l_loc.reshape(-1),
                                cost=cost_local)
        full = asm.expand_contribution(comp, Pn, D, K)

        if use_imu:
            ie = _imu_eval(problem_shard, config, True, True)
            full = asm._add(
                full, asm.imu_contribution(problem_shard, config, colm_, ie))

        # local Schur pieces
        from ..utils.linalg import block_diag_inv
        vinv_loc = block_diag_inv(full.V)
        W3 = full.W.reshape(N, Lk, lm)
        WVi = _jnp.einsum("nlk,lkj->nlj", W3, vinv_loc).reshape(N, Lk * lm)
        S_loc = full.U - WVi @ full.W.T
        rhs_sc_loc = full.rhs_p - WVi @ full.rhs_l

        S = jax.lax.psum(S_loc, AXIS)
        rhs_sc = jax.lax.psum(rhs_sc_loc, AXIS)
        rhs_p = jax.lax.psum(full.rhs_p, AXIS)
        cost = jax.lax.psum(full.cost, AXIS)

        # marginalization prior: replicated factor, added once after psum
        marg = asm.marg_contribution(problem_shard, config, colm_)
        S = S + marg.U
        rhs_sc = rhs_sc + marg.rhs_p
        rhs_p = rhs_p + marg.rhs_p
        cost = cost + marg.cost

        # reconstruct the dim mask from the passed colm (closing over
        # jit-level arrays inside shard_map mixes sharding contexts)
        cmask_ = colm_ > 0
        S = S + _jnp.diag(_jnp.where(cmask_, 0.0, 1e6).astype(dtype))
        rhs_sc = _jnp.where(cmask_, rhs_sc, 0.0)

        # replicated reduced solve + shard-local back-substitution
        a_nt = Assembly(S=S, rhs_sc=rhs_sc, U=full.U, rhs_p=rhs_p,
                        W=full.W, V=full.V, vinv=vinv_loc,
                        rhs_l=full.rhs_l, col_mask=cmask_, cost=cost,
                        proj_w=pb.w)
        step = _solve_reduced(a_nt)

        # dogleg Cauchy factor (cpp:857-925): rhs^T H rhs assembled from
        # shard-local pieces (U partials, local W columns, local V blocks),
        # psum'd, plus the replicated marg curvature counted once
        rl = full.rhs_l.reshape(Lk, lm)
        num = _jnp.sum(rhs_p**2) + jax.lax.psum(_jnp.sum(full.rhs_l**2),
                                                AXIS)
        den_loc = (rhs_p @ (full.U @ rhs_p)
                   + 2.0 * rhs_p @ (full.W @ full.rhs_l)
                   + _jnp.einsum("li,lij,lj->", rl, full.V, rl))
        den = jax.lax.psum(den_loc, AXIS) + rhs_p @ (marg.U @ rhs_p)
        alpha = num / _jnp.maximum(den, 1e-30)
        return (step.delta_p, step.delta_l, rhs_p, full.rhs_l, cost,
                alpha, step.ok, pb.w)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(in_specs, repl, repl),
        out_specs=(repl, P(AXIS), repl, P(AXIS), repl, repl, repl,
                   P(AXIS)),
        check_vma=False,
    )(problem, colm, colm6)


def _sharded_build_cg(problem: Problem, config: BAConfig, use_imu: bool,
                      mesh: Mesh):
    """Landmark-sharded build + matrix-free PCG reduced solve, entirely
    inside one shard_map (ROADMAP: CG-in-shard_map).

    vs `_sharded_build_lm`: no dense S (N, N) psum and no per-device
    (N, Lk*lm) W materialization — assembly psums only (N,)-/(P, D, D)-
    sized partials and every CG matvec psums one (N,) vector, so both
    per-device memory AND ICI traffic are O(N + Nr/n) per iteration.
    Same return signature as `_sharded_build_lm`."""
    D, K, Pn, L, lm, N = asm.dims(problem, config)
    n_dev = mesh.devices.size
    Lk = L // n_dev
    dtype = problem.poses.t.dtype
    colm = asm.col_mask(problem, config).astype(dtype)
    colm6 = asm.col_mask(problem, config, 6).astype(dtype)

    from ..solver import cg as cg_mod

    row = P(AXIS)
    repl = P()

    def rows_except_scalars(table):
        return jax.tree_util.tree_map(
            lambda a: row if a.ndim else repl, table)

    in_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: repl, problem),
        proj=rows_except_scalars(problem.proj),
        unary=rows_except_scalars(problem.unary),
        binary=rows_except_scalars(problem.binary),
        imu=rows_except_scalars(problem.imu),
        lms=rows_except_scalars(problem.lms),
    )

    def local(problem_shard, colm_, colm6_):
        k = jax.lax.axis_index(AXIS)
        pr_local = dataclasses.replace(
            problem_shard.proj, lm=problem_shard.proj.lm - k * Lk)
        p_local = dataclasses.replace(problem_shard, proj=pr_local)
        ie = _imu_eval(p_local, config, True, True) if use_imu else None
        bs, marg_H = cg_mod.assemble_blocks(
            p_local, config, ie, axis_name=AXIS, lm_offset=k * Lk)
        step = cg_mod.solve_reduced_cg(bs, marg_H, config, Pn, D, K,
                                       axis_name=AXIS)
        alpha = cg_mod.cauchy_factor(bs, marg_H, Pn, D, K, axis_name=AXIS)
        return (step.delta_p, step.delta_l, bs.rhs_p, bs.rhs_l, bs.cost,
                alpha, step.ok, bs.proj_w)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(in_specs, repl, repl),
        out_specs=(repl, P(AXIS), repl, P(AXIS), repl, repl, repl,
                   P(AXIS)),
        check_vma=False,
    )(problem, colm, colm6)


def _sharded_build_banded(problem: Problem, config: BAConfig,
                          use_imu: bool, mesh: Mesh):
    """Landmark-sharded build + BANDED reduced solve — the long-trajectory
    distribution path (SURVEY §5.7's keyframe-axis scaling).

    vs `_sharded_build_lm`: the ICI carries the (P, B, D, D) *band* of S
    instead of the dense (N, N) matrix — O(P·B·D²) traffic instead of
    O(P²·D²) (at P=2048, D=9, B=16: ~11 MB vs ~1.4 GB per iteration) —
    and no dense S is ever materialized on any device.  Each shard
    segment-sums its residual rows / owned landmarks onto a partial band
    (`band_S` — non-owned W blocks sum to zero so their Schur pairs
    vanish), ONE psum fuses the bands, and the chunked/cyclic-reduction
    factorization + short PCG wrap run replicated (`banded_pcg_solve`).
    Landmark back-substitution stays shard-local.  Same return signature
    as `_sharded_build_lm`."""
    D, K, Pn, L, lm, N = asm.dims(problem, config)
    n_dev = mesh.devices.size
    Lk = L // n_dev
    dtype = problem.poses.t.dtype
    colm = asm.col_mask(problem, config).astype(dtype)
    colm6 = asm.col_mask(problem, config, 6).astype(dtype)

    from ..solver import banded as banded_mod
    from ..solver import cg as cg_mod

    row = P(AXIS)
    repl = P()

    def rows_except_scalars(table):
        return jax.tree_util.tree_map(
            lambda a: row if a.ndim else repl, table)

    in_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: repl, problem),
        proj=rows_except_scalars(problem.proj),
        unary=rows_except_scalars(problem.unary),
        binary=rows_except_scalars(problem.binary),
        imu=rows_except_scalars(problem.imu),
        lms=rows_except_scalars(problem.lms),
    )

    def local(problem_shard, colm_, colm6_):
        k = jax.lax.axis_index(AXIS)
        pr_local = dataclasses.replace(
            problem_shard.proj, lm=problem_shard.proj.lm - k * Lk)
        p_local = dataclasses.replace(problem_shard, proj=pr_local)
        ie = _imu_eval(p_local, config, True, True) if use_imu else None
        bs, _ = cg_mod.assemble_blocks(
            p_local, config, ie, axis_name=AXIS, lm_offset=k * Lk,
            with_precond=False)
        band_part = banded_mod.band_S(p_local, config, bs, Pn, D,
                                      lm_offset=k * Lk, add_identity=False)
        band = jax.lax.psum(band_part, AXIS)
        band = banded_mod.band_add_identity(band, bs.col_mask, Pn, D)
        delta_p, ok = banded_mod.banded_pcg_solve(
            band, bs.rhs_sc, bs.col_mask, config, Pn, D)
        delta_l = cg_mod.back_substitute_blocks(bs, delta_p, Pn, D, 0)
        alpha = cg_mod.cauchy_factor(bs, None, Pn, D, K, axis_name=AXIS)
        return (delta_p, delta_l, bs.rhs_p, bs.rhs_l, bs.cost,
                alpha, ok, bs.proj_w)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(in_specs, repl, repl),
        out_specs=(repl, P(AXIS), repl, P(AXIS), repl, repl, repl,
                   P(AXIS)),
        check_vma=False,
    )(problem, colm, colm6)


def _sharded_build_banded_dense(problem: Problem, config: BAConfig,
                                use_imu: bool, mesh: Mesh):
    """Banded-Schur assembly (ONE band psum) + replicated DENSE Cholesky
    carrying the dense FEJ marginalization prior — the DISTRIBUTED
    sliding-window path (the `schur_on_band` twin of
    `_sharded_build_banded`).

    The prior is a replicated dense (N, N) factor that cannot ride the
    band, so the ICI still carries only the O(P·B·D²) band of the
    residual families' S; the prior joins at the dense stage after the
    psum (`banded.banded_dense_solve`).  Closes the round-4 banded/marg
    mutual exclusion (VERDICT item 5).  Same return signature as
    `_sharded_build_lm`."""
    D, K, Pn, L, lm, N = asm.dims(problem, config)
    n_dev = mesh.devices.size
    Lk = L // n_dev
    dtype = problem.poses.t.dtype
    colm = asm.col_mask(problem, config).astype(dtype)
    colm6 = asm.col_mask(problem, config, 6).astype(dtype)

    from ..solver import banded as banded_mod
    from ..solver import cg as cg_mod

    row = P(AXIS)
    repl = P()

    def rows_except_scalars(table):
        return jax.tree_util.tree_map(
            lambda a: row if a.ndim else repl, table)

    in_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: repl, problem),
        proj=rows_except_scalars(problem.proj),
        unary=rows_except_scalars(problem.unary),
        binary=rows_except_scalars(problem.binary),
        imu=rows_except_scalars(problem.imu),
        lms=rows_except_scalars(problem.lms),
    )

    def local(problem_shard, colm_, colm6_):
        k = jax.lax.axis_index(AXIS)
        pr_local = dataclasses.replace(
            problem_shard.proj, lm=problem_shard.proj.lm - k * Lk)
        p_local = dataclasses.replace(problem_shard, proj=pr_local)
        ie = _imu_eval(p_local, config, True, True) if use_imu else None
        bs, marg_H = cg_mod.assemble_blocks(
            p_local, config, ie, axis_name=AXIS, lm_offset=k * Lk,
            with_precond=False)
        band_part = banded_mod.band_S(p_local, config, bs, Pn, D,
                                      lm_offset=k * Lk, add_identity=False)
        band = jax.lax.psum(band_part, AXIS)
        band = banded_mod.band_add_identity(band, bs.col_mask, Pn, D)
        delta_p, ok = banded_mod.banded_dense_solve(
            band, bs.rhs_sc, bs.col_mask, marg_H)
        delta_l = cg_mod.back_substitute_blocks(bs, delta_p, Pn, D, 0)
        alpha = cg_mod.cauchy_factor(bs, marg_H, Pn, D, K, axis_name=AXIS)
        return (delta_p, delta_l, bs.rhs_p, bs.rhs_l, bs.cost,
                alpha, ok, bs.proj_w)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(in_specs, repl, repl),
        out_specs=(repl, P(AXIS), repl, P(AXIS), repl, repl, repl,
                   P(AXIS)),
        check_vma=False,
    )(problem, colm, colm6)


def _sharded_build(problem, config, use_imu, mesh):
    """Dispatch: banded (use_banded_solver, same static gate as the
    single-device `_build_and_solve`), banded-Schur + dense-with-prior
    (schur_on_band — the distributed sliding window), matrix-free CG
    (use_cg_solver), or dense replicated-S."""
    D, K, Pn, _, _, _ = asm.dims(problem, config)
    banded_ok = (config.use_banded_solver
                 and 0 < config.band_width <= Pn and K == 0
                 and problem.marg.H.shape[0] != Pn * D)
    if banded_ok:
        return _sharded_build_banded(problem, config, use_imu, mesh)
    sob_ok = (config.schur_on_band and not banded_ok
              and 0 < config.band_width <= Pn and K == 0)
    if sob_ok:
        return _sharded_build_banded_dense(problem, config, use_imu, mesh)
    build = _sharded_build_cg if config.use_cg_solver else _sharded_build_lm
    return build(problem, config, use_imu, mesh)


@partial(jax.jit, static_argnames=("config", "use_imu", "mesh",
                                   "gn_damping"))
def sharded_gn_iteration_lm(problem: Problem, config: BAConfig,
                            use_imu: bool, mesh: Mesh,
                            gn_damping: float = 1.0) -> IterResult:
    """Distributed GN iteration with landmark-sharded Schur complement."""
    problem = apply_robust_reweighting(problem, config, use_imu)
    delta_p, delta_l, _, _, cost, _, ok, w = _sharded_build(
        problem, config, use_imu, mesh)

    candidate = apply_update(problem, config, delta_p, delta_l,
                             scale=gn_damping)
    post = _cost(candidate, config, use_imu, w)
    accept = (post <= cost) & ok
    out = jax.tree_util.tree_map(
        lambda x, y: jnp.where(accept, x, y), candidate, problem)
    dn = gn_damping * jnp.sqrt(jnp.sum(delta_p**2) + jnp.sum(delta_l**2))
    # rejected-cost contract: see sharded_gn_iteration / step.py:271-274
    return IterResult(problem=out, pre_cost=cost,
                      post_cost=jnp.where(accept, post, cost),
                      delta_norm=jnp.where(accept, dn, 0.0),
                      accepted=accept,
                      trust_radius=jnp.zeros_like(cost), solver_ok=ok,
                      pre_solve_norm=cost, post_solve_norm=post,
                      inner_trials=jnp.ones((), jnp.int32))


@partial(jax.jit, static_argnames=("config", "use_imu", "mesh"))
def sharded_dogleg_iteration_lm(problem: Problem, config: BAConfig,
                                use_imu: bool, mesh: Mesh,
                                trust_radius) -> IterResult:
    """Distributed dogleg iteration: landmark-sharded build, then the same
    bounded trust-region search as the single-device path (trial costs
    evaluate over the sharded tables under jit's SPMD partitioner)."""
    from ..solver.step import dogleg_search

    problem = apply_robust_reweighting(problem, config, use_imu)
    delta_p, delta_l, rhs_p, rhs_l, cost, alpha, ok, w = _sharded_build(
        problem, config, use_imu, mesh)

    d_gn = jnp.concatenate([delta_p, delta_l])
    d_sd = alpha * jnp.concatenate([rhs_p, rhs_l])
    Np = rhs_p.shape[0]
    radius, accept, d, post, n_trials = dogleg_search(
        problem, config, use_imu, trust_radius, d_gn, d_sd, cost, w, None,
        Np)
    candidate = apply_update(problem, config, d[:Np], d[Np:])
    out = jax.tree_util.tree_map(
        lambda x, y: jnp.where(accept, x, y), candidate, problem)
    dn = jnp.linalg.norm(d)
    return IterResult(problem=out, pre_cost=cost,
                      post_cost=jnp.where(accept, post, cost),
                      delta_norm=jnp.where(accept, dn, 0.0),
                      accepted=accept, trust_radius=radius, solver_ok=ok,
                      pre_solve_norm=cost, post_solve_norm=post,
                      inner_trials=n_trials)


@partial(jax.jit, static_argnames=("config", "use_imu", "mesh", "n_iters",
                                   "gn_damping"))
def sharded_solve_fixed(problem: Problem, config: BAConfig, use_imu: bool,
                        mesh: Mesh, n_iters: int, gn_damping: float = 1.0):
    """Fully-jitted distributed fixed-iteration solve (`lax.scan` over
    landmark-sharded GN/dogleg iterations) — the sharded twin of
    `solver.step.solve_fixed`."""
    trust0 = jnp.asarray(config.trust_region_size, problem.poses.t.dtype)

    def body(carry, _):
        p, trust = carry
        if config.use_dogleg:
            res = sharded_dogleg_iteration_lm(p, config, use_imu, mesh,
                                              trust)
            trust = res.trust_radius
        else:
            res = sharded_gn_iteration_lm(p, config, use_imu, mesh,
                                          gn_damping)
        return (res.problem, trust), (res.post_cost, res.delta_norm)

    (p, _), (costs, dns) = jax.lax.scan(body, (problem, trust0), None,
                                        length=n_iters)
    return p, costs, dns


# ---------------------------------------------------------------------------
# Fleet sharding: independent windows across the mesh
# ---------------------------------------------------------------------------


def fleet_shardings(problems: Problem, mesh: Mesh):
    """NamedSharding pytree for a STACKED fleet (`stack_problems`): every
    leaf sharded on the leading fleet axis — each device owns whole
    windows."""
    row = NamedSharding(mesh, P(AXIS))
    return jax.tree_util.tree_map(lambda _: row, problems)


@partial(jax.jit, static_argnames=("config", "use_imu", "mesh", "n_iters",
                                   "gn_damping"))
def sharded_fleet_solve(problems: Problem, config: BAConfig, use_imu: bool,
                        mesh: Mesh, n_iters: int, gn_damping: float = 1.0):
    """Solve a fleet of B independent windows sharded across the mesh —
    the multi-chip serving configuration: windows never couple, so each
    device runs the whole fixed-iteration solve on its local windows with
    ZERO collectives (perfect scaling by construction; contrast the
    landmark-sharded paths, which psum pose-space partials every
    iteration).  B must be a multiple of the mesh size; robust medians,
    trust regions and exit costs stay per-window (vmap inside the shard).

    No reference analog: the reference is single-problem single-node
    (SURVEY.md §2.4).  Returns per-window (problems, costs, delta_norms)
    like `solver.step.solve_fleet`."""
    from ..solver.step import solve_fixed

    def local(ps):
        return jax.vmap(
            lambda p: solve_fixed(p, config, use_imu, n_iters, gn_damping)
        )(ps)

    return jax.shard_map(local, mesh=mesh, in_specs=P(AXIS),
                         out_specs=P(AXIS), check_vma=False)(problems)


# ---------------------------------------------------------------------------
# Distributed sliding window, fleet form: independent ring pipelines (each
# carrying its own compact FEJ marginalization prior) sharded across the
# mesh — SURVEY §5.7 (fixed-lag) x §5.8 (distribution) combined.
# ---------------------------------------------------------------------------


def stack_ring_schedules(schedules):
    """Stack same-shape RingSchedules along a leading fleet axis.

    Returns (inputs, carry0, rig, g_vec) stacked pytrees for
    `sharded_ring_fleet`.  All schedules must share W / L_w / n_slides and
    padded table shapes (same size bucket)."""
    W, L_w = schedules[0].W, schedules[0].L_w
    assert all(s.W == W and s.L_w == L_w for s in schedules)
    stk = lambda *xs: jnp.stack(xs)                      # noqa: E731
    inputs = jax.tree_util.tree_map(stk, *[s.inputs for s in schedules])
    carry0 = jax.tree_util.tree_map(stk, *[s.carry0 for s in schedules])
    rig = jax.tree_util.tree_map(stk, *[s.rig for s in schedules])
    g_vec = jnp.stack([s.g_vec for s in schedules])
    return inputs, carry0, rig, g_vec


@partial(jax.jit, static_argnames=("config", "use_imu", "mesh",
                                   "iters_per_slide", "W", "L_w"))
def sharded_ring_fleet(inputs, carry0, rig, g_vec, config: BAConfig,
                       use_imu: bool, mesh: Mesh, iters_per_slide: int,
                       W: int, L_w: int):
    """Run B independent ring-buffer fixed-lag pipelines sharded across
    the mesh — the multi-chip SERVING configuration for sliding-window
    VIO: one stream (vehicle/session) per fleet slot, each slide solving
    a compact W-pose window and folding the retiring keyframe into its
    own (W·D)² FEJ prior.  Streams never couple, so each device scans its
    local rings with ZERO collectives (perfect scaling by construction).

    B (leading axis of every input) must be a multiple of the mesh size.
    Returns per-ring (final_carry, outs) like `fixedlag.run_ring`."""
    from ..solver.fixedlag import ring_slide_step

    def one(inp, c0, r, g):
        def slide(c, i):
            return ring_slide_step(c, i, r, g, config, use_imu,
                                   iters_per_slide, W, L_w)

        return jax.lax.scan(slide, c0, inp)

    def local(inp, c0, r, g):
        return jax.vmap(one)(inp, c0, r, g)

    return jax.shard_map(
        local, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
        check_vma=False)(inputs, carry0, rig, g_vec)
