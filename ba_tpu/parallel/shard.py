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
from ..solver.step import IterResult, _cost, _imu_eval, apply_update
from ..solver.linear import solve_reduced

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def problem_shardings(problem: Problem, mesh: Mesh):
    """NamedSharding pytree for `jax.device_put`: residual tables sharded on
    axis 0, states replicated."""
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(AXIS))
    return dataclasses.replace(
        jax.tree_util.tree_map(lambda _: repl, problem),
        proj=jax.tree_util.tree_map(lambda _: row, problem.proj),
        unary=jax.tree_util.tree_map(lambda _: row, problem.unary),
        binary=jax.tree_util.tree_map(lambda _: row, problem.binary),
        imu=jax.tree_util.tree_map(lambda _: row, problem.imu),
    )


def sharded_assemble(problem: Problem, config: BAConfig, use_imu: bool,
                     mesh: Mesh):
    """Assembly with residual-sharded partial sums + psum, inside shard_map."""
    D, K, Pn, L, lm, N = asm.dims(problem, config)
    cmask = asm.col_mask(problem, config)
    colm = cmask.astype(problem.poses.t.dtype)
    colm6 = asm.col_mask(problem, config, 6).astype(problem.poses.t.dtype)

    in_specs = dataclasses.replace(
        jax.tree_util.tree_map(lambda _: P(), problem),
        proj=jax.tree_util.tree_map(lambda _: P(AXIS), problem.proj),
        unary=jax.tree_util.tree_map(lambda _: P(AXIS), problem.unary),
        binary=jax.tree_util.tree_map(lambda _: P(AXIS), problem.binary),
        imu=jax.tree_util.tree_map(lambda _: P(AXIS), problem.imu),
    )

    def local(problem_shard, colm_, colm6_):
        comp, w = asm.proj_contribution(problem_shard, config, colm6_)
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
    return IterResult(problem=out, pre_cost=a.cost, post_cost=post,
                      delta_norm=dn, accepted=accept,
                      trust_radius=jnp.zeros_like(a.cost))
