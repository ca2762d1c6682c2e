"""Multi-host (multi-process) distribution glue.

The sharded solver entry points (`shard.sharded_gn_iteration_lm`,
`sharded_dogleg_iteration_lm`, `sharded_solve_fixed`, and the CG-in-
shard_map path) are mesh-agnostic: they take any `jax.sharding.Mesh` and
use only `psum`/`all_gather` over its single axis.  On a multi-host TPU
slice the same code runs unchanged under JAX's multi-controller runtime —
every host runs this module, `jax.devices()` is global, and XLA routes the
psum over ICI within a slice (DCN between slices for multi-slice meshes).

What IS host-specific is data placement: each process must build the
*global* problem arrays from its local shard without materializing the
whole problem on every host.  `global_problem_from_local` does that with
`jax.make_array_from_process_local_data`, matching the
`partition_by_landmark` layout (axis-0 row sharding; each process owns a
contiguous block of rows = its devices' landmark chunks).

Single-process use degenerates to the local path (tested); multi-host
execution needs real hardware (see ROADMAP — 1 chip available here, so
wall-clock scaling efficiency is unmeasured).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import Problem
from .shard import AXIS, problem_shardings


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up JAX's multi-controller runtime (no-op when single-process
    args are all None and the runtime is already initialized)."""
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh() -> Mesh:
    """One-axis mesh over every device of every process."""
    return Mesh(jax.devices(), (AXIS,))


def global_problem_from_local(local_problem: Problem, mesh: Mesh,
                              landmark_sharded: bool = True) -> Problem:
    """Assemble the globally-sharded Problem from per-process local rows.

    `local_problem` must hold this process's slice of every row-sharded
    table (residual rows grouped by owning device via
    `partition_by_landmark` run over the global index space, then sliced
    to the process's chunk) and the full replicated state arrays.  Arrays
    that the sharding spec replicates are passed through as-is (every
    process must supply identical values).
    """
    shardings = problem_shardings(local_problem, mesh,
                                  landmark_sharded=landmark_sharded)
    n_proc = jax.process_count()

    def build(local, sh):
        if not hasattr(local, "ndim") or local.ndim == 0:
            return local
        if isinstance(sh, NamedSharding) and sh.spec == P():
            return jax.device_put(local, sh)
        if n_proc == 1:
            return jax.device_put(local, sh)
        global_shape = (local.shape[0] * n_proc,) + local.shape[1:]
        return jax.make_array_from_process_local_data(sh, local,
                                                      global_shape)

    return jax.tree_util.tree_map(build, local_problem, shardings)
