"""One process of the 2-process multi-controller test (test_multihost.py).

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the parent) and
its half of the landmark-sharded problem rows; gloo carries the
cross-process collectives.  Process 0 writes the replicated per-iteration
costs to `out_path` as JSON.

Usage: python multihost_worker.py <process_id> <num_processes> \
           <coordinator_addr> <out_path>
"""

import dataclasses
import json
import sys


def main():
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    coord = sys.argv[3]
    out_path = sys.argv[4]

    import jax

    # the axon TPU plugin overrides the JAX_PLATFORMS env var; force CPU
    # via config before any backend initialization (same as conftest)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_proc, process_id=proc_id)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.parallel import multihost, shard
    from ba_tpu.parallel.partition import partition_by_landmark

    n_dev = jax.device_count()          # global, across processes
    assert jax.process_count() == n_proc

    # every process builds the same problem deterministically, then keeps
    # only its own rows (stand-in for per-process data loading)
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=8, n_lms=24, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1,
                                     pad_multiple=n_dev)
    problem = prepare_landmarks(problem, cfg)
    problem = partition_by_landmark(problem, cfg, n_dev)

    mesh = multihost.make_global_mesh()
    shardings = shard.problem_shardings(problem, mesh, landmark_sharded=True)

    def slice_local(a, sh):
        if not hasattr(a, "ndim") or a.ndim == 0:
            return a
        if isinstance(sh, NamedSharding) and sh.spec == P():
            return a
        chunk = a.shape[0] // n_proc
        return np.asarray(a)[proc_id * chunk:(proc_id + 1) * chunk]

    local = jax.tree_util.tree_map(slice_local, problem, shardings)
    gproblem = multihost.global_problem_from_local(local, mesh)

    _, costs, _ = shard.sharded_solve_fixed(gproblem, cfg, True, mesh, 3)
    costs = np.asarray(jax.device_get(costs))

    if proc_id == 0:
        with open(out_path, "w") as f:
            json.dump({"costs": costs.tolist(), "n_devices": n_dev,
                       "n_processes": n_proc}, f)
    # make sure everyone finished before any process exits (exiting tears
    # down the coordination service)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
