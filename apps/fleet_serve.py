#!/usr/bin/env python
"""Fleet serving demo: many vehicles' sliding windows on one program.

The production multi-window configuration measured in BASELINE.md: B
independent 128-keyframe VI windows (one per vehicle) are fused into ONE
block-diagonal problem (`concat_problems`) and solved by the fleet-batched
banded pipeline (`BAConfig.fleet_size` -> per-window batched dense Schur +
batched Cholesky).  At B=2-4 this beats solving the windows sequentially
(39.5k vs 34.1k keyframes/s on a v5e chip); larger fleets shard whole
windows across a device mesh with zero collectives
(`parallel.shard.sharded_fleet_solve`).

No reference analog: the reference is single-problem single-node
(SURVEY.md §2.4).

Usage:
    python apps/fleet_serve.py --vehicles 4 --poses 64 --iters 10
    python apps/fleet_serve.py --vehicles 8 --mesh 8   # sharded fleet
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vehicles", type=int, default=4)
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--lms", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard whole windows over an N-device mesh "
                         "(0 = single device, fused fleet)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu or args.mesh:
        import os

        if args.mesh:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.mesh}")
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_enable_x64", False)

    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import (BAConfig, concat_problems,
                                     prepare_landmarks, stack_problems)
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of
    from ba_tpu.solver.step import solve_fixed

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    # one scene geometry shared across vehicles (same padded shapes, the
    # size-bucket requirement of stack/concat), different perturbations
    sim = sv.simulate(n_poses=args.poses, n_lms=args.lms, seed=0)
    windows = []
    for v in range(args.vehicles):
        p, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=100 + v)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, p)
        windows.append(p)

    if args.mesh:
        from ba_tpu.parallel import shard

        if args.vehicles % args.mesh:
            ap.error("--vehicles must be a multiple of --mesh")
        mesh = shard.make_mesh(args.mesh)
        batched = stack_problems(
            [prepare_landmarks(p, cfg) for p in windows])
        batched = jax.device_put(batched,
                                 shard.fleet_shardings(batched, mesh))

        def run():
            _, costs, _ = shard.sharded_fleet_solve(
                batched, cfg, True, mesh, args.iters)
            return costs

        finals_of = lambda c: np.asarray(c)[:, -1]  # noqa: E731
        mode = f"sharded over {args.mesh} devices"
    else:
        fused = concat_problems(windows, cfg)
        cfg_f = dataclasses.replace(
            cfg, band_width=band_width_of(fused),
            use_banded_solver=True, fleet_size=args.vehicles)
        fused_p = prepare_landmarks(fused, cfg_f)

        def run():
            _, costs, _ = solve_fixed(fused_p, cfg_f, True, args.iters)
            return costs

        finals_of = lambda c: np.asarray(c)[-1:]  # noqa: E731
        mode = "fused on one device"

    costs = run()                     # warmup/compile
    jax.block_until_ready(costs)
    t0 = time.perf_counter()
    costs = run()
    jax.block_until_ready(costs)
    dt = time.perf_counter() - t0
    finals = finals_of(costs)

    kf_s = args.vehicles * args.poses * args.iters / dt
    print(f"fleet of {args.vehicles} x {args.poses}-kf windows ({mode}): "
          f"{dt * 1e3:.1f} ms steady-state, {kf_s:.0f} keyframes/s; "
          f"final cost(s) {finals.min():.3e}..{finals.max():.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
