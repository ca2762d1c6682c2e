"""Fleet throughput: B independent flagship windows batched in ONE program.

The single-window flagship iteration is dispatch-latency-bound (see the
roofline in BASELINE.md: ~89 MFLOP / 80 MB per GN iteration — ~0.1 ms of
HBM traffic spread over ~2.7 ms of small-kernel launches), so batching
independent sliding windows (one per vehicle) via `solve_fleet` amortizes
every launch across the batch.  This measures aggregate keyframes/s at
batch sizes 1..16.

Usage: python bench_fleet.py [--cpu] [--batches 1,2,4,8,16]
"""

import argparse
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import (BAConfig, prepare_landmarks,
                                     stack_problems)
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of
    from ba_tpu.solver.step import solve_fleet

    N_POSES, N_LMS = 128, 512
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=N_POSES, n_lms=N_LMS, seed=0)

    batches = [int(b) for b in args.batches.split(",")]
    problems = []
    for seed in range(max(batches)):
        p, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1 + seed)
        if seed == 0:
            cfg = dataclasses.replace(cfg, band_width=band_width_of(p))
        p = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, p)
        problems.append(prepare_landmarks(p, cfg))

    print(f"flagship window P={N_POSES} L={N_LMS}, {args.iters} GN "
          f"iterations, f32, device={jax.devices()[0].device_kind!r}")
    for B in batches:
        batched = stack_problems(problems[:B])
        out = solve_fleet(batched, cfg, True, args.iters)
        jax.block_until_ready(out[1])
        costs = np.asarray(out[1])
        t0 = time.perf_counter()
        out = solve_fleet(batched, cfg, True, args.iters)
        jax.block_until_ready(out[1])
        dt = time.perf_counter() - t0
        kf_s = B * N_POSES * args.iters / dt
        print(f"  B={B:3d}  {dt * 1e3:8.1f} ms  {kf_s:10.0f} kf/s  "
              f"({kf_s / B:7.0f} per window; final costs "
              f"{costs[:, -1].min():.3e}..{costs[:, -1].max():.3e})")


if __name__ == "__main__":
    main()
