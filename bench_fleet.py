"""Fleet throughput: B independent flagship windows batched in ONE program.

The single-window flagship iteration is dispatch-latency-bound (see the
roofline in BASELINE.md: ~89 MFLOP / 80 MB per GN iteration — ~0.1 ms of
HBM traffic spread over ~2.7 ms of small-kernel launches), so batching
independent sliding windows (one per vehicle) amortizes every launch
across the batch.  Two batching layouts are measured:

  * `vmap`:   solve_fleet = vmap(solve_fixed) over stacked problems —
              measured round 2 to LOSE (batched gathers/scatters and
              batched Cholesky lower worse than rank-1; BASELINE.md).
  * `concat`: concat_problems block-diagonal fusion — offset pose/landmark
              ids, ONE flat problem, banded assembly + the fleet-batched
              chunked band factorization (BAConfig.fleet_size): rank-1
              gathers/segment-sums, sequential factor depth of one window.

Usage: python bench_fleet.py [--cpu] [--batches 1,2,4,8,16] [--mode both]
"""

import argparse
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--mode", default="both",
                    choices=["both", "vmap", "concat"])
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import (BAConfig, concat_problems,
                                     prepare_landmarks, stack_problems)
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of
    from ba_tpu.solver.step import solve_fixed, solve_fleet

    N_POSES, N_LMS = 128, 512
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=N_POSES, n_lms=N_LMS, seed=0)

    batches = [int(b) for b in args.batches.split(",")]
    raw = []
    for seed in range(max(batches)):
        p, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1 + seed)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, p)
        raw.append(p)
    bw = band_width_of(raw[0])
    cfg = dataclasses.replace(cfg, band_width=bw)

    def timed(fn, *a):
        out = fn(*a)                      # warmup/compile
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out[1])
        return time.perf_counter() - t0, out

    print(f"flagship window P={N_POSES} L={N_LMS}, {args.iters} GN "
          f"iterations, f32, device={jax.devices()[0].device_kind!r}, "
          f"band_width={bw}")
    results = {}
    for B in batches:
        if args.mode in ("both", "vmap"):
            problems = [prepare_landmarks(p, cfg) for p in raw[:B]]
            batched = stack_problems(problems)
            dt, out = timed(
                lambda b_: solve_fleet(b_, cfg, True, args.iters), batched)
            costs = np.asarray(out[1])
            kf_s = B * N_POSES * args.iters / dt
            results[("vmap", B)] = kf_s
            print(f"  vmap   B={B:3d}  {dt * 1e3:8.1f} ms  "
                  f"{kf_s:10.0f} kf/s  (final costs "
                  f"{costs[:, -1].min():.3e}..{costs[:, -1].max():.3e})")
        if args.mode in ("both", "concat"):
            fused = concat_problems(raw[:B], cfg)
            cfg_f = dataclasses.replace(
                cfg, band_width=band_width_of(fused),
                use_banded_solver=True, fleet_size=B)
            fused = prepare_landmarks(fused, cfg_f)
            dt, out = timed(
                lambda f_: solve_fixed(f_, cfg_f, True, args.iters), fused)
            costs = np.asarray(out[1])
            kf_s = B * N_POSES * args.iters / dt
            results[("concat", B)] = kf_s
            print(f"  concat B={B:3d}  {dt * 1e3:8.1f} ms  "
                  f"{kf_s:10.0f} kf/s  (fused final cost "
                  f"{costs[-1]:.3e})")
    return results


if __name__ == "__main__":
    main()
