"""Sliding-window (fixed-lag) VINS throughput: keyframes marginalized/s.

BASELINE config 4's measurable: the online-odometry pipeline — per new
keyframe, re-solve the window (GN iterations) and marginalize the oldest
pose into the dense FEJ prior — fully jitted as ONE XLA program per slide
step (solve_fixed + apply_marginalization are both pure jax), scanned over
the trajectory.  Reports steady-state slides (keyframes retired) per
second.  The reference has no analogous pipeline (its library only offers
conditioning edges; marginalization lives in matlab/marginalization.py).

Usage: python bench_window.py [--cpu] [--poses 64] [--iters-per-slide 2]
"""

import argparse
import json
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--poses", type=int, default=64,
                    help="total trajectory length (window slides across)")
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--lms", type=int, default=256)
    ap.add_argument("--iters-per-slide", type=int, default=2)
    ap.add_argument("--vehicles", type=int, default=1,
                    help="vmap the whole pipeline over B independent "
                         "trajectories (fleet VIO serving).  Measured "
                         "2026-08-20: the full-problem slide step is "
                         "REAL-work bound (costs scale ~linearly with "
                         "B), so vmap does not amortize it — use --ring")
    ap.add_argument("--ring", action="store_true",
                    help="ring-buffer compact window (solver/fixedlag): "
                         "O(window) work per slide instead of "
                         "O(trajectory); the fix for the full-problem "
                         "pipeline evaluating every pose's rows per "
                         "slide")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import window as window_mod
    from ba_tpu.solver.step import solve_fixed

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=args.poses, n_lms=args.lms, seed=7)
    vehicles = []
    for v in range(args.vehicles):
        p, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=8 + v)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32) if a.dtype == np.float64 else a,
            p)
        vehicles.append(prepare_landmarks(p, cfg))
    problem = vehicles[0]
    P = int(problem.poses.q.shape[0])
    n_slides = args.poses - args.window

    def pipeline(problem):
        def slide(p, k):
            p, costs, _ = solve_fixed(p, cfg, True, args.iters_per_slide)
            drop = jnp.arange(P) == k
            p = window_mod.apply_marginalization(p, cfg, True, drop)
            return p, costs[-1]

        return jax.lax.scan(slide, problem, jnp.arange(n_slides))

    if args.ring:
        from ba_tpu.solver import fixedlag

        scheds = [fixedlag.build_ring_schedule(v, cfg, args.window)
                  for v in vehicles]

        def run_ring_all(_ignored=None):
            outs = [fixedlag.run_ring(s, cfg, True, args.iters_per_slide)
                    for s in scheds]
            return None, jnp.stack([o["cost"] for _, o in outs])

        run = run_ring_all          # run_ring jits internally
        problem = None
    elif args.vehicles > 1:
        from ba_tpu.core.problem import stack_problems

        problem = stack_problems(vehicles)
        run = jax.jit(jax.vmap(pipeline))
    else:
        run = jax.jit(pipeline)

    out = run(problem)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = run(problem)
    jax.block_until_ready(out[1])
    elapsed = time.perf_counter() - t0
    final_costs = np.asarray(out[1])

    print(json.dumps({
        "metric": ("fixed_lag_slides_per_s_ring" if args.ring
                   else "fixed_lag_slides_per_s"),
        "value": round(args.vehicles * n_slides / elapsed, 2),
        "unit": "keyframes/s",
        "window": args.window,
        "vehicles": args.vehicles,
        "iters_per_slide": args.iters_per_slide,
        "final_cost_last_window": float(final_costs.reshape(-1)[-1]),
    }))


if __name__ == "__main__":
    main()
