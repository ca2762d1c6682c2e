#!/usr/bin/env python
"""Sliding-window VINS demo: fixed-lag smoothing with marginalization.

BASELINE config 4 at demo scale: stream keyframes from a simulate_vins
sequence through a fixed-size window; each step solves the window, then
marginalizes the oldest pose into the dense prior.  Reports per-window solve
time and final ATE against ground truth.

    python apps/vins_window.py --poses 40 --window 10
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=24)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--lms", type=int, default=120)
    ap.add_argument("--perturb", type=float, default=0.02)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--ring", action="store_true",
                    help="ring-buffer compact window (solver/fixedlag): "
                         "O(window) per slide, one XLA program for the "
                         "whole trajectory; prints the retired-keyframe "
                         "trajectory ATE")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ba_tpu.core.problem import BAConfig
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import step as step_mod
    from ba_tpu.solver import window as window_mod
    from ba_tpu.utils import timing

    import dataclasses

    from ba_tpu.solver.assemble import band_width_of

    sim = sv.simulate(n_poses=args.poses, n_lms=args.lms, seed=7)
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False,
                   error_change_threshold=1e-4, param_change_threshold=1e-6)
    problem, pose_ids, _ = sv.build_problem(sim, cfg, perturb=args.perturb,
                                            seed=8)
    # banded-grid assembly fast path (host-side, structure is static)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem))
    P = problem.poses.q.shape[0]

    if args.ring:
        from ba_tpu.core.problem import prepare_landmarks
        from ba_tpu.solver import fixedlag

        cfg_r = dataclasses.replace(cfg, band_width=0)  # compact: dense
        pr = prepare_landmarks(problem, cfg_r)
        with timing.span("build_schedule"):
            sched = fixedlag.build_ring_schedule(pr, cfg_r, args.window)
        run = lambda: fixedlag.run_ring(sched, cfg_r, True, 2)  # noqa: E731
        with timing.span("compile+first_run"):
            _, outs = run()
            jax.block_until_ready(outs["cost"])
        t0 = time.perf_counter()
        _, outs = run()
        jax.block_until_ready(outs["cost"])
        dt = time.perf_counter() - t0
        n = sched.n_slides
        t_est = np.asarray(outs["t"])
        ate = sv.ate(None, t_est, None, sim.t_wv[:n])
        print(f"ring: {n} keyframes retired in {dt * 1e3:.1f} ms "
              f"({n / dt:.1f}/s); retired-trajectory ATE: "
              f"{ate * 100:.3f} cm; last window cost "
              f"{float(outs['cost'][-1]):.4g}")
        print(timing.report())
        return 0

    p = problem
    n_marg = args.poses - args.window
    for k in range(2, 2 + n_marg):
        with timing.span("window_solve"):
            p, summ = step_mod.solve(p, cfg, max_iter=6, use_imu=True)
        with timing.span("marginalize"):
            p = window_mod.apply_marginalization(
                p, cfg, True, jnp.zeros(P, bool).at[k].set(True))
        n_active = int(np.asarray(p.poses.active).sum())
        print(f"step {k - 1:3d}: cost {summ.final_cost:10.4g}  "
              f"active poses {n_active}")
    with timing.span("window_solve"):
        p, summ = step_mod.solve(p, cfg, max_iter=10, use_imu=True)

    sl = slice(2 + n_marg, args.poses)
    ate = sv.ate(None, np.asarray(p.poses.t[sl]), None, sim.t_wv[sl])
    print(f"final window cost {summ.final_cost:.4g}; "
          f"ATE over window poses: {ate * 100:.3f} cm")
    print(timing.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
