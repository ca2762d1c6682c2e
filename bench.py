"""Benchmark harness: keyframes optimized per second per chip.

Runs the flagship visual-inertial BA problem (reprojection + IMU
preintegration residuals, Schur-reduced solve) on a simulate_vins-scale
problem (128 keyframes, 512 landmarks, 10 IMU samples per interval) in f32
on one chip, and reports steady-state keyframes/s:

    kf_per_s = n_keyframes * iterations / elapsed

The default run measures BOTH solver configurations and emits ONE JSON
line carrying both numbers (round-4 VERDICT item 6 — the recorded bench
must reflect the library default, not only the faster path):

  * `value` / `vs_baseline` — the DEFAULT config: dogleg trust region
    through `solve_adaptive`, the exact program `solve` dispatches, with
    the reference's exit criteria (cpp:648-661) live;
  * `value_gn` / `vs_baseline_gn` — the GN path as a fixed-25-iteration
    program (the reference app's canonical `slam.Solve(25, 0.2)` call,
    unary_binary_imu_test/main.cpp:283-288).

`vs_baseline*` compares against the recorded single-host CPU (f32, 4-core
XLA:CPU) measurement of the same program — the reference publishes no
numbers of its own (BASELINE.md), so the CPU run of this same workload is
the recorded baseline.

Prints ONE JSON line.
"""

import json
import time

import jax

N_POSES = 128
N_LMS = 512
# 25 GN iterations per solve — the reference app's canonical call.  The
# whole solve is ONE XLA program; a longer solve also amortizes the
# per-program dispatch latency of the remote-TPU tunnel (~23 ms flat,
# measured bench_phases.py) that is absent on directly-attached TPUs.
N_ITERS = 25

# CPU f32 measurements of the same workloads on the 4-core XLA:CPU host
# (see BASELINE.md; re-measure with `python bench.py --cpu [--dogleg]`).
# 2026-08-20 (GN): re-measured after the round-5 per-trial-norm plumbing
# (was 954.7 on 2026-08-18; 300 at round 1's dense assembly).
CPU_BASELINE_KF_S = 1018.8
# 2026-08-20 (dogleg default config through solve_adaptive, ~6 adaptive
# iterations to the exit criteria; measured, same host).
CPU_BASELINE_KF_S_DOGLEG = 966.0


def build(use_dogleg=False):
    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=use_dogleg)
    sim = sv.simulate(n_poses=N_POSES, n_lms=N_LMS, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1)
    # banded-grid assembly fast path (numerically identical to the dense
    # scatter path — tests/test_banded.py — and ~1.7x faster here)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem))
    if jax.config.jax_enable_x64 is False:
        problem = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, problem)
    problem = prepare_landmarks(problem, cfg)
    return problem, cfg


def _measure(use_dogleg):
    """kf/s for one solver configuration (warmup + timed run)."""
    from ba_tpu.solver.step import solve_adaptive, solve_fixed

    problem, cfg = build(use_dogleg)
    if use_dogleg:
        # the adaptive program `solve` dispatches: a fixed-iteration
        # dogleg program would keep grinding 2-3 rejected trust-region
        # trials per iteration at the f32 cost floor, work the
        # reference's own `Solve(25)` never does (it exits on the
        # relative-error-change test).  kf/s counts the iterations the
        # adaptive loop actually executed.
        p, stats = solve_adaptive(problem, cfg, True, N_ITERS)  # warmup
        jax.block_until_ready(p.poses.t)
        t0 = time.perf_counter()
        p, stats = solve_adaptive(problem, cfg, True, N_ITERS)
        jax.block_until_ready(p.poses.t)
        elapsed = time.perf_counter() - t0
        iters_done = int(stats["iterations"])
        return N_POSES * iters_done / elapsed
    out = solve_fixed(problem, cfg, True, N_ITERS)  # warmup / compile
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = solve_fixed(problem, cfg, True, N_ITERS)
    jax.block_until_ready(out[1])
    elapsed = time.perf_counter() - t0
    return N_POSES * N_ITERS / elapsed


def main(platform=None, mode="both"):
    """mode: 'both' (default driver run — one JSON line with the default
    dogleg number as `value` and the GN number as `value_gn`), 'gn' or
    'dogleg' for targeted single-config runs."""
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if mode == "gn":
        kf = _measure(False)
        out = {"metric": "vi_ba_keyframes_per_s_per_chip_gn",
               "value": round(kf, 2), "unit": "keyframes/s",
               "vs_baseline": round(kf / CPU_BASELINE_KF_S, 3)}
    elif mode == "dogleg":
        kf = _measure(True)
        out = {"metric": "vi_ba_keyframes_per_s_per_chip_dogleg",
               "value": round(kf, 2), "unit": "keyframes/s",
               "vs_baseline": round(kf / CPU_BASELINE_KF_S_DOGLEG, 3)}
    else:
        kf_dl = _measure(True)
        kf_gn = _measure(False)
        out = {
            "metric": "vi_ba_keyframes_per_s_per_chip",
            "value": round(kf_dl, 2),          # library-default dogleg
            "unit": "keyframes/s",
            "vs_baseline": round(kf_dl / CPU_BASELINE_KF_S_DOGLEG, 3),
            "value_gn": round(kf_gn, 2),       # reference-app Solve(25,.2)
            "vs_baseline_gn": round(kf_gn / CPU_BASELINE_KF_S, 3),
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import sys

    mode = "both"
    if "--dogleg" in sys.argv:
        mode = "dogleg"
    elif "--gn" in sys.argv:
        mode = "gn"
    main(platform="cpu" if "--cpu" in sys.argv else None, mode=mode)
