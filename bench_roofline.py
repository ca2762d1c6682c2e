"""Roofline + per-op trace at the performance frontier (round-5 VERDICT
item 4): the long-trajectory bandsolve (P = 2048 / 4096) and the concat
fleet (B = 4) — the regimes where the chip should shine.

For each configuration: wall-clock one full GN iteration, pull XLA cost
analysis (flops / bytes), derive MFU and HBM utilization, and print the
top HLO ops by device self-time from an xplane trace.

Usage:
    python bench_roofline.py --what band --poses 2048
    python bench_roofline.py --what band --poses 4096
    python bench_roofline.py --what fleet --B 4
"""

import argparse
import time

import jax

# v5e peaks (same convention as bench_phases/BASELINE.md): 197 TFLOP/s
# bf16 MXU, 819 GB/s HBM.
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def build_band(n_poses, n_lms):
    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1,
                                     with_marg_prior=False)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem),
                              use_banded_solver=True)
    problem = jax.tree_util.tree_map(
        lambda a: a.astype(np.float32)
        if a.dtype == np.float64 else a, problem)
    return prepare_landmarks(problem, cfg), cfg


def build_fleet(B, n_poses=128, n_lms=512):
    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import (BAConfig, concat_problems,
                                     prepare_landmarks)
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=0)
    raw = []
    for seed in range(B):
        p, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1 + seed)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, p)
        raw.append(p)
    fused = concat_problems(raw, cfg)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(fused),
                              use_banded_solver=True, fleet_size=B)
    return prepare_landmarks(fused, cfg), cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="band", choices=["band", "fleet"])
    ap.add_argument("--poses", type=int, default=2048)
    ap.add_argument("--lms", type=int, default=0)
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--trace", action="store_true", default=True)
    ap.add_argument("--no-trace", dest="trace", action="store_false")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ba_tpu.solver import step as step_mod

    if args.what == "band":
        n_lms = args.lms or args.poses * 4
        problem, cfg = build_band(args.poses, n_lms)
        label = f"bandsolve P={args.poses} L={n_lms}"
        n_kf = args.poses
    else:
        problem, cfg = build_fleet(args.B)
        label = f"concat fleet B={args.B} (128 kf / 512 lms per window)"
        n_kf = args.B * 128

    fn = jax.jit(
        lambda p: step_mod.gn_iteration(p, cfg, True, 1.0, False)
        .post_cost)
    lowered = fn.lower(problem)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    out = fn(problem)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(problem)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3

    mfu = flops / (ms / 1e3) / PEAK_FLOPS
    hbm = byts / (ms / 1e3) / PEAK_BW
    sol_ms = max(flops / PEAK_FLOPS, byts / PEAK_BW) * 1e3
    print(f"{label}: {ms:.2f} ms/GN-iter  ({n_kf / (ms / 1e3):.0f} "
          f"keyframe-iters/s)")
    print(f"  XLA cost analysis: {flops / 1e9:.2f} GFLOP, "
          f"{byts / 1e9:.2f} GB accessed, "
          f"AI {flops / max(byts, 1):.2f} flop/byte")
    print(f"  MFU {mfu * 100:.2f}%  HBM {hbm * 100:.1f}%  "
          f"speed-of-light {sol_ms:.3f} ms  (off by "
          f"{ms / max(sol_ms, 1e-9):.1f}x)")

    if args.trace:
        import tempfile

        from bench_trace import capture, top_ops

        logdir = tempfile.mkdtemp(prefix="baroof_")
        capture(fn, problem, logdir=logdir)
        top_ops(logdir, args.k)


if __name__ == "__main__":
    main()
