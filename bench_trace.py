"""Capture a device trace of the fused-fleet GN iteration and print the
top HLO ops by self-time (parsed from the xplane via
tensorboard_plugin_profile) — the op-granularity view the roofline says we
are losing 27x to.

Usage: python bench_trace.py [--B 8] [--what iter|band|blocks]
"""

import argparse
import glob


import os
import tempfile
from collections import defaultdict

import jax


def capture(fn, *args, logdir):
    out = fn(*args)                  # compile outside the trace
    jax.block_until_ready(out)
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


def top_ops(logdir, k=30, reps=5):
    """Aggregate device-side XLA op self-times from the captured xplane
    (parsed directly with the TF xplane proto — the tensorboard plugin's
    converter is version-incompatible in this image)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2 as xp

    xs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                   recursive=True)
    space = xp.XSpace()
    with open(xs[0], "rb") as fh:
        space.ParseFromString(fh.read())
    total = defaultdict(float)
    count = defaultdict(int)
    grand = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                name = meta[e.metadata_id].name
                key = (name.split(" = ")[-1][:95] if " = " in name
                       else name[:95])
                total[key] += e.duration_ps / 1e6
                count[key] += 1
                grand += e.duration_ps / 1e6
    print(f"XLA-Ops total {grand / reps / 1000:.2f} ms/rep")
    for name, us in sorted(total.items(), key=lambda kv: -kv[1])[:k]:
        print(f"  {us / reps:8.1f} us n={count[name] / reps:6.1f}  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--what", default="iter",
                    choices=["iter", "band", "blocks", "cost"])
    ap.add_argument("--k", type=int, default=30)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import (BAConfig, concat_problems,
                                     prepare_landmarks)
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import banded as banded_mod
    from ba_tpu.solver import cg as cg_mod
    from ba_tpu.solver import step as step_mod
    from ba_tpu.solver.assemble import band_width_of, dims

    N_POSES, N_LMS = 128, 512
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=N_POSES, n_lms=N_LMS, seed=0)
    raw = []
    for seed in range(args.B):
        p, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1 + seed)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, p)
        raw.append(p)
    fused = concat_problems(raw, cfg) if args.B > 1 else raw[0]
    cfg = dataclasses.replace(cfg, band_width=band_width_of(fused),
                              use_banded_solver=True, fleet_size=args.B)
    problem = prepare_landmarks(fused, cfg)
    D, K, P, L, lm, N = dims(problem, cfg)

    from ba_tpu.core.residuals import imu as imu_mod

    if args.what == "iter":
        fn = jax.jit(
            lambda p: step_mod.gn_iteration(p, cfg, True, 1.0, False)
            .post_cost)
        fnargs = (problem,)
    elif args.what == "blocks":
        def blocks(p):
            ie = imu_mod.evaluate(p, cfg, with_jacobians=True)
            bs, _ = cg_mod.assemble_blocks(p, cfg, ie, with_precond=False)
            return bs
        fn = jax.jit(blocks)
        fnargs = (problem,)
    elif args.what == "cost":
        fn = jax.jit(lambda p: step_mod._cost(p, cfg, True))
        fnargs = (problem,)
    else:
        ie = imu_mod.evaluate(problem, cfg, with_jacobians=True)
        bs, _ = cg_mod.assemble_blocks(problem, cfg, ie,
                                       with_precond=False)
        fn = jax.jit(lambda b: banded_mod.band_S(problem, cfg, b, P, D))
        fnargs = (bs,)

    logdir = tempfile.mkdtemp(prefix="batrace_")
    capture(fn, *fnargs, logdir=logdir)
    top_ops(logdir, args.k)


if __name__ == "__main__":
    main()
