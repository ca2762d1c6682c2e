#!/usr/bin/env python
"""Online streaming VINS demo: one keyframe in, one estimate out.

The production serving shape (reference incremental pattern, `f_gps` in
applications/unary_binary_imu_test/main.cpp:141-219): keyframes + their
measurements arrive one at a time through `StreamingRing.add_*`, each
`push()` solves the compact W-pose window on a resident compiled slide
program and emits the retired keyframe's post-solve estimate.  Reports
warm-up (compile) time, steady-state keyframes retired/s, and the
retired-trajectory ATE against ground truth.

    python apps/vins_stream.py --poses 64 --window 8
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def stream_sequence(problem, cfg, W, iters, caps, warm_drop=1):
    """Drive a built problem's data through a StreamingRing keyframe by
    keyframe.  Returns (outs, elapsed_steady, n_steady).

    `warm_drop` >= 1 pushes are drained (compile) before the steady-state
    timer starts; 0 would silently fold compile time into the rate."""
    assert warm_drop >= 1
    import jax

    from ba_tpu.solver.streaming import StreamingRing

    po, lm, pr, imu = problem.poses, problem.lms, problem.proj, problem.imu
    P = int(po.q.shape[0])
    ref = np.asarray(lm.ref_pose)
    act = np.asarray(lm.active)
    prv, prp = np.asarray(pr.valid), np.asarray(pr.pose)
    prl = np.asarray(pr.lm)
    iv, ip1 = np.asarray(imu.valid), np.asarray(imu.pose1)
    po_np = {f: np.asarray(getattr(po, f))
             for f in ("q", "t", "v", "b", "time", "mask")}
    lm_np = {f: np.asarray(getattr(lm, f))
             for f in ("x_w", "ref_cam", "z_ref", "has_z_ref")}
    pr_np = {f: np.asarray(getattr(pr, f))
             for f in ("z", "cam", "weight", "cond")}
    imu_np = {f: np.asarray(getattr(imu, f))
              for f in ("w", "a", "time", "meas_valid")}

    ring = StreamingRing(cfg, W, problem.rig, problem.g_vec, caps,
                         use_imu=True, iters_per_slide=iters)
    outs = []
    t_steady = 0.0
    n_steady = 0
    t0 = time.perf_counter()
    for g in range(P):
        ring.add_pose(po_np["q"][g], po_np["t"][g], po_np["v"][g],
                      po_np["b"][g], float(po_np["time"][g]),
                      po_np["mask"][g])
        for lid in np.where(act & (ref == g))[0]:
            z_ref = (lm_np["z_ref"][lid]
                     if bool(lm_np["has_z_ref"][lid]) else None)
            ring.add_landmark(lm_np["x_w"][lid], g,
                              int(lm_np["ref_cam"][lid]), z_ref=z_ref)
        for r in np.where(prv & (prp == g))[0]:
            ring.add_projection(pr_np["z"][r], g, int(prl[r]),
                                int(pr_np["cam"][r]),
                                float(pr_np["weight"][r]),
                                bool(pr_np["cond"][r]))
        if g >= 1:
            for r in np.where(iv & (ip1 == g - 1))[0]:
                n = int(imu_np["meas_valid"][r].sum())
                ring.add_imu(g - 1, g, imu_np["w"][r][:n],
                             imu_np["a"][r][:n], imu_np["time"][r][:n])
        out = ring.push(block=False)   # pipelined: no per-push sync
        if out is not None:
            outs.append(out)
            if len(outs) == warm_drop:
                # drain the warm-up (compile) pushes before timing
                jax.block_until_ready(ring._carry[1])
                t0 = time.perf_counter()
            if len(outs) > warm_drop:
                n_steady += 1
    if n_steady:
        jax.block_until_ready(ring._carry[1])
        t_steady = time.perf_counter() - t0
    outs = jax.device_get(outs)
    return outs, t_steady, n_steady


def stream_many(problems, cfg, W, iters, caps, warm_drop=1):
    """Round-robin M independent streams (one ring each, SHARING the one
    resident compiled slide program) — the multi-stream serving shape.
    Returns (per-stream outs, steady seconds, keyframes retired)."""
    import jax

    from ba_tpu.solver.streaming import StreamingRing

    M = len(problems)
    feeds = []
    rings = []
    for pb in problems:
        po, lm, pr, imu = pb.poses, pb.lms, pb.proj, pb.imu
        feeds.append(dict(
            po={f: np.asarray(getattr(po, f))
                for f in ("q", "t", "v", "b", "time", "mask")},
            lm={f: np.asarray(getattr(lm, f))
                for f in ("x_w", "ref_cam", "z_ref", "has_z_ref",
                          "ref_pose", "active")},
            pr={f: np.asarray(getattr(pr, f))
                for f in ("z", "cam", "weight", "cond", "valid", "pose",
                          "lm")},
            imu={f: np.asarray(getattr(imu, f))
                 for f in ("w", "a", "time", "meas_valid", "valid",
                           "pose1")}))
        rings.append(StreamingRing(cfg, W, pb.rig, pb.g_vec, caps,
                                   use_imu=True, iters_per_slide=iters))
    P = int(problems[0].poses.q.shape[0])
    outs = [[] for _ in range(M)]
    n_steady = 0
    t0 = time.perf_counter()
    for g in range(P):
        for m in range(M):
            f, ring = feeds[m], rings[m]
            ring.add_pose(f["po"]["q"][g], f["po"]["t"][g],
                          f["po"]["v"][g], f["po"]["b"][g],
                          float(f["po"]["time"][g]), f["po"]["mask"][g])
            ref = f["lm"]["ref_pose"]
            for lid in np.where(f["lm"]["active"] & (ref == g))[0]:
                z_ref = (f["lm"]["z_ref"][lid]
                         if bool(f["lm"]["has_z_ref"][lid]) else None)
                ring.add_landmark(f["lm"]["x_w"][lid], g,
                                  int(f["lm"]["ref_cam"][lid]),
                                  z_ref=z_ref)
            rows = np.where(f["pr"]["valid"] & (f["pr"]["pose"] == g))[0]
            for r in rows:
                ring.add_projection(f["pr"]["z"][r], g,
                                    int(f["pr"]["lm"][r]),
                                    int(f["pr"]["cam"][r]),
                                    float(f["pr"]["weight"][r]),
                                    bool(f["pr"]["cond"][r]))
            if g >= 1:
                for r in np.where(f["imu"]["valid"]
                                  & (f["imu"]["pose1"] == g - 1))[0]:
                    n = int(f["imu"]["meas_valid"][r].sum())
                    ring.add_imu(g - 1, g, f["imu"]["w"][r][:n],
                                 f["imu"]["a"][r][:n],
                                 f["imu"]["time"][r][:n])
            o = ring.push(block=False)
            if o is not None:
                outs[m].append(o)
                if m == M - 1 and len(outs[m]) == warm_drop:
                    for rr in rings:
                        jax.block_until_ready(rr._carry[1])
                    t0 = time.perf_counter()
                if len(outs[m]) > warm_drop:
                    n_steady += 1
    for rr in rings:
        jax.block_until_ready(rr._carry[1])
    t_steady = time.perf_counter() - t0
    return [jax.device_get(o) for o in outs], t_steady, n_steady


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--lms", type=int, default=256)
    ap.add_argument("--perturb", type=float, default=0.02)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--streams", type=int, default=1,
                    help="interleave M independent streams (multi-vehicle "
                         "serving; one shared resident program)")
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import fixedlag
    from ba_tpu.solver.streaming import RingCapacities

    sim = sv.simulate(n_poses=args.poses, n_lms=args.lms, seed=7)
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=args.perturb,
                                     seed=8, with_marg_prior=False)
    if not args.f64:
        import jax.numpy as jnp
        problem = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, problem)
    problem = prepare_landmarks(problem, cfg)

    # size the resident program's capacities from the sequence prefix (in
    # a real deployment these come from the feature/IMU budget)
    n_slides = args.poses - args.window + 1
    sched = fixedlag.build_ring_schedule(problem, cfg, args.window,
                                         n_slides)
    caps = RingCapacities.from_schedule(sched)

    if args.streams > 1:
        problems = [problem]
        for m in range(1, args.streams):
            pm, _, _ = sv.build_problem(sim, cfg, perturb=args.perturb,
                                        seed=8 + m, with_marg_prior=False)
            if not args.f64:
                pm = jax.tree_util.tree_map(
                    lambda a: a.astype(np.float32)
                    if a.dtype == np.float64 else a, pm)
            problems.append(prepare_landmarks(pm, cfg))
        outs, t_steady, n_steady = stream_many(
            problems, cfg, args.window, args.iters, caps)
        ates = []
        for o in outs:
            t_est = np.stack([x["t"] for x in o])
            ates.append(sv.ate(None, t_est, None, sim.t_wv[:len(o)]))
        print(f"{args.streams} streams x {args.poses} keyframes: "
              f"steady-state {n_steady / max(t_steady, 1e-9):.1f} "
              f"keyframes/s aggregate "
              f"({n_steady / max(t_steady, 1e-9) / args.streams:.1f} "
              f"per stream); ATE {min(ates) * 100:.3f}.."
              f"{max(ates) * 100:.3f} cm")
        return 0

    t0 = time.perf_counter()
    outs, t_steady, n_steady = stream_sequence(
        problem, cfg, args.window, args.iters, caps, warm_drop=1)
    total = time.perf_counter() - t0

    t_est = np.stack([o["t"] for o in outs])
    n = len(outs)
    ate = sv.ate(None, t_est, None, sim.t_wv[:n])
    print(f"streamed {args.poses} keyframes, retired {n}; "
          f"first push (compile) {total - t_steady:.2f}s; "
          f"steady-state {n_steady / max(t_steady, 1e-9):.1f} keyframes/s; "
          f"retired-trajectory ATE {ate * 100:.3f} cm; "
          f"last cost {float(outs[-1]['cost']):.4g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
