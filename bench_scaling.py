"""Problem-size scaling benchmark: keyframes/s vs window length, for the
dense-Cholesky and matrix-free PCG reduced solvers.

Produces the BASELINE.md scaling table.  VERDICT round-1 "done when":
keyframes/s non-decreasing from P=128 through P=1024.

Usage:  python bench_scaling.py [--cpu] [--sizes 64,128,256,512,1024]
"""

import argparse
import dataclasses
import json
import time

import jax


def run_one(n_poses, n_lms, solver, n_iters=10, pcg=0, chunk=0):
    import dataclasses as dc

    import numpy as np

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.assemble import band_width_of
    from ba_tpu.solver.step import solve_fixed

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False,
                   use_cg_solver=solver == "cg", cg_max_iterations=100,
                   cg_tolerance=1e-5)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1,
                                     with_marg_prior=False)
    if solver == "band":
        cfg = dc.replace(cfg, band_width=band_width_of(problem))
    elif solver == "bandsolve":
        cfg = dc.replace(cfg, band_width=band_width_of(problem),
                         use_banded_solver=True,
                         banded_pcg_iterations=pcg, banded_chunk=chunk)
    elif solver == "bandscan":  # bandsolve with the sequential scan factor
        cfg = dc.replace(cfg, band_width=band_width_of(problem),
                         use_banded_solver=True,
                         banded_cyclic_reduction=False,
                         banded_pcg_iterations=pcg, banded_chunk=chunk)
    elif solver == "sob":
        cfg = dc.replace(cfg, band_width=band_width_of(problem),
                         schur_on_band=True)
    if not jax.config.jax_enable_x64:
        problem = jax.tree_util.tree_map(
            lambda a: a.astype(np.float32)
            if a.dtype == np.float64 else a, problem)
    problem = prepare_landmarks(problem, cfg)

    out = solve_fixed(problem, cfg, True, n_iters)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = solve_fixed(problem, cfg, True, n_iters)
    jax.block_until_ready(out[1])
    dt = time.perf_counter() - t0
    kf_s = n_poses * n_iters / dt
    final_cost = float(out[1][-1])
    return kf_s, dt / n_iters * 1e3, final_cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", default="64,128,256,512,1024")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--solvers", default="dense,band,cg")
    ap.add_argument("--pcg", type=int, default=0,
                    help="banded_pcg_iterations override (0 = auto)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="banded_chunk override (0 = auto 16)")
    ap.add_argument("--x64", action="store_true",
                    help="enable x64 (problems stay f32; the banded "
                         "direct solver factorizes its small band in f64)")
    args = ap.parse_args()
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for p in sizes:
        lms = p * 4
        for solver in args.solvers.split(","):
            try:
                kf_s, ms, cost = run_one(p, lms, solver, args.iters,
                                         args.pcg, args.chunk)
            except Exception as e:  # noqa: BLE001 — record OOM/compile fails
                rows.append(dict(P=p, L=lms, solver=solver,
                                 error=str(e)[:120]))
                continue
            rows.append(dict(P=p, L=lms, solver=solver,
                             kf_per_s=round(kf_s, 1),
                             ms_per_iter=round(ms, 2),
                             final_cost=cost))
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
