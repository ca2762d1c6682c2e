"""Phase breakdown of the fused-fleet iteration: where do the ms go?

Times each stage of the concat-fleet GN iteration separately (jitted, 25x
inner repeat via lax.scan-free repetition): residual/Jacobian evaluation,
banded Schur assembly (band_S), chunked factor, PCG wrap, landmark
back-substitution, cost evaluation.
"""

import argparse
import time

import jax


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--B", type=int, default=8)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses
    from functools import partial

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
    fused = concat_problems(raw, cfg)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(fused),
                              use_banded_solver=True, fleet_size=args.B)
    problem = prepare_landmarks(fused, cfg)
    D, K, P, L, lm, N = dims(problem, cfg)
    print(f"fused fleet B={args.B}: P={P} L={L} band={cfg.band_width} "
          f"device={jax.devices()[0].device_kind!r}")

    @partial(jax.jit, static_argnames=())
    def do_blocks(problem):
        from ba_tpu.core.residuals import imu as imu_mod
        imu_eval = imu_mod.evaluate(problem, cfg, with_jacobians=True)
        bs, _ = cg_mod.assemble_blocks(problem, cfg, imu_eval,
                                       with_precond=False)
        return bs

    bs = do_blocks(problem)
    print(f"  blocks (eval+weight)        {timeit(do_blocks, problem):8.3f} ms")

    @jax.jit
    def do_band(bs):
        return banded_mod.band_S(problem, cfg, bs, P, D)

    band = do_band(bs)
    print(f"  band_S (banded Schur asm)   {timeit(do_band, bs):8.3f} ms")

    @jax.jit
    def do_solve(bs):
        return banded_mod.solve_reduced_banded(problem, cfg, bs, P, D)

    step = do_solve(bs)
    print(f"  solve_reduced_banded (all)  {timeit(do_solve, bs):8.3f} ms")

    @jax.jit
    def do_backsub(bs, dp):
        return cg_mod.back_substitute_blocks(bs, dp, P, D, 0)

    print(f"  back_substitute             "
          f"{timeit(do_backsub, bs, step.delta_p):8.3f} ms")

    @jax.jit
    def do_cost(problem):
        return step_mod._cost(problem, cfg, True)

    print(f"  cost eval (trial)           {timeit(do_cost, problem):8.3f} ms")

    @jax.jit
    def do_iter(problem):
        return step_mod.gn_iteration(problem, cfg, True, 1.0, False)

    print(f"  FULL gn_iteration           {timeit(do_iter, problem):8.3f} ms")


if __name__ == "__main__":
    main()
