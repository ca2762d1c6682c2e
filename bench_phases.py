"""Per-phase timing of the flagship VI-BA iteration on the current device.

Times each jitted component of a GN iteration separately (steady-state,
median of reps) to locate the next optimization target — the TPU analog of
the reference's solver timer spans (`_j_evaluation_`, `_jtj_`,
`_schur_complement_`, `_solve_`, `_back_substitution_`,
/root/reference/src/BundleAdjuster.cpp:300-646).

Usage: python bench_phases.py [--cpu] [--poses 128] [--lms 512]
"""

import argparse
import time

import jax


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # median ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--poses", type=int, default=128)
    ap.add_argument("--lms", type=int, default=512)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import numpy as np

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.core.residuals import imu as imu_mod
    from ba_tpu.core.residuals import reprojection
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import assemble as asm
    from ba_tpu.solver.assemble import band_width_of
    from ba_tpu.solver.linear import solve_reduced
    from ba_tpu.solver.step import (_imu_eval, apply_update, gn_iteration,
                                    solve_fixed)

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=args.poses, n_lms=args.lms, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem))
    problem = jax.tree_util.tree_map(
        lambda a: a.astype(np.float32) if a.dtype == np.float64 else a,
        problem)
    problem = prepare_landmarks(problem, cfg)

    D, K, P, L, lm, N = asm.dims(problem, cfg)
    print(f"P={P} L={L} D={D} N={N} band={cfg.band_width} "
          f"proj_rows={problem.proj.z.shape[0]} "
          f"imu_rows={problem.imu.w.shape[0]}x{problem.imu.w.shape[1]}")

    # phases
    imu_full = jax.jit(lambda p: _imu_eval(p, cfg, True, True).r)
    imu_cost = jax.jit(lambda p: _imu_eval(p, cfg, True, False).err_sq)
    proj = jax.jit(
        lambda p: reprojection.evaluate(p, cfg, with_jacobians=True).r)
    proj_cost = jax.jit(
        lambda p: reprojection.evaluate(p, cfg,
                                        with_jacobians=False).err_sq)
    ie_const = _imu_eval(problem, cfg, True, True)
    assemble = jax.jit(lambda p, ie: asm.assemble(p, cfg, imu_eval=ie).S)
    asm_out = jax.jit(lambda p, ie: asm.assemble(p, cfg, imu_eval=ie))(
        problem, ie_const)
    solve = jax.jit(lambda a: solve_reduced(a).delta_p)
    step0 = solve_reduced(asm_out)
    upd = jax.jit(lambda p: apply_update(p, cfg, step0.delta_p,
                                         step0.delta_l).poses.t)
    full = jax.jit(
        lambda p: gn_iteration(p, cfg, True, 1.0, False).post_cost)

    rows = [
        ("imu eval (jac+cov)", timeit(imu_full, problem)),
        ("imu eval (cost-only)", timeit(imu_cost, problem)),
        ("proj eval (jac)", timeit(proj, problem)),
        ("proj eval (cost-only)", timeit(proj_cost, problem)),
        ("assemble (given imu_eval)", timeit(assemble, problem, ie_const)),
        ("reduced solve (Cholesky)", timeit(solve, asm_out)),
        ("apply_update", timeit(upd, problem)),
        ("FULL gn_iteration", timeit(full, problem)),
    ]
    for name, ms in rows:
        print(f"  {name:28s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
