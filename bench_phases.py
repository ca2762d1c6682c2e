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

    roofline(problem, cfg, solve_fixed)


# Peak numbers for roofline normalization.  MFU uses the bf16 MXU peak
# (the standard convention); the library's default f32 matmul is 3-pass
# bf16, so its speed-of-light is peak/3 on matmul FLOPs.
_PEAKS = {  # device_kind prefix -> (TFLOP/s bf16, HBM GB/s)
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5e": (197.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v6": (918.0, 1640.0),
}


def roofline(problem, cfg, solve_fixed, n_iters=25):
    """XLA-reported FLOPs/bytes of the whole 25-iteration solve program vs
    the chip's peak — the speed-of-light accounting SURVEY §5.1 calls for
    (the reference only has wall-clock spans, Utils.h:51-62)."""
    fn = jax.jit(lambda p: solve_fixed(p, cfg, True, n_iters)[1])
    compiled = fn.lower(problem).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    if flops <= 0.0 or byts <= 0.0:
        print("\nroofline: cost analysis unavailable on this backend "
              f"(flops={flops!r}, bytes={byts!r}) — skipping")
        return
    ms = timeit(fn, problem, reps=5)
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in _PEAKS.items() if kind.startswith(k)), None)
    tflops = flops / ms / 1e9
    gbs = byts / ms / 1e6
    print(f"\nroofline ({n_iters}-iteration solve, XLA cost analysis, "
          f"device={kind!r}):")
    print(f"  model FLOPs {flops / 1e9:.3f} G   bytes {byts / 1e6:.1f} MB  "
          f" arith intensity {flops / max(byts, 1):.1f} flop/B")
    print(f"  achieved {tflops:.2f} TFLOP/s, {gbs:.0f} GB/s over {ms:.1f} ms")
    if peak:
        print(f"  MFU {100 * tflops / peak[0]:.1f}% of bf16 peak "
              f"({100 * 3 * tflops / peak[0]:.1f}% counting 3-pass-bf16 "
              f"f32 passes), HBM {100 * gbs / peak[1]:.1f}% of "
              f"{peak[1]:.0f} GB/s")


if __name__ == "__main__":
    main()
