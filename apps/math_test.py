#!/usr/bin/env python
"""Kernel-level verification + micro-benchmarks CLI.

Analog of the reference's `applications/math_test`
(/root/reference/applications/math_test/main.cpp): finite-difference checks
of the Lie/camera kernels and dense-oracle checks of the assembly operators,
with timings.  Run `python apps/math_test.py [--f32]`.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true",
                    help="run in f32 (TPU mode) instead of f64")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    elif not args.f32:
        # f64 oracle mode runs on CPU (TPU has no f64 factorizations)
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from ba_tpu.core import camera, lie

    tol = 1e-6 if not args.f32 else 1e-2
    rng = np.random.default_rng(0)
    failures = 0

    def check(name, got, want, atol):
        nonlocal failures
        got, want = np.asarray(got), np.asarray(want)
        # scale the tolerance to the operand magnitude (f32 mode compares
        # different f32 accumulation orders of ~1e6-magnitude entries)
        scale = max(1.0, float(np.abs(want).max()))
        err = float(np.max(np.abs(got - want)))
        ok = err <= atol * scale
        failures += 0 if ok else 1
        print(f"  [{'PASS' if ok else 'FAIL'}] {name:44s} "
              f"err={err:.3e} (scale {scale:.1e})")

    fd_eps = 1e-6 if not args.f32 else 1e-3

    def fd_jac(f, x, eps=None):
        eps = eps or fd_eps
        cols = []
        for i in range(x.size):
            dx = np.zeros_like(x)
            dx[i] = eps
            cols.append((np.asarray(f(x + dx)) - np.asarray(f(x - dx)))
                        / (2 * eps))
        return np.stack(cols, -1)

    print("Lie kernel Jacobians vs central finite differences:")
    w0 = rng.normal(size=3)
    f_exp = lambda w: lie.so3_exp(jnp.broadcast_to(jnp.asarray(w), (2, 3)))[0]
    check("d so3_exp / dw", jax.jacfwd(f_exp)(jnp.asarray(w0)),
          fd_jac(f_exp, w0), tol)
    q0 = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3))))
    f_log = lambda d: lie.so3_log(
        lie.quat_mul(jnp.broadcast_to(jnp.asarray(q0), (2, 4)),
                     lie.so3_exp(jnp.broadcast_to(d, (2, 3)))))[0]
    check("d so3_log(q*exp(d)) / dd", jax.jacfwd(f_log)(jnp.zeros(3)),
          fd_jac(f_log, np.zeros(3)), tol)

    print("Camera model round-trips:")
    params = jnp.asarray(
        np.array([198.969, 198.1284, 329.9368, 240.1017, 0.9640582]))
    p3 = rng.normal(size=(64, 3))
    p3[:, 2] = np.abs(p3[:, 2]) + 0.5
    pix = camera.project(params, camera.MODEL_FOV, jnp.asarray(p3))
    ray = camera.unproject(params, camera.MODEL_FOV, pix)
    pix2 = camera.project(params, camera.MODEL_FOV, ray)
    check("fov project/unproject roundtrip", pix2, pix,
          1e-6 if not args.f32 else 1e-1)

    print("Assembly vs dense-autodiff oracle (reprojection GN system):")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_solver_reprojection import dense_oracle, make_scene
    from ba_tpu.core.problem import prepare_landmarks
    from ba_tpu.solver import assemble as asm_mod

    problem, cfg = make_scene(n_poses=4, n_lms=6)
    problem = prepare_landmarks(problem, cfg)
    t0 = time.perf_counter()
    asm = asm_mod.assemble(problem, cfg)
    jax.block_until_ready(asm.S)
    t_asm = time.perf_counter() - t0
    J, r, np_dim = dense_oracle(problem, cfg)
    H = J.T @ J
    check("U block", asm.U, H[:np_dim, :np_dim],
          1e-10 if not args.f32 else 1e-2)
    check("W block", asm.W, H[:np_dim, np_dim:],
          1e-10 if not args.f32 else 1e-2)
    check("rhs_p", asm.rhs_p, (J.T @ r)[:np_dim],
          1e-10 if not args.f32 else 1e-2)
    print(f"  assemble wall time (compile included): {t_asm:.3f} s")

    if args.f32:
        print("Block-op micro-benchmarks (steady state):")
        from bench import build as bench_build
        problem, cfg = bench_build()
        from ba_tpu.solver.step import gn_iteration

        it = lambda p: gn_iteration(p, cfg, True, 1.0, False)
        out = it(problem)
        jax.block_until_ready(out.post_cost)
        t0 = time.perf_counter()
        for _ in range(5):
            out = it(problem)
        jax.block_until_ready(out.post_cost)
        print(f"  VI GN iteration (128 kf, 512 lms): "
              f"{(time.perf_counter() - t0) / 5 * 1e3:.2f} ms")

    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
