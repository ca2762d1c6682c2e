"""ba_tpu — a TPU-native visual-inertial bundle-adjustment engine.

A from-scratch JAX/XLA re-design of the capabilities of the reference
C++ library (`arpg/ba`): reprojection / pose-prior / IMU-preintegration
residuals, robust Gauss-Newton and dogleg trust-region solves via
Schur-complement reduction of the camera-landmark normal equations,
self-calibration, and sliding-window marginalization — expressed as batched
dense-block linear algebra on static shapes so XLA can tile it onto the MXU,
and sharded across device meshes with `shard_map` + collectives.

(A hand-written Pallas reprojection kernel existed through round 2; it only
matched XLA's fusion of the same math at round 1 and measured 3.8x slower
than the structured segment-sum assembly that replaced its target, so it
was retired — see ROADMAP.md.)

Package layout:
  core/       Lie-group math, camera models, problem container, residuals
  solver/     normal-equation assembly, Schur reduction, GN/dogleg stepping
  parallel/   multi-device sharding of residual evaluation + reduction
  io/         synthetic data generation (simulate_vins) and log parsing
  utils/      timing/profiling helpers
"""

__version__ = "0.1.0"

# TPU matmuls default to single-pass bf16 inputs, which injects ~1e-3
# relative error into f32 contractions — enough to make an assembled
# Gauss-Newton Hessian indefinite (measured: 0.28% error in S and a
# failed Cholesky on the GPS+IMU app).  This is a numerical-optimization
# library: f32 means f32.  "high" lowers f32 matmuls to the 3-pass bf16
# form (~f32-equivalent accuracy, ~1e-6 relative — 100x below the
# solver's 1e-4 relative damping) at half the MXU cost of the exact
# 6-pass "highest"; measured on the flagship it is both faster AND
# converges equally to "highest" (see BASELINE.md).
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "high")

# XLA's executable (de)serializer recurses deeply on large programs (e.g. a
# 200-pose VINS solve) and overflows the default 8MB main-thread stack while
# reading/writing the persistent compile cache — SIGSEGV inside the libgcc
# unwinder.  Raising RLIMIT_STACK in-process does NOT help: the mmap region
# was placed 8MB below the stack top at exec time, so the main stack has no
# room to grow.  Instead, route the two cache entry points through a worker
# thread with a large explicitly-allocated stack.
def _patch_compile_cache_stack():
    try:
        import threading

        from jax._src import compilation_cache as _cc
    except ImportError:  # pragma: no cover - jax always present in practice
        return
    if getattr(_cc, "_ba_tpu_big_stack", False):
        return
    _cc._ba_tpu_big_stack = True

    def _run_big_stack(fn, args, kwargs):
        out: dict = {}

        def target():
            try:
                out["v"] = fn(*args, **kwargs)
            except BaseException as e:  # re-raised on the caller thread
                out["e"] = e

        old = threading.stack_size(512 * 1024 * 1024)
        try:
            t = threading.Thread(target=target, name="ba-tpu-cache-io")
            t.start()
            t.join()
        finally:
            threading.stack_size(old)
        if "e" in out:
            raise out["e"]
        return out.get("v")

    _get, _put = _cc.get_executable_and_time, _cc.put_executable_and_time
    _cc.get_executable_and_time = (
        lambda *a, **k: _run_big_stack(_get, a, k))
    _cc.put_executable_and_time = (
        lambda *a, **k: _run_big_stack(_put, a, k))


_patch_compile_cache_stack()


# Every XLA:CPU executable load maps ~3 small anonymous regions (code /
# rodata / rw) that stay mapped for the process lifetime; a full test-suite
# process loads >20k executables and runs into the kernel's default
# vm.max_map_count of 65530, after which mmap fails and XLA segfaults
# (the "flaky segfault at ~69% of the suite").  Raise the ceiling when
# permitted (this sandbox runs as root).
def _raise_map_count(target: int = 1_048_576) -> None:
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            current = int(f.read())
        if current < target:
            with open(path, "w") as f:
                f.write(str(target))
    except (OSError, ValueError):  # unprivileged / non-Linux: best effort
        pass


_raise_map_count()
