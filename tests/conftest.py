"""Test configuration: run the suite on a virtual 8-device CPU mesh in f64.

Multi-chip hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8`.  f64 on CPU is the numerical
oracle mode — the TPU path runs f32 and is verified against it.

NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS env var,
so the platform must be forced via jax.config *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Installs the big-stack compile-cache IO patch (XLA's (de)serializer
# overflows the 8MB main stack on large executables) before any compile.
import ba_tpu  # noqa: E402,F401

import pytest  # noqa: E402

# Tests (or whole modules) above ~10 s warm-cache on the 4-core CI host,
# measured 2026-08-19 (`--durations`).  Centralized here so the tiering is
# one list, not decorators scattered over 20 files.
_SLOW_MODULES = {
    "test_sharding", "test_multihost", "test_banded", "test_window",
}
_SLOW_TESTS = {
    "test_imu_jacobians_match_fd",
    "test_robust_imu_downweights_corrupted_span",
    "test_bias_estimation_15dof",
    "test_full_vi_selfcal_15dof",
    "test_intrinsics_recovered",
    "test_calibration_marginals",
    "test_tvs_joint_optimization_converges",
    "test_f32_ate_matches_f64_oracle",
    "test_vins_vi_ba_converges",
    "test_solve_adaptive_dogleg_and_imu",
    "test_solve_adaptive_matches_host_loop",
    "test_cg_matvec_matches_dense_schur",
    "test_tvs_staging_enables_after_stabilization",
    "test_calibration_marginals_in_summary",
    "test_calibrator_recovers_intrinsics",
    "test_end_to_end_reference_log",
    "test_stage0_rotation_only_recovers_tvs_rotation",
    "test_vins_visual_only_converges",
    "test_gn_recovers_ground_truth_landmarks",
    "test_tvs_staging_freezes_translation",
    "test_dump_system",
    "test_dogleg_converges",
    "test_stereo_depth_recovery_two_poses",
    "test_sharded_fleet_matches_local",
    "test_stereo_ba_converges",
    "test_gn_converges_noiseless",
    "test_cg_with_imu_matches_dense_iteration",
    "test_imu_rotation_only_rows",
    "test_assembly_matches_dense_oracle",
    "test_cg_step_matches_dense",
    "test_gn_rollback_on_error_increase",
    "test_ring_matches_masked_full_oracle",
}


def pytest_collection_modifyitems(config, items):
    """Test tiering: everything not slow is part of the smoke tier
    (`pytest -m smoke`, < 2 minutes warm-cache) so end-of-milestone
    snapshots can always run green quickly; the full suite stays the
    default."""
    for item in items:
        if (item.module.__name__ in _SLOW_MODULES
                or item.name.split("[")[0] in _SLOW_TESTS
                or item.get_closest_marker("slow") is not None):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)
