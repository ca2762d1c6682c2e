"""ba_tpu — a TPU-native visual-inertial bundle-adjustment engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ library (`arpg/ba`): reprojection / pose-prior / IMU-preintegration
residuals, robust Gauss-Newton and dogleg trust-region solves via
Schur-complement reduction of the camera-landmark normal equations,
self-calibration, and sliding-window marginalization — expressed as batched
dense-block linear algebra on static shapes so XLA can tile it onto the MXU,
and sharded across device meshes with `shard_map` + collectives.

Package layout:
  core/       Lie-group math, camera models, problem container, residuals
  solver/     normal-equation assembly, Schur reduction, GN/dogleg stepping
  parallel/   multi-device sharding of residual evaluation + reduction
  ops/        Pallas TPU kernels for the hot paths
  io/         synthetic data generation (simulate_vins) and log parsing
  utils/      timing/profiling helpers
"""

__version__ = "0.1.0"
