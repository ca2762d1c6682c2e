"""Reference-parity applications (math_test, unary_binary_imu_test,
vins_window) — installed as console scripts via pyproject.toml."""
