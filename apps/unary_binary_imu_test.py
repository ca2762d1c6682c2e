#!/usr/bin/env python
"""GPS + IMU + odometry fixed-lag pose-graph smoother CLI.

Analog of the reference's `applications/unary_binary_imu_test`
(/root/reference/applications/unary_binary_imu_test/main.cpp): parse a text
log of GPS fixes and IMU samples, build poses at GPS times with
gyro-integrated initial guesses, attach GPS unary priors (loose covariance on
z like the reference's [1000, 1000, 30000, inf...] prior, main.cpp:176-183)
and IMU preintegration residuals between consecutive poses, then
`solve(max_iter=25, gn_damping=0.2)` — the reference's exact invocation
(main.cpp:283-288).

Log format (CSV, one record per line):
    imu,<time>,<wx>,<wy>,<wz>,<ax>,<ay>,<az>
    gps,<time>,<x>,<y>,<z>

`--generate N` writes a synthetic log with ground truth for self-testing.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def generate_log(path: str, n_gps: int = 30, imu_hz: float = 100.0,
                 gps_hz: float = 1.0, noise_gps: float = 0.5):
    """Synthetic figure-eight drive with exact IMU and noisy GPS."""
    from ba_tpu.core import lie
    import jax.numpy as jnp

    G = 9.8007
    yaw_rate = 0.2

    def p_of(t):
        return np.array([10 * np.sin(0.1 * t), 6 * np.sin(0.2 * t), 0.0])

    def a_of(t):
        return np.array([-0.1 * np.sin(0.1 * t) * 10 * 0.1,
                         -0.04 * 6 * np.sin(0.2 * t), 0.0])

    rng = np.random.default_rng(0)
    t_end = n_gps / gps_hz
    lines = []
    for t in np.arange(0.0, t_end, 1.0 / imu_hz):
        q = lie.so3_exp(jnp.array([0.0, 0.0, yaw_rate * t]))
        a_body = np.asarray(lie.quat_rotate(
            lie.quat_conj(q), jnp.asarray(a_of(t) - np.array([0, 0, -G]))))
        lines.append(f"imu,{t:.6f},0,0,{yaw_rate}," +
                     ",".join(f"{x:.9f}" for x in a_body))
    for i in range(n_gps):
        t = i / gps_hz
        p = p_of(t) + rng.normal(size=3) * noise_gps * np.array([1, 1, 0])
        lines.append(f"gps,{t:.6f}," + ",".join(f"{x:.6f}" for x in p))
    Path(path).write_text("\n".join(sorted(
        lines, key=lambda l: float(l.split(",")[1]))) + "\n")
    print(f"wrote {len(lines)} records to {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", help="input log file")
    ap.add_argument("--generate", type=int, metavar="N_GPS",
                    help="write a synthetic log instead of solving")
    ap.add_argument("--out", default="trajectory.csv")
    ap.add_argument("--max-poses", type=int, default=10000)
    args = ap.parse_args()

    if args.generate:
        generate_log(args.log or "synthetic_log.csv", args.generate)
        return 0

    if not args.log:
        ap.error("log file required (or --generate)")

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp

    from ba_tpu.core import lie
    from ba_tpu.core.problem import BAConfig, ProblemBuilder
    from ba_tpu.native import InterpolationBuffer, available
    from ba_tpu.solver import step as step_mod

    # --- parse ----------------------------------------------------------
    imu_buf = InterpolationBuffer(6) if available() else None
    imu_rows = []
    gps_rows = []
    for line in Path(args.log).read_text().splitlines():
        f = line.strip().split(",")
        if not f or not f[0]:
            continue
        if f[0] == "imu":
            t, wx, wy, wz, ax, ay, az = map(float, f[1:8])
            if imu_buf is not None:
                imu_buf.add(t, [wx, wy, wz, ax, ay, az])
            imu_rows.append((t, wx, wy, wz, ax, ay, az))
        elif f[0] == "gps":
            gps_rows.append(tuple(map(float, f[1:5])))
    gps_rows = gps_rows[: args.max_poses]
    print(f"parsed {len(imu_rows)} imu samples, {len(gps_rows)} gps fixes")

    # --- build (reference f_gps, main.cpp:141-219) ----------------------
    cfg = BAConfig(pose_dim=9, lm_size=0, use_dogleg=False,
                   trust_region_size=1e5, enable_auto_regularization=False)
    b = ProblemBuilder(cfg)
    # loose GPS prior: xy tight-ish, z loose, rotation ~free
    cov = np.diag([1.0, 1.0, 30.0, 1e6, 1e6, 1e6])

    imu_arr = np.array(imu_rows)
    ids = []
    prev_t = None
    q = np.array([1.0, 0, 0, 0])
    for (t, x, y, z) in gps_rows:
        if prev_t is not None:
            # gyro-integrated orientation initial guess
            seg = imu_arr[(imu_arr[:, 0] >= prev_t) & (imu_arr[:, 0] <= t)]
            for k in range(len(seg) - 1):
                dt = seg[k + 1, 0] - seg[k, 0]
                q = np.asarray(lie.quat_mul(
                    jnp.asarray(q),
                    lie.so3_exp(jnp.asarray(seg[k, 1:4] * dt))))
        ids.append(b.add_pose(q, [x, y, z], active=True, time=t))
        b.add_unary_constraint(ids[-1], q, [x, y, z], cov=cov)
        if prev_t is not None:
            if imu_buf is not None:
                ts, vals = imu_buf.get_range(prev_t, t)
                w, a = vals[:, :3], vals[:, 3:]
            else:
                seg = imu_arr[(imu_arr[:, 0] >= prev_t)
                              & (imu_arr[:, 0] <= t)]
                ts, w, a = seg[:, 0], seg[:, 1:4], seg[:, 4:7]
            b.add_imu_residual(ids[-2], ids[-1], w, a, ts)
        prev_t = t

    problem = b.build()
    # pure odometry chain: band width 2 (consecutive-pose IMU/binary
    # residuals only) — banded-grid assembly fast path
    import dataclasses

    from ba_tpu.solver.assemble import band_width_of

    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem))
    problem, summary = step_mod.solve(problem, cfg, max_iter=25,
                                      gn_damping=0.2, use_imu=True)
    print(f"solve: {summary}")

    n = len(gps_rows)
    t_out = np.asarray(problem.poses.t[:n])
    with open(args.out, "w") as fh:
        for i in range(n):
            fh.write(",".join(f"{v:.6f}" for v in
                              [float(problem.poses.time[i])]
                              + list(t_out[i])) + "\n")
    print(f"wrote optimized trajectory to {args.out}")
    return 0 if summary.is_good else 1


if __name__ == "__main__":
    sys.exit(main())
