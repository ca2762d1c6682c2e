#!/usr/bin/env python
"""GPS + IMU + wheel-odometry pose-graph smoother CLI.

Analog of the reference's `applications/unary_binary_imu_test`
(/root/reference/applications/unary_binary_imu_test/main.cpp): parse a text
log of wheel-odometry, GPS (UTM) and IMU records, build one pose per GPS fix
with dead-reckoned initial guesses (gyro orientation + wheel-speed
translation, main.cpp:67-84), attach loose GPS unary priors (covariance
diag [1000, 1000, 30000, inf, inf, inf], main.cpp:176-183) and IMU
preintegration residuals between consecutive poses
(imu_buffer.GetRange(last_gps_t, t), main.cpp:196-205), then
`solve(max_iter=25, gn_damping=0.2)` — the reference's exact invocation
(main.cpp:283-288), with gravity (0, 0, +9.8) (main.cpp:229-231).

Input contract (the reference's whitespace format, main.cpp:246-280):
    ODO <time> <rr> <rl>                      wheel speeds (right, left)
    UTM <time> <utm_e> <utm_n> <altitude>     GPS fix
    IMU <time> <wx> <wy> <wz> <ax> <ay> <az>  gyro + accel sample

The round-1 CSV format is kept as an alternate (auto-detected):
    imu,<time>,<wx>,<wy>,<wz>,<ax>,<ay>,<az>
    gps,<time>,<x>,<y>,<z>

`--generate N` writes a synthetic reference-format log (with ODO records)
for self-testing; `--generate-csv N` writes the CSV variant.
"""

import argparse
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TRACKWIDTH = 1.5          # reference main.cpp:101
MAX_POSES = 10000         # reference main.cpp:259-263
DBL_MAX = 1e18            # "unconstrained" covariance entries


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _quat_rotate(q, v):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x),
         1 - 2 * (x * x + y * y)]])
    return R @ v


def _aa(axis, angle):
    axis = np.asarray(axis, float)
    return np.concatenate([[math.cos(angle / 2)],
                           math.sin(angle / 2) * axis])


def _euler_zyx_quat(wz, wy, wx):
    """aaZ * aaY * aaX as the reference composes gyro increments
    (main.cpp:76-80)."""
    return _quat_mul(_aa([0, 0, 1], wz), _quat_mul(_aa([0, 1, 0], wy),
                                                   _aa([1, 0, 0], wx)))


class DeadReckoner:
    """The reference app's incremental-pose state machine (main.cpp:40-139):
    wheel odometry drives `speed` and a differential-drive 2-D pose; IMU
    records integrate a gyro pose whose translation steps (0, speed*dt, 0).
    """

    def __init__(self):
        self.speed = 0.0
        self.inc_x = self.inc_y = self.inc_yaw = 0.0
        self.inc_timestamp = None
        self.gyro_q = np.array([1.0, 0, 0, 0])
        self.gyro_t = np.zeros(3)
        self.last_imu_t = None

    def odo(self, t, rr, rl):
        """update_incremental_pose (main.cpp:87-139)."""
        if self.inc_timestamp is None:
            self.inc_timestamp = t
            return
        self.speed = 0.5 * (rr + rl)
        dt = t - self.inc_timestamp
        TINY = 0.0001
        if abs(rr) > TINY or abs(rl) > TINY:
            if abs(rr - rl) < TINY:
                self.inc_x += math.cos(self.inc_yaw) * rr * dt
                self.inc_y += math.sin(self.inc_yaw) * rr * dt
            else:
                w = (rr - rl) / TRACKWIDTH
                R = TRACKWIDTH * 0.5 * (rr + rl) / (rr - rl)
                icc_x = self.inc_x - R * math.sin(self.inc_yaw)
                icc_y = self.inc_y + R * math.cos(self.inc_yaw)
                wdt = w * dt
                nx = (math.cos(wdt) * (self.inc_x - icc_x)
                      - math.sin(wdt) * (self.inc_y - icc_y) + icc_x)
                ny = (math.sin(wdt) * (self.inc_x - icc_x)
                      + math.cos(wdt) * (self.inc_y - icc_y) + icc_y)
                self.inc_x, self.inc_y = nx, ny
                self.inc_yaw += wdt
        self.inc_timestamp = t

    def imu(self, t, w):
        """add_gyro_and_speed (main.cpp:67-84): right-multiply the gyro
        increment SE3(q(w*dt), (0, speed*dt, 0))."""
        if self.last_imu_t is not None:
            dt = t - self.last_imu_t
            dq = _euler_zyx_quat(w[2] * dt, w[1] * dt, w[0] * dt)
            self.gyro_t = self.gyro_t + _quat_rotate(
                self.gyro_q, np.array([0.0, self.speed * dt, 0.0]))
            self.gyro_q = _quat_mul(self.gyro_q, dq)
            self.gyro_q /= np.linalg.norm(self.gyro_q)
        self.last_imu_t = t

    def take_gyro_update(self):
        """Consume incremental_gyro_update (reset at each GPS fix,
        main.cpp:209-215)."""
        q, t = self.gyro_q, self.gyro_t
        self.gyro_q = np.array([1.0, 0, 0, 0])
        self.gyro_t = np.zeros(3)
        self.inc_x = self.inc_y = self.inc_yaw = 0.0
        return q, t


def parse_log(path: str):
    """Parse either the reference whitespace format or the CSV alternate.

    Returns (imu_rows (N, 7) ndarray, gps list of (t, x, y, z),
    guesses list of (q, t) dead-reckoned pose increments per GPS fix).

    Dispatches to the native C++ parser+dead-reckoner when available
    (ba_tpu.native.parse_log — the reference's parse_file/f_gps stage is
    host C++ too, main.cpp:40-280); this Python implementation is the
    semantically-identical fallback (tests/test_native.py cross-checks)."""
    from ba_tpu import native

    if native.available():
        return native.parse_log(path, MAX_POSES)
    return parse_log_py(path)


def parse_log_py(path: str):
    """Pure-Python fallback of `parse_log` (identical contract)."""
    text = Path(path).read_text()
    dr = DeadReckoner()
    imu_rows, gps, guesses = [], [], []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if "," in line and line.split(",")[0] in ("imu", "gps"):
            f = line.split(",")
            if f[0] == "imu":
                t, wx, wy, wz, ax, ay, az = map(float, f[1:8])
                dr.imu(t, (wx, wy, wz))
                imu_rows.append((t, wx, wy, wz, ax, ay, az))
            else:
                t, x, y, z = map(float, f[1:5])
                gps.append((t, x, y, z))
                guesses.append(dr.take_gyro_update())
            continue
        f = line.split()
        tag = f[0]
        if tag.startswith("ODO"):
            dr.odo(float(f[1]), float(f[2]), float(f[3]))
        elif tag.startswith("UTM"):
            t, e, n, alt = map(float, f[1:5])
            if len(gps) < MAX_POSES:
                gps.append((t, e, n, alt))
                guesses.append(dr.take_gyro_update())
        elif tag.startswith("IMU"):
            t = float(f[1])
            w = tuple(map(float, f[2:5]))
            a = tuple(map(float, f[5:8]))
            dr.imu(t, w)
            imu_rows.append((t,) + w + a)
        else:
            print(f"Unknown symbol <{tag}>", file=sys.stderr)
    # UTM coordinates are re-based at the first fix (main.cpp:144-149)
    if gps and gps[0][1:] != (0.0, 0.0, 0.0):
        t0, e0, n0, u0 = gps[0]
        gps = [(t, e - e0, n - n0, z - u0) for (t, e, n, z) in gps]
    return np.array(imu_rows) if imu_rows else np.zeros((0, 7)), gps, guesses


def generate_log(path: str, n_gps: int = 30, imu_hz: float = 100.0,
                 gps_hz: float = 1.0, noise_gps: float = 0.5,
                 fmt: str = "ref"):
    """Synthetic planar drive: constant forward speed + constant yaw rate
    (a circle-arc), exact IMU/ODO, noisy GPS.  Written in the reference
    whitespace format (fmt='ref', with ODO records) or the CSV alternate.
    """
    G = 9.8
    yaw_rate = 0.15
    speed = 2.0

    def pose_of(t):
        # unicycle: yaw = yaw_rate*t; forward axis = body +y (the reference
        # gyro-update convention, main.cpp:80)
        yaw = yaw_rate * t
        if abs(yaw_rate) > 1e-9:
            # integral of v = speed * (-sin(w t), cos(w t), 0)
            x = -speed / yaw_rate * (1 - math.cos(yaw))
            y = speed / yaw_rate * math.sin(yaw)
        else:
            x, y = 0.0, speed * t
        return np.array([x, y, 0.0]), yaw

    rng = np.random.default_rng(0)
    t_end = n_gps / gps_hz
    recs = []
    for t in np.arange(0.0, t_end + 1e-9, 1.0 / imu_hz):
        # body frame: z up, y forward.  a_body = R^T (a_world - g_world),
        # g_world = (0,0,-G); centripetal acceleration points to the circle
        # center
        yaw = yaw_rate * t
        # velocity dir = (-sin yaw, cos yaw) * speed -> accel = d/dt
        a_world = speed * yaw_rate * np.array(
            [-math.cos(yaw), -math.sin(yaw), 0.0])
        Rz = np.array([[math.cos(yaw), -math.sin(yaw), 0],
                       [math.sin(yaw), math.cos(yaw), 0], [0, 0, 1]])
        # the app mirrors the reference's SetGravity((0, 0, +9.8))
        # (main.cpp:229-231), and the integrator is v_dot = R a_body + g —
        # a consistent accelerometer reads a_body = R^T (a_world - g)
        a_body = Rz.T @ (a_world - np.array([0, 0, G]))
        if fmt == "ref":
            recs.append((t, "ODO %.6f %.6f %.6f" % (t, speed, speed)))
            recs.append((t, "IMU %.6f 0 0 %.9f %.9f %.9f %.9f"
                         % (t, yaw_rate, *a_body)))
        else:
            recs.append((t, "imu,%.6f,0,0,%.9f,%.9f,%.9f,%.9f"
                         % (t, yaw_rate, *a_body)))
    for i in range(n_gps):
        t = i / gps_hz
        p, _ = pose_of(t)
        p = p + rng.normal(size=3) * noise_gps * np.array([1, 1, 0])
        if fmt == "ref":
            # UTM easting/northing offsets (re-based by the parser)
            recs.append((t, "UTM %.6f %.6f %.6f %.6f"
                         % (t, p[0] + 500000.0, p[1] + 4000000.0, p[2])))
        else:
            recs.append((t, "gps,%.6f,%.6f,%.6f,%.6f" % (t, *p)))
    recs.sort(key=lambda r: r[0])
    Path(path).write_text("\n".join(r[1] for r in recs) + "\n")
    print(f"wrote {len(recs)} records to {path}")


def build_problem_from_records(imu_arr, gps_rows, guesses):
    """Build the pose-graph problem the reference builds in f_gps
    (main.cpp:141-219): one pose per GPS fix with a dead-reckoned guess,
    a loose UTM unary prior, and an IMU preintegration residual per
    interval.  Returns (problem, config) ready for solve(25, 0.2)."""
    import dataclasses

    from ba_tpu.core.problem import BAConfig, ProblemBuilder
    from ba_tpu.native import InterpolationBuffer, available
    from ba_tpu.solver.assemble import band_width_of

    imu_buf = InterpolationBuffer(6) if available() else None
    if imu_buf is not None:
        for row in imu_arr:
            imu_buf.add(row[0], list(row[1:7]))

    cfg = BAConfig(pose_dim=9, lm_size=0, use_dogleg=False,
                   trust_region_size=1e5, enable_auto_regularization=False)
    b = ProblemBuilder(cfg)
    b.set_gravity([0.0, 0.0, 9.8])        # reference main.cpp:229-231
    # reference GPS prior: [1000, 1000, 30000, DBL_MAX...] (main.cpp:176-183)
    cov = np.diag([1000.0, 1000.0, 30000.0, DBL_MAX, DBL_MAX, DBL_MAX])

    ids = []
    q = np.array([1.0, 0, 0, 0])
    t_est = np.zeros(3)
    prev_t = None
    for (tt, x, y, z), (dq, dt_vec) in zip(gps_rows, guesses):
        if prev_t is None:
            # first pose at the origin (main.cpp:162-166)
            q = np.array([1.0, 0, 0, 0])
            t_est = np.zeros(3)
        else:
            # estimate = recent_pose * incremental_gyro_update
            # (main.cpp:168-172); the gyro update's translation comes from
            # the ODO wheel speed (main.cpp:67-84)
            t_est = t_est + _quat_rotate(q, dt_vec)
            q = _quat_mul(q, dq)
            q = q / np.linalg.norm(q)
        ids.append(b.add_pose(q, t_est, active=True, time=tt))
        # identity-rotation UTM prior, rotation rows unconstrained
        # (main.cpp:157-183)
        b.add_unary_constraint(ids[-1], [1.0, 0, 0, 0], [x, y, z], cov=cov)
        if prev_t is not None:
            if imu_buf is not None:
                ts, vals = imu_buf.get_range(prev_t, tt)
                w, a = vals[:, :3], vals[:, 3:]
            else:
                seg = imu_arr[(imu_arr[:, 0] >= prev_t)
                              & (imu_arr[:, 0] <= tt)]
                ts, w, a = seg[:, 0], seg[:, 1:4], seg[:, 4:7]
            if len(ts) == 0:
                raise ValueError("Could not find imu measurements between "
                                 f"{prev_t} and {tt}")
            b.add_imu_residual(ids[-2], ids[-1], w, a, ts)
        prev_t = tt

    problem = b.build()
    # pure odometry chain: band width 2 (consecutive-pose IMU residuals
    # only) — banded-grid assembly fast path
    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem))
    return problem, cfg


def run_streaming(imu_arr, gps_rows, guesses, W, out,
                  iters_per_slide=6):
    """Online fixed-lag variant of the smoother: the reference f_gps
    pattern driven through `solver.streaming.StreamingRing` — one pose +
    unary prior + IMU span in per GPS fix, one retired-keyframe estimate
    out per fix once the window is warm.  Pose-graph mode (lm_size=0).

    Runs in f64 on CPU, like the reference binary (double throughout):
    the GPS priors' DBL_MAX "unconstrained" rows put a ~1e15 condition
    number into the marginalization Schur complement, which f32 cannot
    carry across slides (measured: f64 tracks the 25-iteration batch
    solve to 0.1 m RMSE; f32 diverges even with capped covariances).
    This is a host-scale problem (tens of poses) — the vision-scale
    f32 streaming path is `apps/vins_stream.py`."""
    import time as _time

    import jax

    # must precede backend init; the batch path below never runs in this
    # mode, so the process-wide switch is safe
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ba_tpu.core import camera as cam_mod
    from ba_tpu.core.problem import BAConfig, Rig
    from ba_tpu.native import InterpolationBuffer, available
    from ba_tpu.solver.streaming import RingCapacities, StreamingRing

    if len(gps_rows) < W + 1:
        raise SystemExit(
            f"--stream {W} needs at least {W + 1} GPS fixes to retire a "
            f"keyframe; the log has {len(gps_rows)} (use the batch mode)")
    # same measurement pairing as the batch path: interpolated-boundary
    # IMU spans through the native InterpolationBuffer when available
    imu_buf = InterpolationBuffer(6) if available() else None
    if imu_buf is not None:
        for row in imu_arr:
            imu_buf.add(row[0], list(row[1:7]))

    cfg = BAConfig(pose_dim=9, lm_size=0, use_dogleg=False,
                   enable_auto_regularization=False)
    rig = Rig(params=jnp.zeros((1, cam_mod.MAX_PARAMS)),
              model=jnp.zeros((1,), jnp.int32),
              tvs_q=jnp.asarray([[1.0, 0, 0, 0]]),
              tvs_t=jnp.zeros((1, 3)))
    # IMU-span capacity from the densest inter-fix interval
    tt = np.array([r[0] for r in gps_rows])
    spans = [int(((imu_arr[:, 0] >= a) & (imu_arr[:, 0] <= b)).sum())
             for a, b in zip(tt[:-1], tt[1:])]
    caps = RingCapacities(L_w=1, n_proj=1, n_imu=max(W - 1, 1),
                          n_unary=W, imu_span=max(spans + [1]) + 2,
                          n_ipair=max(W - 1, 1))
    ring = StreamingRing(cfg, W, rig, jnp.asarray([0.0, 0.0, 9.8]),
                         caps, use_imu=True,
                         iters_per_slide=iters_per_slide,
                         dtype=np.float64, gn_damping=1.0)

    cov = np.diag([1000.0, 1000.0, 30000.0, DBL_MAX, DBL_MAX, DBL_MAX])
    q = np.array([1.0, 0, 0, 0])
    t_est = np.zeros(3)
    prev_t = None
    outs = []
    t0 = _time.perf_counter()
    for (fix_t, x, y, z), (dq, dt_vec) in zip(gps_rows, guesses):
        if prev_t is not None:
            t_est = t_est + _quat_rotate(q, dt_vec)
            q = _quat_mul(q, dq)
            q = q / np.linalg.norm(q)
        g = ring.add_pose(q, t_est, time=fix_t)
        ring.add_unary(g, [1.0, 0, 0, 0], [x, y, z], np.linalg.inv(cov))
        if prev_t is not None:
            if imu_buf is not None:
                ts, vals = imu_buf.get_range(prev_t, fix_t)
                w_m, a_m = vals[:, :3], vals[:, 3:]
            else:
                seg = imu_arr[(imu_arr[:, 0] >= prev_t)
                              & (imu_arr[:, 0] <= fix_t)]
                ts, w_m, a_m = seg[:, 0], seg[:, 1:4], seg[:, 4:7]
            ring.add_imu(g - 1, g, w_m, a_m, ts)
        o = ring.push(block=False)
        if o is not None:
            outs.append(o)
        prev_t = fix_t
    outs = jax.device_get(outs)
    dt = _time.perf_counter() - t0
    n = len(outs)
    print(f"streamed {len(gps_rows)} fixes, retired {n} "
          f"({n / max(dt, 1e-9):.1f}/s incl. compile); "
          f"last cost {float(outs[-1]['cost']):.4g}")
    win = ring.current_window()
    with open(out, "w") as fh:
        for o in outs:
            fh.write(",".join(
                f"{v:.6f}" for v in
                [gps_rows[o['pose']][0]] + list(o["t"])) + "\n")
        # the live window's current estimates complete the trajectory
        for g in range(n, len(gps_rows)):
            fh.write(",".join(
                f"{v:.6f}" for v in
                [gps_rows[g][0]] + list(win["t"][g % W])) + "\n")
    print(f"wrote optimized trajectory to {out}")
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", help="input log file")
    ap.add_argument("--generate", type=int, metavar="N_GPS",
                    help="write a synthetic reference-format log")
    ap.add_argument("--generate-csv", type=int, metavar="N_GPS",
                    help="write a synthetic CSV-format log")
    ap.add_argument("--stream", type=int, metavar="W",
                    help="online fixed-lag streaming smoother with "
                         "window W (reference f_gps incremental pattern)")
    ap.add_argument("--out", default="trajectory.csv")
    args = ap.parse_args()

    if args.generate or args.generate_csv:
        generate_log(args.log or "synthetic_log.txt",
                     args.generate or args.generate_csv,
                     fmt="ref" if args.generate else "csv")
        return 0

    if not args.log:
        ap.error("log file required (or --generate)")

    import jax

    if args.stream:
        # must precede ANY backend initialization (ba_tpu import /
        # device queries): the stream mode runs f64 on CPU (see
        # run_streaming's docstring)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if not args.stream:
        jax.config.update("jax_enable_x64", False)

    from ba_tpu.solver import step as step_mod

    # --- parse ------------------------------------------------------------
    imu_arr, gps_rows, guesses = parse_log(args.log)
    print(f"parsed {len(imu_arr)} imu samples, {len(gps_rows)} gps fixes")

    if args.stream:
        run_streaming(imu_arr, gps_rows, guesses, args.stream, args.out)
        return 0

    problem, cfg = build_problem_from_records(imu_arr, gps_rows, guesses)
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
