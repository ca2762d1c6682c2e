"""End-to-end VINS pipeline on reference-format CSV sequences.

Consumes the five-file CSV format of the reference's offline generator
(/root/reference/matlab/simulate_vins.py:236-240 — points/accel/gyro/
poses/timestamps), triangulates landmarks from the observations (the
format carries no landmark positions), runs the visual-inertial solver
from a perturbed start, and writes the optimized trajectory + ATE vs the
file's ground-truth poses.

    python apps/vins_csv.py --generate /tmp/seq --poses 48 --lms 160
    python apps/vins_csv.py /tmp/seq --perturb 0.02
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _triangulate(sim):
    """Midpoint triangulation of each landmark from its first two
    observing poses (the CSV format stores observations only)."""
    import jax.numpy as jnp

    from ba_tpu.core import camera as cam_mod
    from ba_tpu.io.simulate_vins import R_VS

    by_lm = {}
    for (i, j, z) in sim.obs:
        by_lm.setdefault(j, []).append((i, np.asarray(z)))

    params = np.zeros(cam_mod.MAX_PARAMS)
    params[: len(sim.cam_params)] = sim.cam_params
    n_lms = sim.lms_w.shape[0]
    lms_w = np.zeros((n_lms, 3))
    ok = np.zeros(n_lms, bool)
    from scipy.spatial.transform import Rotation

    def R_of(qv):
        w, x, y, z = qv
        return Rotation.from_quat([x, y, z, w]).as_matrix()

    R_vs = R_of(sim.tvs_q)
    for j, obs in by_lm.items():
        firsts = {}
        for (i, z) in obs:
            firsts.setdefault(i, z)
        if len(firsts) < 2:
            continue
        (i0, z0), (i1, z1) = list(firsts.items())[:2]
        o, d = [], []
        for (i, z) in ((i0, z0), (i1, z1)):
            ray_s = np.asarray(cam_mod.unproject(
                jnp.asarray(params), cam_mod.MODEL_FOV, jnp.asarray(z)))
            R_ws = R_of(sim.q_wv[i]) @ R_vs
            o.append(sim.t_wv[i] + R_of(sim.q_wv[i]) @ sim.tvs_t)
            d.append(R_ws @ ray_s)
        # midpoint of closest approach
        o0, o1 = o
        d0, d1 = d
        b = o1 - o0
        d00, d01, d11 = d0 @ d0, d0 @ d1, d1 @ d1
        den = d00 * d11 - d01 * d01
        if abs(den) < 1e-9:
            continue
        s = (d11 * (b @ d0) - d01 * (b @ d1)) / den
        t = (d01 * (b @ d0) - d00 * (b @ d1)) / den
        p0 = o0 + s * d0
        p1 = o1 + t * d1
        if s <= 0.05 or t <= 0.05:
            continue
        lms_w[j] = 0.5 * (p0 + p1)
        ok[j] = True
    # drop untriangulated landmarks' observations
    sim.obs = [(i, j, z) for (i, j, z) in sim.obs if ok[j]]
    sim.lms_w = lms_w
    return int(ok.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--generate", action="store_true",
                    help="write a synthetic sequence to seq_dir first")
    ap.add_argument("--poses", type=int, default=48)
    ap.add_argument("--lms", type=int, default=160)
    ap.add_argument("--perturb", type=float, default=0.02)
    ap.add_argument("--max-iter", type=int, default=25)
    ap.add_argument("--out", default="trajectory_vins.csv")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ba_tpu.core.problem import BAConfig
    from ba_tpu.io import csvio
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import step as step_mod
    from ba_tpu.solver.assemble import band_width_of

    if args.generate:
        sim = sv.simulate(n_poses=args.poses, n_lms=args.lms, seed=3)
        os.makedirs(args.seq_dir, exist_ok=True)
        csvio.write_csv(sim, args.seq_dir)
        print(f"wrote reference-format sequence to {args.seq_dir}")

    sim = csvio.read_csv(args.seq_dir)
    # the reference CSV format stores no velocities — initialize them by
    # central finite differences of the pose positions
    sim.v_w = np.gradient(sim.t_wv, sim.pose_times, axis=0)
    n_tri = _triangulate(sim)
    print(f"read {len(sim.pose_times)} poses, {len(sim.obs)} observations, "
          f"{len(sim.imu_spans)} IMU spans; triangulated {n_tri} landmarks")

    gt_t = sim.t_wv.copy()
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    problem, pose_ids, _ = sv.build_problem(sim, cfg, perturb=args.perturb,
                                            seed=11)
    import dataclasses

    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem))
    solved, summary = step_mod.solve(problem, cfg, max_iter=args.max_iter,
                                     use_imu=True)
    P = len(sim.pose_times)
    t_est = np.asarray(solved.poses.t[:P])
    ate = sv.ate(None, t_est, None, gt_t)
    print(f"solve: {summary.result}, {summary.iterations} iters, "
          f"cost {summary.initial_cost:.4g} -> {summary.final_cost:.4g}")
    print(f"ATE vs file ground truth: {ate * 100:.3f} cm")

    with open(args.out, "w") as f:
        for i in range(P):
            q = np.asarray(solved.poses.q[i])
            t = t_est[i]
            f.write(",".join(f"{v:.9g}" for v in
                             [sim.pose_times[i], *t, *q]) + "\n")
    print(f"wrote optimized trajectory to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
