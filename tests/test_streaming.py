"""Online streaming fixed-lag smoother == batch ring to f64 roundoff.

The StreamingRing accepts one keyframe + its measurements at a time (the
reference's incremental `f_gps` pattern, main.cpp:141-219) and drives the
SAME slide-step function as the batch scan on VALUE-IDENTICAL tables
(verified field-by-field below).  The emitted trajectories agree to f64
roundoff; exact bitwise equality is not attainable because the scan-
embedded and standalone-jitted compilations of the step reassociate
differently at the ulp level (measured <= 6e-15 m over 17 slides on
value-identical inputs — an XLA fusion artifact, not a semantic
difference).
"""

import numpy as np

from ba_tpu.core.problem import BAConfig, prepare_landmarks
from ba_tpu.io import simulate_vins as sv
from ba_tpu.solver import fixedlag
from ba_tpu.solver.streaming import RingCapacities, StreamingRing


def _problem(n_poses=24, n_lms=96, seed=0):
    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=seed)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=seed + 1,
                                     with_marg_prior=False)
    return prepare_landmarks(problem, cfg), cfg


def _stream_from_problem(problem, cfg, W, iters, caps, push_all=True):
    """Feed a built problem's data keyframe-by-keyframe into a
    StreamingRing (measurements grouped by arriving pose, original row
    order preserved within each group)."""
    po, lm, pr, imu = problem.poses, problem.lms, problem.proj, problem.imu
    P = int(po.q.shape[0])
    ref = np.asarray(lm.ref_pose)
    act = np.asarray(lm.active)
    # sequential-id contract: landmark ids ordered by reference pose
    assert (np.diff(ref[act]) >= 0).all()
    prv, prp = np.asarray(pr.valid), np.asarray(pr.pose)
    prl = np.asarray(pr.lm)
    iv, ip1 = np.asarray(imu.valid), np.asarray(imu.pose1)

    ring = StreamingRing(cfg, W, problem.rig, problem.g_vec, caps,
                         use_imu=True, iters_per_slide=iters)
    outs = []
    for g in range(P):
        gid = ring.add_pose(np.asarray(po.q[g]), np.asarray(po.t[g]),
                            np.asarray(po.v[g]), np.asarray(po.b[g]),
                            float(po.time[g]), np.asarray(po.mask[g]))
        assert gid == g
        for lid in np.where(act & (ref == g))[0]:
            z_ref = (np.asarray(lm.z_ref[lid])
                     if bool(lm.has_z_ref[lid]) else None)
            sid = ring.add_landmark(np.asarray(lm.x_w[lid]), g,
                                    int(lm.ref_cam[lid]), z_ref=z_ref)
            assert sid == lid
        for r in np.where(prv & (prp == g))[0]:
            ring.add_projection(np.asarray(pr.z[r]), g, int(prl[r]),
                                int(pr.cam[r]), float(pr.weight[r]),
                                bool(pr.cond[r]))
        if g >= 1:
            for r in np.where(iv & (ip1 == g - 1))[0]:
                mv = np.asarray(imu.meas_valid[r])
                n = int(mv.sum())
                ring.add_imu(g - 1, g, np.asarray(imu.w[r])[:n],
                             np.asarray(imu.a[r])[:n],
                             np.asarray(imu.time[r])[:n],
                             cond=bool(imu.cond[r]))
        out = ring.push()
        if out is not None:
            outs.append(out)
    return ring, outs


def test_streaming_matches_batch_ring():
    problem, cfg = _problem()
    W, iters = 8, 2
    P = int(problem.poses.q.shape[0])
    n_slides = P - W + 1          # one slide per keyframe past warm-up

    sched = fixedlag.build_ring_schedule(problem, cfg, W, n_slides)
    carry_b, outs_b = fixedlag.run_ring(sched, cfg, True, iters)
    caps = RingCapacities.from_schedule(sched)

    ring, outs_s = _stream_from_problem(problem, cfg, W, iters, caps)
    assert len(outs_s) == n_slides
    for k, o in enumerate(outs_s):
        assert o["pose"] == k
        for f in ("q", "v", "b"):
            # atol covers tiny components whose relative error is
            # roundoff-amplified by the prior's eigendecomposition
            np.testing.assert_allclose(
                o[f], np.asarray(outs_b[f][k]), rtol=1e-7, atol=1e-10,
                err_msg=f"slide {k} field {f}")
        np.testing.assert_allclose(o["t"], np.asarray(outs_b["t"][k]),
                                   rtol=1e-7, atol=1e-10,
                                   err_msg=f"slide {k} t")
        np.testing.assert_allclose(o["cost"],
                                   np.asarray(outs_b["cost"][k]),
                                   rtol=1e-6, atol=1e-12,
                                   err_msg=f"slide {k} cost")

    # final carry (window states + FEJ prior) agrees too
    for a, bb in zip(ring._carry[:5], carry_b[:5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ring._carry[5].H),
                               np.asarray(carry_b[5].H),
                               rtol=1e-6, atol=1e-3)


def test_streaming_push_cadence_and_retire():
    """push() returns None during warm-up, then exactly one retired
    keyframe per arriving keyframe; buffers stay O(window)."""
    problem, cfg = _problem(n_poses=16, n_lms=64, seed=2)
    W = 6
    sched = fixedlag.build_ring_schedule(problem, cfg, W,
                                         int(problem.poses.q.shape[0])
                                         - W + 1)
    caps = RingCapacities.from_schedule(sched)
    ring, outs = _stream_from_problem(problem, cfg, W, 2, caps)
    assert [o["pose"] for o in outs] == list(range(16 - W + 1))
    # O(window) buffers after the run
    assert len(ring._poses) <= W
    assert all(d["ref_pose"] > outs[-1]["pose"]
               for d in ring._lms.values())
    # retired trajectory is near the (noiseless-simulation) ground truth
    costs = np.array([float(o["cost"]) for o in outs])
    assert costs[-1] < 1e-4, costs


def test_streaming_tables_value_identical_to_batch():
    """Every slide table the streaming smoother builds equals the batch
    schedule's slice exactly (the step program input contract)."""
    import jax

    problem, cfg = _problem(n_poses=16, n_lms=64, seed=2)
    W, iters = 6, 2
    P = int(problem.poses.q.shape[0])
    n_slides = P - W + 1
    sched = fixedlag.build_ring_schedule(problem, cfg, W, n_slides)
    caps = RingCapacities.from_schedule(sched)

    captured = {}
    orig = StreamingRing._slide_tables

    def capture(self, k):
        d = orig(self, k)
        captured[k] = d
        return d

    StreamingRing._slide_tables = capture
    try:
        _stream_from_problem(problem, cfg, W, iters, caps)
    finally:
        StreamingRing._slide_tables = orig

    import jax.numpy as jnp

    from ba_tpu.solver.streaming import prepare_rows

    assert sorted(captured) == list(range(n_slides))
    pidx_fields = ("pair_a", "pair_b", "wb_pose", "wb_lm", "bpair_a",
                   "bpair_b", "ipair_a", "ipair_b", "sp_i", "sp_j",
                   "sp_valid")
    for k, d in captured.items():
        for key, val in d.items():
            if key in pidx_fields:
                np.testing.assert_array_equal(
                    np.asarray(val),
                    np.asarray(getattr(sched.inputs["pidx"], key))[k],
                    err_msg=f"slide {k} pidx.{key}")
            elif key in ("pose_cam_params", "lm_x_w", "drop_slot",
                         "new_lm_mask"):
                continue        # checked below / unused / layout-local
            elif key in sched.inputs:
                np.testing.assert_array_equal(
                    np.asarray(val), np.asarray(sched.inputs[key])[k],
                    err_msg=f"slide {k} {key}")
        assert int(d["drop_slot"][0]) == k % W
        # the in-program landmark preparation must reproduce the batch
        # pre-prepared values bitwise (rowwise-elementwise math)
        rp = d["lm_ref_pose"]
        x = np.asarray(prepare_rows(
            jnp.asarray(d["lm_x_w"]), jnp.asarray(d["new_q"])[rp],
            jnp.asarray(d["new_t"])[rp], sched.rig,
            jnp.asarray(d["lm_ref_cam"]), jnp.asarray(d["lm_z_ref"]),
            jnp.asarray(d["lm_has_z_ref"]), cfg))
        eff = np.where(d["new_lm_mask"][:, None], x, 0.0)
        if k == 0:
            # slide 0 loads via new_lm_mask (batch: via carry0)
            np.testing.assert_array_equal(d["new_lm_mask"],
                                          d["lm_active"])
            np.testing.assert_array_equal(
                eff, np.asarray(sched.carry0[4]), err_msg="carry0 lx")
        else:
            np.testing.assert_array_equal(
                d["new_lm_mask"], np.asarray(sched.inputs["new_lm_mask"])[k])
            np.testing.assert_array_equal(
                eff, np.asarray(sched.inputs["new_lm_x"])[k],
                err_msg=f"slide {k} new_lm_x")
