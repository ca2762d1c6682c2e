"""Multi-device equivalence: 1-shard vs 8-shard assembly and GN iterations
must agree (the multi-host test class the reference lacks, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ba_tpu.parallel import shard
from ba_tpu.solver import assemble as asm_mod
from ba_tpu.solver import step as step_mod
from ba_tpu.core.problem import prepare_landmarks

from test_solver_reprojection import make_scene


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_assembly_matches_single_device():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    # pad residual tables to the mesh size
    # (make_scene built with pad_multiple=1; rebuild padded)
    from test_solver_reprojection import make_scene as _  # noqa
    # reuse builder-level padding by padding arrays here
    problem = _pad_problem(problem, 8)

    ref = asm_mod.assemble(problem, cfg)
    got = shard.sharded_assemble(problem, cfg, False, mesh)
    np.testing.assert_allclose(got.S, ref.S, atol=1e-8)
    np.testing.assert_allclose(got.rhs_sc, ref.rhs_sc, atol=1e-8)
    np.testing.assert_allclose(got.V, ref.V, atol=1e-8)
    np.testing.assert_allclose(got.cost, ref.cost, atol=1e-8)


def _pad_problem(problem, mult):
    """Pad residual tables to a multiple of `mult` with invalid rows."""

    def pad_table(table):
        def pad(a):
            if a.ndim == 0:     # scalar state (e.g. imu.c9_set)
                return a
            n = a.shape[0]
            m = (-n) % mult
            if m == 0:
                return a
            fill = jnp.zeros((m,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, fill], 0)

        return jax.tree_util.tree_map(pad, table)

    return dataclasses.replace(
        problem,
        proj=pad_table(problem.proj),
        unary=pad_table(problem.unary),
        binary=pad_table(problem.binary),
        imu=pad_table(problem.imu),
    )


def test_sharded_gn_converges_like_single():
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02)
    problem = prepare_landmarks(problem, cfg)
    problem = _pad_problem(problem, 8)
    mesh = shard.make_mesh(8)

    p_single = problem
    p_shard = jax.device_put(problem,
                             shard.problem_shardings(problem, mesh))
    for _ in range(5):
        r1 = step_mod.gn_iteration(p_single, cfg, False, 1.0, False)
        r2 = shard.sharded_gn_iteration(p_shard, cfg, False, mesh)
        p_single, p_shard = r1.problem, r2.problem
        np.testing.assert_allclose(float(r1.post_cost), float(r2.post_cost),
                                   rtol=1e-6, atol=1e-9)
    assert float(r2.post_cost) < 1e-4


# ---------------------------------------------------------------------------
# Landmark-sharded distributed Schur (partition + sharded_gn_iteration_lm)
# ---------------------------------------------------------------------------


def _pad_pose_tables(problem, mult):
    """Pad only the pose-space residual tables (unary/binary/imu); the
    projection/landmark tables are laid out by partition_by_landmark."""

    def pad_table(table):
        def pad(a):
            if a.ndim == 0:
                return a
            n = a.shape[0]
            m = (-n) % mult
            if m == 0:
                return a
            fill = jnp.zeros((m,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, fill], 0)

        return jax.tree_util.tree_map(pad, table)

    return dataclasses.replace(
        problem,
        unary=pad_table(problem.unary),
        binary=pad_table(problem.binary),
        imu=pad_table(problem.imu),
    )


def test_landmark_sharded_gn_matches_single():
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)

    # per-device landmark chunk is 1/8 of the table
    L = problem.lms.x.shape[0]
    assert L % 8 == 0

    p_single = problem
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    for _ in range(5):
        r1 = step_mod.gn_iteration(p_single, cfg, False, 1.0, False)
        r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, False, mesh)
        np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                                   rtol=1e-6, atol=1e-11)
        np.testing.assert_allclose(float(r1.post_cost),
                                   float(r2.post_cost), rtol=1e-6,
                                   atol=1e-9)
        p_single, p_shard = r1.problem, r2.problem
    assert float(r2.post_cost) < 1e-4


def test_landmark_sharded_robust_matches_single():
    """Global-median robust weighting must be shard-count invariant in the
    landmark-sharded layout too."""
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02, seed=9)
    cfg = dataclasses.replace(cfg,
                              use_robust_norm_for_proj_residuals=True)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    r1 = step_mod.gn_iteration(problem, cfg, False, 1.0, False)
    r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, False, mesh)
    np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                               rtol=1e-8)
    np.testing.assert_allclose(float(r1.post_cost), float(r2.post_cost),
                               rtol=1e-6, atol=1e-9)


def test_partition_preserves_problem_semantics():
    """Partitioning is a pure relayout: costs at the same state match."""
    from ba_tpu.parallel.partition import partition_by_landmark
    from ba_tpu.solver.assemble import assemble, evaluate_cost

    problem, cfg = make_scene(n_poses=6, n_lms=30, perturb=0.02, seed=4)
    part = partition_by_landmark(problem, cfg, 4)
    p1 = prepare_landmarks(problem, cfg)
    p2 = prepare_landmarks(part, cfg)
    c1 = float(evaluate_cost(p1, cfg))
    c2 = float(evaluate_cost(p2, cfg))
    np.testing.assert_allclose(c1, c2, rtol=1e-10)
    a1 = assemble(p1, cfg)
    a2 = assemble(p2, cfg)
    np.testing.assert_allclose(np.asarray(a1.S), np.asarray(a2.S),
                               atol=1e-8)


def test_landmark_sharded_dogleg_matches_single():
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.03, seed=6)
    cfg = dataclasses.replace(cfg, use_dogleg=True)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    trust1 = trust2 = jnp.asarray(-1.0, problem.poses.t.dtype)
    for _ in range(4):
        r1 = step_mod.dogleg_iteration(problem, cfg, False, trust1)
        r2 = shard.sharded_dogleg_iteration_lm(p_shard, cfg, False, mesh,
                                               trust2)
        np.testing.assert_allclose(float(r1.post_cost),
                                   float(r2.post_cost), rtol=1e-6,
                                   atol=1e-9)
        problem, p_shard = r1.problem, r2.problem
        trust1, trust2 = r1.trust_radius, r2.trust_radius
    assert float(r2.post_cost) < 1e-3


def test_sharded_solve_fixed_converges():
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02, seed=7)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    out, costs, _ = shard.sharded_solve_fixed(p_shard, cfg, False, mesh, 8)
    assert float(costs[-1]) < 1e-4, costs


# ---------------------------------------------------------------------------
# CG-in-shard_map: matrix-free sharded reduced solve (use_cg_solver)
# ---------------------------------------------------------------------------


def _cg_cfg(cfg):
    return dataclasses.replace(cfg, use_cg_solver=True,
                               cg_max_iterations=400, cg_tolerance=1e-12)


def test_sharded_cg_gn_matches_single_cg():
    """Landmark-sharded matrix-free CG == single-device CG, per iteration."""
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02)
    cfg = _cg_cfg(cfg)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_single = problem
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    for _ in range(5):
        r1 = step_mod.gn_iteration(p_single, cfg, False, 1.0, False)
        r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, False, mesh)
        np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                                   rtol=1e-6, atol=1e-11)
        np.testing.assert_allclose(float(r1.post_cost),
                                   float(r2.post_cost), rtol=1e-6,
                                   atol=1e-9)
        p_single, p_shard = r1.problem, r2.problem
    assert float(r2.post_cost) < 1e-4


def test_sharded_cg_step_matches_sharded_dense():
    """One sharded CG step == one sharded dense-S step (same build)."""
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02, seed=3)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    r_dense = shard.sharded_gn_iteration_lm(p_shard, cfg, False, mesh)
    r_cg = shard.sharded_gn_iteration_lm(p_shard, _cg_cfg(cfg), False, mesh)
    np.testing.assert_allclose(float(r_cg.pre_cost),
                               float(r_dense.pre_cost), rtol=1e-10)
    np.testing.assert_allclose(float(r_cg.post_cost),
                               float(r_dense.post_cost), rtol=1e-5,
                               atol=1e-9)


def test_sharded_cg_dogleg_matches_single():
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.03, seed=6)
    cfg = dataclasses.replace(_cg_cfg(cfg), use_dogleg=True)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    trust1 = trust2 = jnp.asarray(-1.0, problem.poses.t.dtype)
    for _ in range(4):
        r1 = step_mod.dogleg_iteration(problem, cfg, False, trust1)
        r2 = shard.sharded_dogleg_iteration_lm(p_shard, cfg, False, mesh,
                                               trust2)
        np.testing.assert_allclose(float(r1.post_cost),
                                   float(r2.post_cost), rtol=1e-6,
                                   atol=1e-9)
        problem, p_shard = r1.problem, r2.problem
        trust1, trust2 = r1.trust_radius, r2.trust_radius
    assert float(r2.post_cost) < 1e-3


def test_sharded_cg_with_imu_and_marg():
    """VI problem with IMU residuals + a marginalization prior through the
    sharded CG path: must match the single-device CG iteration."""
    import ba_tpu.io.simulate_vins as sv
    from ba_tpu.core.problem import BAConfig
    from ba_tpu.parallel.partition import partition_by_landmark
    from ba_tpu.solver import window as window_mod

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False,
                   use_cg_solver=True, cg_max_iterations=400,
                   cg_tolerance=1e-12)
    sim = sv.simulate(n_poses=12, n_lms=32, seed=2)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.02, seed=3)
    P_n = int(problem.poses.q.shape[0])
    problem = window_mod.apply_marginalization(
        problem, cfg, True, jnp.zeros(P_n, bool).at[0].set(True))
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    r1 = step_mod.gn_iteration(problem, cfg, True, 1.0, False)
    r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, True, mesh)
    np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                               rtol=1e-8)
    # post-costs agree only to (condition x cg_tolerance): the psum
    # reduction order perturbs the CG iterates on this ill-conditioned
    # VI+marg system
    np.testing.assert_allclose(float(r1.post_cost), float(r2.post_cost),
                               rtol=5e-4)
    assert float(r2.post_cost) < float(r2.pre_cost)


def test_sharded_cg_solve_fixed_converges():
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02, seed=7)
    cfg = _cg_cfg(cfg)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    out, costs, _ = shard.sharded_solve_fixed(p_shard, cfg, False, mesh, 8)
    assert float(costs[-1]) < 1e-4, costs


def test_multihost_glue_single_process():
    """multihost helpers degenerate to the local path in one process: the
    globally-placed problem must solve identically to device_put."""
    from ba_tpu.parallel import multihost
    from ba_tpu.parallel.partition import partition_by_landmark

    multihost.initialize()          # no-op single-process
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.02, seed=13)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = multihost.make_global_mesh()
    assert mesh.devices.size >= 8

    mesh8 = shard.make_mesh(8)
    p_global = multihost.global_problem_from_local(problem, mesh8)
    r = shard.sharded_gn_iteration_lm(p_global, cfg, False, mesh8)
    r_ref = step_mod.gn_iteration(problem, cfg, False, 1.0, False)
    np.testing.assert_allclose(float(r.post_cost), float(r_ref.post_cost),
                               rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# Banded-in-shard_map: the band of S crosses the ICI (O(P*B*D^2)), never a
# dense (N, N) matrix (use_banded_solver under the sharded entry points)
# ---------------------------------------------------------------------------


def _banded_vins_problem(n_poses, n_lms, seed=0, pose_dim=9):
    """simulate_vins scene (limited visibility -> a real band), partitioned
    by landmark over 8 shards, banded config."""
    from ba_tpu.core.problem import BAConfig
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.parallel.partition import partition_by_landmark
    from ba_tpu.solver.assemble import band_width_of

    cfg = BAConfig(pose_dim=pose_dim, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=seed)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.02, seed=seed + 1)
    cfg = dataclasses.replace(cfg, band_width=band_width_of(problem),
                              use_banded_solver=True)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    return problem, cfg


def test_sharded_banded_gn_matches_single_banded():
    """Landmark-sharded banded GN == single-device banded GN, per
    iteration (scan-factor regime: few chunks)."""
    problem, cfg = _banded_vins_problem(n_poses=24, n_lms=64)
    mesh = shard.make_mesh(8)
    p_single = problem
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    for _ in range(4):
        r1 = step_mod.gn_iteration(p_single, cfg, False, 1.0, False)
        r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, False, mesh)
        np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                                   rtol=1e-6, atol=1e-11)
        np.testing.assert_allclose(float(r1.post_cost),
                                   float(r2.post_cost), rtol=1e-6,
                                   atol=1e-9)
        p_single, p_shard = r1.problem, r2.problem
    assert float(r2.post_cost) < float(r2.pre_cost) or \
        float(r2.post_cost) < 1e-3


def test_sharded_banded_bcr_matches_single():
    """80-pose window: the chunk chain is 5 long, so the sharded banded
    path runs the batched BLOCK CYCLIC REDUCTION factorization inside
    shard_map; must still match the single-device step."""
    problem, cfg = _banded_vins_problem(n_poses=80, n_lms=200, seed=2)
    assert cfg.banded_cyclic_reduction
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    r1 = step_mod.gn_iteration(problem, cfg, False, 1.0, False)
    r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, False, mesh)
    np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                               rtol=1e-8)
    np.testing.assert_allclose(float(r1.post_cost), float(r2.post_cost),
                               rtol=1e-6, atol=1e-9)


def test_sharded_banded_solve_fixed_converges():
    problem, cfg = _banded_vins_problem(n_poses=24, n_lms=64, seed=5)
    mesh = shard.make_mesh(8)
    p_shard = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    out, costs, _ = shard.sharded_solve_fixed(p_shard, cfg, False, mesh, 8)
    assert float(costs[-1]) < 1e-3, costs


def test_sharded_gn_rollback_on_error_increase():
    """Sharded twin of test_diagnostics.test_gn_rollback_on_error_increase:
    a cost-increasing damped step on the mesh must report the committed
    cost and a zero delta_norm (round-4 VERDICT weak #1)."""
    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.01)
    problem = prepare_landmarks(problem, cfg)
    problem = _pad_problem(problem, 8)
    mesh = shard.make_mesh(8)
    p = jax.device_put(problem, shard.problem_shardings(problem, mesh))
    # converge, then force a 3x-overshoot damped step -> rejection
    for _ in range(6):
        p = shard.sharded_gn_iteration(p, cfg, False, mesh).problem
    res = shard.sharded_gn_iteration(p, cfg, False, mesh, gn_damping=3.0)
    assert not bool(res.accepted)
    assert float(res.post_cost) == float(res.pre_cost)
    assert float(res.delta_norm) == 0.0
    np.testing.assert_array_equal(np.asarray(res.problem.poses.t),
                                  np.asarray(jax.device_get(p).poses.t))


def test_sharded_gn_lm_rollback_on_error_increase():
    """Same rejected-cost contract for the landmark-sharded iteration."""
    from ba_tpu.parallel.partition import partition_by_landmark

    problem, cfg = make_scene(n_poses=8, n_lms=40, perturb=0.01)
    problem = partition_by_landmark(problem, cfg, 8)
    problem = _pad_pose_tables(problem, 8)
    problem = prepare_landmarks(problem, cfg)
    mesh = shard.make_mesh(8)
    p = jax.device_put(
        problem, shard.problem_shardings(problem, mesh,
                                         landmark_sharded=True))
    for _ in range(6):
        p = shard.sharded_gn_iteration_lm(p, cfg, False, mesh).problem
    res = shard.sharded_gn_iteration_lm(p, cfg, False, mesh,
                                        gn_damping=3.0)
    assert not bool(res.accepted)
    assert float(res.post_cost) == float(res.pre_cost)
    assert float(res.delta_norm) == 0.0


def test_sharded_banded_dense_with_marg_matches_single():
    """DISTRIBUTED SLIDING WINDOW, banded form: banded-Schur assembly (one
    band psum) + replicated dense Cholesky CARRYING an active FEJ
    marginalization prior must match the single-device schur_on_band path
    (closes the round-4 banded/marg mutual exclusion, VERDICT item 5)."""
    import jax.numpy as jnp

    from ba_tpu.solver import window as window_mod

    problem, cfg = _banded_vins_problem(n_poses=24, n_lms=64, seed=7)
    cfg = dataclasses.replace(cfg, use_banded_solver=False,
                              schur_on_band=True)
    P_n = int(problem.poses.q.shape[0])
    D = cfg.pose_dim
    # retire pose 2 (first active) into the prior -> marg becomes active
    drop = jnp.zeros(P_n, bool).at[2].set(True)
    p = window_mod.apply_marginalization(problem, cfg, True, drop)
    assert bool(p.marg.active) and p.marg.H.shape[0] == P_n * D
    # static dispatch guarantee: banded direct is OFF (full-size H),
    # schur_on_band is ON -> _sharded_build_banded_dense is the path
    assert cfg.schur_on_band and 0 < cfg.band_width <= P_n

    mesh = shard.make_mesh(8)
    p_single = p
    p_shard = jax.device_put(
        p, shard.problem_shardings(p, mesh, landmark_sharded=True))
    for _ in range(3):
        r1 = step_mod.gn_iteration(p_single, cfg, True, 1.0, False)
        r2 = shard.sharded_gn_iteration_lm(p_shard, cfg, True, mesh)
        # the cost carries a large negative prior quadratic (cancellation
        # against the positive residual part amplifies relative error of
        # the psum-reassociated band), so compare at 1e-5 and check the
        # updated states directly
        np.testing.assert_allclose(float(r1.pre_cost), float(r2.pre_cost),
                                   rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(float(r1.post_cost),
                                   float(r2.post_cost), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(r1.problem.poses.t),
                                   np.asarray(r2.problem.poses.t),
                                   rtol=1e-5, atol=1e-7)
        p_single, p_shard = r1.problem, r2.problem
    assert float(r2.post_cost) <= float(r2.pre_cost)


def test_sharded_ring_fleet_matches_per_ring():
    """DISTRIBUTED SLIDING WINDOW, fleet form: 8 independent ring
    pipelines sharded across the mesh (zero collectives) must reproduce
    each ring's single-device `run_ring` trajectory."""
    from jax.sharding import NamedSharding, PartitionSpec

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver import fixedlag

    rcfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=12, n_lms=48, seed=9)
    scheds = []
    for s in range(8):
        rp, _, _ = sv.build_problem(sim, rcfg, perturb=0.01, seed=s,
                                    with_marg_prior=False)
        rp = prepare_landmarks(rp, rcfg)
        scheds.append(fixedlag.build_ring_schedule(rp, rcfg, 6,
                                                   n_slides=5))
    inputs, carry0, rig, g = shard.stack_ring_schedules(scheds)
    mesh = shard.make_mesh(8)
    inputs = jax.device_put(
        inputs, NamedSharding(mesh, PartitionSpec(shard.AXIS)))
    carryF, outsF = shard.sharded_ring_fleet(
        inputs, carry0, rig, g, rcfg, True, mesh, 2, scheds[0].W,
        scheds[0].L_w)
    for s in (0, 3, 7):
        _, outs1 = fixedlag.run_ring(scheds[s], rcfg, True, 2)
        np.testing.assert_allclose(np.asarray(outsF["t"][s]),
                                   np.asarray(outs1["t"]),
                                   rtol=1e-7, atol=1e-10)
        np.testing.assert_allclose(np.asarray(outsF["cost"][s]),
                                   np.asarray(outs1["cost"]),
                                   rtol=1e-6, atol=1e-12)
