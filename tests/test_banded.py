"""Banded-grid assembly fast path == general assembly (f64 oracle).

The banded path (BAConfig.band_width > 0) assembles U on a (P, B) block
band and densifies it with the scatter-free reshape trick
(ba_tpu.solver.assemble.band_to_dense); it must be numerically equivalent
to the general per-family dense-scatter path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ba_tpu.core.problem import BAConfig, prepare_landmarks
from ba_tpu.io import simulate_vins as sv
from ba_tpu.solver import assemble as asm
from ba_tpu.solver.step import _imu_eval, solve_fixed


def _problem(n_poses=24, n_lms=60, pose_dim=9, seed=0):
    cfg = BAConfig(pose_dim=pose_dim, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=n_poses, n_lms=n_lms, seed=seed)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.02, seed=seed + 1)
    problem = prepare_landmarks(problem, cfg)
    return problem, cfg


def test_band_to_dense_matches_naive():
    rng = np.random.default_rng(0)
    P, B, D = 7, 3, 4
    band = rng.standard_normal((P, B, D, D))
    # make diagonal blocks symmetric (as JtJ diagonals are)
    band[:, 0] = band[:, 0] + np.swapaxes(band[:, 0], 1, 2)
    dense = np.zeros((P * D, P * D))
    for p in range(P):
        for d in range(B):
            if p + d >= P:
                continue
            blk = band[p, d]
            dense[p*D:(p+1)*D, (p+d)*D:(p+d+1)*D] += blk
            if d > 0:
                dense[(p+d)*D:(p+d+1)*D, p*D:(p+1)*D] += blk.T
    got = np.asarray(asm.band_to_dense(jnp.asarray(band)))
    np.testing.assert_allclose(got, dense, rtol=1e-12, atol=1e-12)


def test_banded_assembly_matches_general():
    problem, cfg = _problem()
    B = asm.band_width_of(problem)
    assert 1 < B <= problem.poses.q.shape[0]
    cfg_b = dataclasses.replace(cfg, band_width=B)

    ie = _imu_eval(problem, cfg, True, True)
    a0 = jax.jit(lambda p: asm.assemble(p, cfg, imu_eval=ie))(problem)
    a1 = jax.jit(lambda p: asm.assemble(p, cfg_b, imu_eval=ie))(problem)

    np.testing.assert_allclose(np.asarray(a1.U), np.asarray(a0.U),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(a1.rhs_p), np.asarray(a0.rhs_p),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(a1.W), np.asarray(a0.W),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(a1.S), np.asarray(a0.S),
                               rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1.rhs_sc),
                               np.asarray(a0.rhs_sc), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(a1.cost), float(a0.cost), rtol=1e-12)


def test_banded_assembly_masked_dims():
    problem, cfg = _problem(n_poses=12, n_lms=30)
    # mask a few pose dims (inactive pose + per-dim mask)
    mask = np.asarray(problem.poses.mask).copy()
    mask[3, :6] = False
    mask[5, 7] = False
    poses = dataclasses.replace(problem.poses, mask=jnp.asarray(mask))
    problem = dataclasses.replace(problem, poses=poses)
    B = asm.band_width_of(problem)
    cfg_b = dataclasses.replace(cfg, band_width=B)
    ie = _imu_eval(problem, cfg, True, True)
    a0 = asm.assemble(problem, cfg, imu_eval=ie)
    a1 = asm.assemble(problem, cfg_b, imu_eval=ie)
    np.testing.assert_allclose(np.asarray(a1.S), np.asarray(a0.S),
                               rtol=1e-9, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1.rhs_sc),
                               np.asarray(a0.rhs_sc), rtol=1e-9, atol=1e-9)


def test_banded_solve_converges_like_general():
    problem, cfg = _problem(n_poses=20, n_lms=50)
    cfg_b = dataclasses.replace(
        cfg, band_width=asm.band_width_of(problem))
    _, costs0, _ = solve_fixed(problem, cfg, True, 5)
    _, costs1, _ = solve_fixed(problem, cfg_b, True, 5)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-6, atol=1e-10)


def test_banded_same_pose_stereo_rows():
    """Same-pose cross-camera rows (d == 0 cross terms) must land on the
    diagonal block identically in both paths."""
    from tests.test_stereo import make_stereo_scene

    problem, cfg, _, _, _ = make_stereo_scene(perturb=0.02)
    problem = prepare_landmarks(problem, cfg)
    B = asm.band_width_of(problem)
    cfg_b = dataclasses.replace(cfg, band_width=B)
    a0 = asm.assemble(problem, cfg)
    a1 = asm.assemble(problem, cfg_b)
    np.testing.assert_allclose(np.asarray(a1.S), np.asarray(a0.S),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(a1.rhs_sc),
                               np.asarray(a0.rhs_sc), rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# Banded direct reduced solve (solver/banded.py)
# ---------------------------------------------------------------------------


def _banded_cfg(problem, cfg):
    return dataclasses.replace(cfg, band_width=asm.band_width_of(problem),
                               use_banded_solver=True)


def test_band_S_matches_dense_schur():
    """The Schur-corrected band must equal the dense path's S block band
    (incl. the masked-dim identity convention)."""
    from ba_tpu.solver import banded, cg as cg_mod

    problem, cfg = _problem(n_poses=18, n_lms=45)
    mask = np.asarray(problem.poses.mask).copy()
    mask[4, :6] = False
    problem = dataclasses.replace(
        problem, poses=dataclasses.replace(problem.poses,
                                           mask=jnp.asarray(mask)))
    cfg_b = _banded_cfg(problem, cfg)
    D, P = cfg.pose_dim, int(problem.poses.q.shape[0])
    B = cfg_b.band_width

    ie = _imu_eval(problem, cfg, True, True)
    a0 = asm.assemble(problem, cfg, imu_eval=ie)
    # dense S has 1e6 on masked diag; strip it and add identity instead
    m = np.asarray(a0.col_mask)
    S0 = np.asarray(a0.S).copy()
    S0[~m, ~m] += 1.0 - 1e6

    bs, _ = cg_mod.assemble_blocks(problem, cfg_b, ie)
    band = np.asarray(banded.band_S(problem, cfg_b, bs, P, D))
    for p in range(P):
        for d in range(B):
            if p + d >= P:
                continue
            blk = S0[p*D:(p+1)*D, (p+d)*D:(p+d+1)*D]
            np.testing.assert_allclose(band[p, d], blk, rtol=1e-9,
                                       atol=1e-9,
                                       err_msg=f"block ({p},{p+d})")
    # everything outside the band must be zero in the dense S
    for p in range(P):
        for q in range(p + B, P):
            np.testing.assert_allclose(S0[p*D:(p+1)*D, q*D:(q+1)*D], 0.0,
                                       atol=1e-9)


def test_band_matvec_matches_dense():
    from ba_tpu.solver import banded

    rng = np.random.default_rng(3)
    P, B, D = 9, 4, 3
    band = rng.standard_normal((P, B, D, D))
    band[:, 0] = band[:, 0] + np.swapaxes(band[:, 0], 1, 2)
    pd = np.arange(P)[:, None] + np.arange(B)[None, :]
    band = band * (pd < P)[:, :, None, None]
    dense = np.asarray(asm.band_to_dense(jnp.asarray(band)))
    x = rng.standard_normal(P * D)
    got = np.asarray(banded.band_matvec(jnp.asarray(band), jnp.asarray(x)))
    np.testing.assert_allclose(got, dense @ x, rtol=1e-11, atol=1e-11)


def test_banded_solve_step_matches_dense():
    """GnStep from the banded direct solver == dense Cholesky path
    (f64, VI problem with IMU + robust norms + masked dims)."""
    from ba_tpu.solver.step import _build_and_solve

    problem, cfg = _problem(n_poses=30, n_lms=90)
    mask = np.asarray(problem.poses.mask).copy()
    mask[7, :6] = False
    problem = dataclasses.replace(
        problem, poses=dataclasses.replace(problem.poses,
                                           mask=jnp.asarray(mask)))
    cfg_b = _banded_cfg(problem, cfg)

    d0 = _build_and_solve(problem, cfg, True)
    d1 = _build_and_solve(problem, cfg_b, True)
    assert bool(d1.step.ok)
    # the banded path solves by PCG (factored-band preconditioner) to a
    # 1e-12 relative residual; on a ~1e7-conditioned system the *solution*
    # match to the dense direct solve is cond * tol
    scale = np.abs(np.asarray(d0.step.delta_p)).max()
    np.testing.assert_allclose(np.asarray(d1.step.delta_p),
                               np.asarray(d0.step.delta_p),
                               rtol=1e-3, atol=1e-3 * scale)
    scale_l = np.abs(np.asarray(d0.step.delta_l)).max()
    np.testing.assert_allclose(np.asarray(d1.step.delta_l),
                               np.asarray(d0.step.delta_l),
                               rtol=1e-3, atol=1e-3 * scale_l)
    np.testing.assert_allclose(float(d1.cost), float(d0.cost), rtol=1e-12)


def test_banded_solve_trajectory_matches_dense():
    problem, cfg = _problem(n_poses=26, n_lms=70)
    cfg_b = _banded_cfg(problem, cfg)
    p0, costs0, _ = solve_fixed(problem, cfg, True, 5)
    p1, costs1, _ = solve_fixed(problem, cfg_b, True, 5)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-4, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p1.poses.t),
                               np.asarray(p0.poses.t), rtol=1e-4,
                               atol=1e-7)


def test_banded_solve_dogleg_matches_dense():
    problem, cfg = _problem(n_poses=22, n_lms=60)
    cfg_d = dataclasses.replace(cfg, use_dogleg=True)
    cfg_b = dataclasses.replace(_banded_cfg(problem, cfg), use_dogleg=True)
    _, costs0, _ = solve_fixed(problem, cfg_d, True, 4)
    _, costs1, _ = solve_fixed(problem, cfg_b, True, 4)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-4, atol=1e-12)


def test_banded_solver_falls_back_without_band():
    """use_banded_solver without band_width (or with calib) must fall back
    to the dense path, not crash."""
    problem, cfg = _problem(n_poses=10, n_lms=24)
    cfg_nb = dataclasses.replace(cfg, use_banded_solver=True)  # no band
    _, costs, _ = solve_fixed(problem, cfg_nb, True, 2)
    assert np.all(np.isfinite(np.asarray(costs)))


def test_schur_pair_table_counts():
    """sp table enumerates each landmark's observing-pose pairs exactly."""
    problem, _ = _problem(n_poses=12, n_lms=30)
    idx = problem.pidx
    wp = np.asarray(idx.wb_pose)
    wl = np.asarray(idx.wb_lm)
    sp_i = np.asarray(idx.sp_i)[np.asarray(idx.sp_valid)]
    sp_j = np.asarray(idx.sp_j)[np.asarray(idx.sp_valid)]
    # pose order within a pair + same landmark
    assert np.all(wp[sp_i] <= wp[sp_j])
    assert np.all(wl[sp_i] == wl[sp_j])
    # count = sum_l n_l (n_l + 1) / 2 over the real (non-padding) blocks
    pairs = set(zip(wp.tolist(), wl.tolist()))
    from collections import Counter

    n_per_lm = Counter(l for _, l in pairs)
    want = sum(n * (n + 1) // 2 for n in n_per_lm.values())
    # padding wb rows may alias (0, 0); allow exact or -1 for that alias
    assert len(set(zip(sp_i.tolist(), sp_j.tolist()))) == len(sp_i)
    assert len(sp_i) in (want, want - 1)


def test_schur_on_band_step_matches_dense():
    """solve_reduced_banded_dense (banded Schur + dense Cholesky) ==
    dense-path GnStep (f64, VI problem with masked dims)."""
    from ba_tpu.solver.step import _build_and_solve

    problem, cfg = _problem(n_poses=28, n_lms=80)
    mask = np.asarray(problem.poses.mask).copy()
    mask[5, :6] = False
    problem = dataclasses.replace(
        problem, poses=dataclasses.replace(problem.poses,
                                           mask=jnp.asarray(mask)))
    cfg_s = dataclasses.replace(cfg, band_width=asm.band_width_of(problem),
                                schur_on_band=True)
    d0 = _build_and_solve(problem, cfg, True)
    d1 = _build_and_solve(problem, cfg_s, True)
    assert bool(d1.step.ok)
    np.testing.assert_allclose(np.asarray(d1.step.delta_p),
                               np.asarray(d0.step.delta_p), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(d1.step.delta_l),
                               np.asarray(d0.step.delta_l), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(float(d1.cost), float(d0.cost), rtol=1e-12)


def test_schur_on_band_with_marg_prior():
    """The marg prior (dense, pose dims) is added onto the densified
    banded S — trajectory must match the dense path."""
    from ba_tpu.solver import window as window_mod

    problem, cfg = _problem(n_poses=16, n_lms=40)
    P = int(problem.poses.q.shape[0])
    problem = window_mod.apply_marginalization(
        problem, cfg, True, jnp.zeros(P, bool).at[0].set(True))
    problem = prepare_landmarks(problem, cfg)
    cfg_s = dataclasses.replace(cfg, band_width=asm.band_width_of(problem),
                                schur_on_band=True)
    _, costs0, _ = solve_fixed(problem, cfg, True, 4)
    _, costs1, _ = solve_fixed(problem, cfg_s, True, 4)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-6, atol=1e-12)


def test_schur_on_band_trajectory_and_dogleg():
    problem, cfg = _problem(n_poses=24, n_lms=64)
    cfg_s = dataclasses.replace(cfg, band_width=asm.band_width_of(problem),
                                schur_on_band=True, use_dogleg=True)
    cfg_d = dataclasses.replace(cfg, use_dogleg=True)
    _, costs0, _ = solve_fixed(problem, cfg_d, True, 4)
    _, costs1, _ = solve_fixed(problem, cfg_s, True, 4)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-6, atol=1e-12)


def test_banded_pose_graph_with_extreme_covariances():
    """Pose-graph (lm_size=0) banded assembly with a near-singular unary
    covariance (the GPS app's diag(1,1,30,1e6,1e6,1e6) shape) must match
    the dense path — the configuration whose TPU bf16-matmul error first
    surfaced as an indefinite S."""
    from tests.test_window import _linear_chain

    problem, cfg, _ = _linear_chain(n=10, seed=2)
    # add a GPS-like loose prior on every pose
    from ba_tpu.core.problem import ProblemBuilder
    rng = np.random.default_rng(3)
    b = ProblemBuilder(cfg)
    ids = [b.add_pose((1.0, 0, 0, 0), rng.normal(size=3) * 2.0,
                      active=True, time=float(i)) for i in range(10)]
    cov = np.diag([1.0, 1.0, 30.0, 1e6, 1e6, 1e6])
    for i, pid in enumerate(ids):
        b.add_unary_constraint(pid, (1.0, 0, 0, 0),
                               np.array([i * 1.0, 0.0, 0.0]), cov=cov)
    for i in range(9):
        b.add_binary_constraint(ids[i], ids[i + 1], (1.0, 0, 0, 0),
                                np.array([1.0, 0, 0]), cov=np.eye(6) * 0.01)
    problem = b.build()
    B = asm.band_width_of(problem)
    assert B == 2
    cfg_b = dataclasses.replace(cfg, band_width=B)
    _, costs0, _ = solve_fixed(problem, cfg, False, 6)
    _, costs1, _ = solve_fixed(problem, cfg_b, False, 6)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-7, atol=1e-10)
    assert float(costs1[-1]) < float(costs1[0])


def test_banded_solve_f32_default_pcg_converges():
    """The f32 auto PCG count (3, resting on the exact-f32 chunk Schur
    product in `_factor`) must converge like the dense f32 path on a
    VI window — the TPU flagship numerics, run here on CPU."""
    cfg64 = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=48, n_lms=144, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg64, perturb=0.02, seed=1)
    problem = jax.tree_util.tree_map(
        lambda a: a.astype(np.float32) if a.dtype == np.float64 else a,
        problem)
    cfg = dataclasses.replace(cfg64,
                              band_width=asm.band_width_of(problem))
    problem = prepare_landmarks(problem, cfg)
    cfg_b = dataclasses.replace(cfg, use_banded_solver=True)
    _, costs0, _ = solve_fixed(problem, cfg, True, 6)
    _, costs1, _ = solve_fixed(problem, cfg_b, True, 6)
    assert float(costs1[-1]) < 1e-4 * float(costs1[0])
    np.testing.assert_allclose(float(costs1[-1]), float(costs0[-1]),
                               rtol=0.3)


def test_banded_xyz_landmarks():
    """lm_size=3 (XYZ landmarks): banded assembly + banded direct solve
    must match the dense path (3-wide V/W blocks through band_S)."""
    from tests.test_solver_reprojection import make_scene

    problem, cfg = make_scene(n_poses=12, n_lms=40, lm_size=3,
                              perturb=0.02, seed=5)
    problem = prepare_landmarks(problem, cfg)
    B = asm.band_width_of(problem)
    cfg_b = dataclasses.replace(cfg, band_width=B)
    cfg_s = dataclasses.replace(cfg_b, use_banded_solver=True)
    _, costs0, _ = solve_fixed(problem, cfg, False, 5)
    _, costs1, _ = solve_fixed(problem, cfg_b, False, 5)
    _, costs2, _ = solve_fixed(problem, cfg_s, False, 5)
    np.testing.assert_allclose(np.asarray(costs1), np.asarray(costs0),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(costs2), np.asarray(costs0),
                               rtol=1e-4, atol=1e-8)


def test_bcr_factor_solve_matches_dense_oracle():
    """Block cyclic reduction == dense solve on random SPD block-tridiagonal
    systems, including non-power-of-two chunk counts (padding path)."""
    from ba_tpu.solver.banded import _bcr_factor, _bcr_solve

    rng = np.random.default_rng(3)
    for m, n in [(4, 8), (5, 6), (7, 10), (16, 12), (33, 6)]:
        Dg = rng.standard_normal((m, n, n))
        Dg = np.einsum("kij,klj->kil", Dg, Dg) + 5 * n * np.eye(n)[None]
        Eg = rng.standard_normal((m, n, n)) * 0.3
        Eg[m - 1] = 0
        b = rng.standard_normal((m, n))
        A = np.zeros((m * n, m * n))
        for i in range(m):
            A[i * n:(i + 1) * n, i * n:(i + 1) * n] = Dg[i]
            if i + 1 < m:
                A[i * n:(i + 1) * n, (i + 1) * n:(i + 2) * n] = Eg[i]
                A[(i + 1) * n:(i + 2) * n, i * n:(i + 1) * n] = Eg[i].T
        x_ref = np.linalg.solve(A, b.reshape(-1))
        levels, ok = _bcr_factor(jnp.asarray(Dg), jnp.asarray(Eg))
        assert bool(ok)
        x = np.asarray(_bcr_solve(levels, jnp.asarray(b), m))
        np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-9)


def test_bcr_full_solver_matches_scan_factor():
    """solve_reduced_banded with cyclic reduction (n_c >= 4 engages it:
    P=80, chunk=16 -> n_c=5) == the sequential scan factorization and
    == the dense path, on a VI problem with masked dims."""
    from ba_tpu.solver.step import _build_and_solve

    problem, cfg = _problem(n_poses=80, n_lms=200)
    cfg_b = _banded_cfg(problem, cfg)
    assert cfg_b.banded_cyclic_reduction  # default on
    cfg_scan = dataclasses.replace(cfg_b, banded_cyclic_reduction=False)

    d0 = _build_and_solve(problem, cfg, True)        # dense oracle
    d1 = _build_and_solve(problem, cfg_b, True)      # BCR
    d2 = _build_and_solve(problem, cfg_scan, True)   # scan
    assert bool(d1.step.ok) and bool(d2.step.ok)
    scale = np.abs(np.asarray(d0.step.delta_p)).max()
    np.testing.assert_allclose(np.asarray(d1.step.delta_p),
                               np.asarray(d0.step.delta_p),
                               rtol=1e-3, atol=1e-3 * scale)
    np.testing.assert_allclose(np.asarray(d1.step.delta_p),
                               np.asarray(d2.step.delta_p),
                               rtol=1e-6, atol=1e-9 * scale)


def test_grouped_schur_band_matches_pair_table():
    """The grouped per-landmark banded Schur correction (frontier path,
    banded._band_schur_grouped) must reproduce the sp-pair-table
    formulation: same band, same solve."""
    import ba_tpu.solver.banded as banded_mod
    from ba_tpu.solver import cg as cg_mod
    from ba_tpu.solver import step as step_mod
    from ba_tpu.solver.assemble import dims

    problem, cfg = _problem(n_poses=48, n_lms=160, seed=11)
    cfg = _banded_cfg(problem, cfg)
    D, K, P, L, lm, N = dims(problem, cfg)
    ie = _imu_eval(problem, cfg, True, True)
    bs, _ = cg_mod.assemble_blocks(problem, cfg, ie, with_precond=False)

    band_pair = banded_mod.band_S(problem, cfg, bs, P, D)
    old = banded_mod._GROUPED_SP_MIN
    # the jit cache is NOT keyed on the module global, so clear it around
    # each gn_iteration call to force a retrace through the intended path
    # (otherwise both calls run whichever program compiled first and the
    # end-to-end comparison is vacuous)
    banded_mod._GROUPED_SP_MIN = 0          # force the grouped path
    try:
        band_grp = banded_mod.band_S(problem, cfg, bs, P, D)
        step_mod.gn_iteration.clear_cache()
        r_grp = step_mod.gn_iteration(problem, cfg, True, 1.0, False)
    finally:
        banded_mod._GROUPED_SP_MIN = old
    np.testing.assert_allclose(np.asarray(band_grp),
                               np.asarray(band_pair),
                               rtol=1e-9, atol=1e-12)
    step_mod.gn_iteration.clear_cache()
    r_pair = step_mod.gn_iteration(problem, cfg, True, 1.0, False)
    step_mod.gn_iteration.clear_cache()     # leave no stale path cached
    np.testing.assert_allclose(float(r_grp.post_cost),
                               float(r_pair.post_cost), rtol=1e-8)
