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
