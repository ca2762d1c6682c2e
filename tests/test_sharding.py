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
