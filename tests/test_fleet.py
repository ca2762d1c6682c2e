"""Fleet-batched solve: vmap of `solve_fixed` over stacked problems.

The batched program must reproduce each window's individual solve — the
throughput lever for serving many concurrent sliding windows (vehicles) on
one chip (see BASELINE.md roofline: a single window is dispatch-latency
bound).  No reference analog (single-problem single-node, SURVEY.md §2.4).
"""

import numpy as np

from ba_tpu.core.problem import prepare_landmarks, stack_problems
from ba_tpu.solver.step import solve_fixed, solve_fleet

from tests.test_solver_reprojection import make_scene

N_ITERS = 4


def _windows(n=3):
    problems, cfg = [], None
    for seed in range(n):
        p, cfg = make_scene(n_poses=6, n_lms=24, seed=seed, perturb=0.04)
        problems.append(prepare_landmarks(p, cfg))
    return problems, cfg


def test_fleet_matches_individual_solves():
    problems, cfg = _windows(3)

    solo_costs = [
        np.asarray(solve_fixed(p, cfg, False, N_ITERS)[1]) for p in problems
    ]
    solo_t = [np.asarray(solve_fixed(p, cfg, False, N_ITERS)[0].poses.t)
              for p in problems]

    batched = stack_problems(problems)
    out, costs, _ = solve_fleet(batched, cfg, False, N_ITERS)

    assert costs.shape == (3, N_ITERS)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(costs[b]), solo_costs[b],
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.poses.t[b]), solo_t[b],
                                   rtol=1e-9, atol=1e-12)

    # the windows are genuinely different problems (different landmarks)
    assert not np.allclose(solo_costs[0], solo_costs[1])


def test_fleet_converges_each_window():
    problems, cfg = _windows(2)
    batched = stack_problems(problems)
    _, costs, _ = solve_fleet(batched, cfg, False, N_ITERS)
    costs = np.asarray(costs)
    assert np.all(costs[:, -1] < 1e-3 * costs[:, 0] + 1e-12)


# ---------------------------------------------------------------------------
# Natively batched fleet: block-diagonal concatenation (round 3) — the
# layout that replaces vmap for throughput (BASELINE.md fleet table)
# ---------------------------------------------------------------------------


def test_concat_fleet_matches_individual_solves():
    """B windows fused by concat_problems must reproduce each window's solo
    solve bit-for-bit (robust norm off: the fused problem would otherwise
    share one global Huber median across windows)."""
    import dataclasses

    from ba_tpu.core.problem import concat_problems

    problems, cfg = _windows(3)
    cfg = dataclasses.replace(cfg, use_robust_norm_for_proj_residuals=False)

    solo = [solve_fixed(p, cfg, False, N_ITERS) for p in problems]

    fused = concat_problems(problems, cfg)
    fused = prepare_landmarks(fused, cfg)
    out, costs, _ = solve_fixed(fused, cfg, False, N_ITERS)

    # fused cost trace = sum of solo cost traces (atol covers the
    # roundoff-reassociation floor once windows are fully converged)
    total = sum(np.asarray(s[1]) for s in solo)
    np.testing.assert_allclose(np.asarray(costs), total, rtol=1e-6,
                               atol=1e-15 * float(total[0]))
    po = 0
    for p, s in zip(problems, solo):
        P_i = p.poses.q.shape[0]
        np.testing.assert_allclose(
            np.asarray(out.poses.t[po:po + P_i]),
            np.asarray(s[0].poses.t), rtol=1e-7, atol=1e-9)
        po += P_i


def test_concat_fleet_banded_path():
    """The fused fleet through the banded assembly + O(P) banded direct
    solve (the production fleet configuration)."""
    import dataclasses

    from ba_tpu.core.problem import concat_problems
    from ba_tpu.solver.assemble import band_width_of

    problems, cfg = _windows(2)
    cfg = dataclasses.replace(cfg, use_robust_norm_for_proj_residuals=False)
    fused = concat_problems(problems, cfg)
    bw = band_width_of(fused)
    # windows do not couple: the fused band width equals the per-window one
    assert bw <= max(band_width_of(p) for p in problems)
    cfg_b = dataclasses.replace(cfg, band_width=bw, use_banded_solver=True)
    fused_p = prepare_landmarks(fused, cfg_b)
    out, costs, _ = solve_fixed(fused_p, cfg_b, False, N_ITERS)
    cfg_d = dataclasses.replace(cfg, band_width=0)
    out_d, costs_d, _ = solve_fixed(prepare_landmarks(fused, cfg_d),
                                    cfg_d, False, N_ITERS)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(costs_d),
                               rtol=1e-6, atol=1e-15 * float(costs_d[0]))
    assert float(costs[-1]) < 1e-3 * float(costs[0]) + 1e-12


def test_concat_fleet_dense_solver_matches():
    """fleet_size > 1 dispatches the batched dense-per-window reduced solve
    (solve_reduced_fleet_dense); it must match the fleet_size=1 chunked
    path step for step."""
    import dataclasses

    from ba_tpu.core.problem import concat_problems
    from ba_tpu.solver.assemble import band_width_of
    from ba_tpu.solver.step import gn_iteration

    problems, cfg = _windows(2)
    cfg = dataclasses.replace(cfg, use_robust_norm_for_proj_residuals=False)
    fused = concat_problems(problems, cfg)
    bw = band_width_of(fused)
    base = dataclasses.replace(cfg, band_width=bw, use_banded_solver=True)
    fleet = dataclasses.replace(base, fleet_size=2)
    p = prepare_landmarks(fused, base)
    r1 = gn_iteration(p, base, False, 1.0, False)
    r2 = gn_iteration(p, fleet, False, 1.0, False)
    assert bool(r2.solver_ok)
    np.testing.assert_allclose(float(r2.pre_cost), float(r1.pre_cost),
                               rtol=1e-12)
    np.testing.assert_allclose(float(r2.post_cost), float(r1.post_cost),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r2.problem.poses.t),
                               np.asarray(r1.problem.poses.t),
                               rtol=1e-5, atol=1e-8)


def test_sharded_fleet_matches_local():
    """Windows sharded across the 8-device mesh (one whole window per
    device, zero collectives) must match the local vmap fleet solve."""
    from ba_tpu.parallel import shard

    problems, cfg = _windows(8)
    batched = stack_problems(problems)
    out_l, costs_l, _ = solve_fleet(batched, cfg, False, N_ITERS)

    import jax

    mesh = shard.make_mesh(8)
    b_sh = jax.device_put(batched, shard.fleet_shardings(batched, mesh))
    out_s, costs_s, _ = shard.sharded_fleet_solve(b_sh, cfg, False, mesh,
                                                  N_ITERS)
    np.testing.assert_allclose(np.asarray(costs_s), np.asarray(costs_l),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out_s.poses.t),
                               np.asarray(out_l.poses.t),
                               rtol=1e-9, atol=1e-12)


def test_concat_unequal_windows():
    """concat_problems also fuses windows of different sizes (the general
    serving case); only the fleet_size fast paths need equal windows."""
    import dataclasses

    from ba_tpu.core.problem import concat_problems

    p1, cfg = make_scene(n_poses=5, n_lms=18, seed=3, perturb=0.03)
    p2, _ = make_scene(n_poses=8, n_lms=30, seed=4, perturb=0.03)
    cfg = dataclasses.replace(cfg, use_robust_norm_for_proj_residuals=False)
    s1 = solve_fixed(prepare_landmarks(p1, cfg), cfg, False, N_ITERS)
    s2 = solve_fixed(prepare_landmarks(p2, cfg), cfg, False, N_ITERS)

    fused = concat_problems([p1, p2], cfg)
    fused = prepare_landmarks(fused, cfg)
    out, costs, _ = solve_fixed(fused, cfg, False, N_ITERS)
    total = np.asarray(s1[1]) + np.asarray(s2[1])
    np.testing.assert_allclose(np.asarray(costs), total, rtol=1e-6,
                               atol=1e-15 * float(total[0]))
    P1 = p1.poses.q.shape[0]
    np.testing.assert_allclose(np.asarray(out.poses.t[:P1]),
                               np.asarray(s1[0].poses.t), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.poses.t[P1:]),
                               np.asarray(s2[0].poses.t), rtol=1e-7,
                               atol=1e-9)
