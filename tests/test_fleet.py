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
