"""Multi-process (multi-controller) integration test of the distributed
backend: 2 OS processes x 2 virtual CPU devices, gloo collectives.

The reference has no distributed capability at all (SURVEY.md §2.4); this
exercises the real multi-host code path — `jax.distributed.initialize`,
`multihost.global_problem_from_local` data placement, and the
landmark-sharded solve over a process-spanning mesh — and checks the
result against the single-process solve of the identical problem.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_solve_matches_local():
    port = _free_port()
    out_path = "/tmp/ba_tpu_multihost_costs.json"
    if os.path.exists(out_path):
        os.remove(out_path)

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if "PYTHONPATH" in env else "")

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", f"127.0.0.1:{port}",
             out_path],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    with open(out_path) as f:
        got = json.load(f)
    assert got["n_devices"] == 4 and got["n_processes"] == 2

    # single-process reference: same problem, plain local solve
    import jax

    from ba_tpu.core.problem import BAConfig, prepare_landmarks
    from ba_tpu.io import simulate_vins as sv
    from ba_tpu.solver.step import solve_fixed

    cfg = BAConfig(pose_dim=9, lm_size=1, use_dogleg=False)
    sim = sv.simulate(n_poses=8, n_lms=24, seed=0)
    problem, _, _ = sv.build_problem(sim, cfg, perturb=0.01, seed=1,
                                     pad_multiple=4)
    problem = prepare_landmarks(problem, cfg)
    _, costs, _ = solve_fixed(problem, cfg, True, 3)
    want = np.asarray(jax.device_get(costs))

    # sharded assembly reassociates the residual reductions (psum of
    # row-reordered partials), so costs match to roundoff-amplified
    # tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(got["costs"]), want,
                               rtol=1e-4, atol=1e-12)
