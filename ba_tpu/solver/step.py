"""Step control: update application, Gauss-Newton, and Powell dogleg.

Reference: `ApplyUpdate` (src/BundleAdjuster.cpp:21-141), `SolveInternal`
(cpp:838-1161), `Solve` outer loop (cpp:278-705).  Functional redesign: a
step *proposal* never mutates the problem — it produces a candidate pytree,
and "rollback on cost increase" (reference snapshot/restore,
cpp:1021-1068) is simply not committing the candidate.  The data-dependent
accept/reject logic runs in a bounded `lax.while_loop`, so a whole outer
iteration (assemble → factor → trust-region search) is one compiled XLA
program.

Deviation from the reference, documented per SURVEY.md §7 quirk Q3: the
dogleg boundary blend uses the textbook root
beta = (-b + sqrt(b^2 - 4 a c)) / (2 a); the reference's `-(b*b)` variant
(cpp:1008) is a transcription bug we do not reproduce.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.problem import (BAConfig, Problem, finalize_landmarks,
                            prepare_landmarks)
from .assemble import Assembly, assemble, evaluate_cost
from .linear import GnStep, back_substitute, solve_reduced


def _imu_eval(problem: Problem, config: BAConfig, use_imu: bool,
              with_jacobians: bool, c9=None):
    if not use_imu:
        return None
    from ..core.residuals import imu as imu_mod
    return imu_mod.evaluate(problem, config, with_jacobians=with_jacobians,
                            c9=c9)


def apply_update(problem: Problem, config: BAConfig, delta_p, delta_l,
                 scale=1.0) -> Problem:
    """x <- retract(x, -scale * delta)  (reference ApplyUpdate, cpp:21-141).

    Inverse-depth landmarks whose depth would go negative keep their old
    value and are marked unreliable (cpp:127-134).
    """
    D = config.pose_dim
    poses = problem.poses
    P = poses.q.shape[0]
    dp = delta_p[: P * D].reshape(P, D) * scale

    q, t = lie.se3_retract((poses.q, poses.t), -dp[:, :6])
    v = poses.v - dp[:, 6:9] if config.vel_in_state else poses.v
    b = poses.b - dp[:, 9:15] if config.bias_in_state else poses.b
    poses = dataclasses.replace(poses, q=q, t=t, v=v, b=b)

    lms = problem.lms
    if config.lm_size:
        lmsz = config.lm_size
        L = lms.x.shape[0]
        dl = delta_l.reshape(L, lmsz) * scale
        if lmsz == 1:
            rho_new = lms.x[:, 3] - dl[:, 0]
            neg = (rho_new < 0) & lms.active
            x = lms.x.at[:, 3].set(jnp.where(neg, lms.x[:, 3], rho_new))
            lms = dataclasses.replace(lms, x=x,
                                      reliable=lms.reliable & ~neg)
        else:
            x = lms.x.at[:, :3].add(-dl)
            lms = dataclasses.replace(lms, x=x)

    rig = problem.rig
    if config.calib_dim:
        dk = delta_p[P * D:] * scale
        if config.calib_size:
            rig = dataclasses.replace(
                rig,
                params=rig.params.at[0, : config.calib_size].add(
                    -dk[: config.calib_size]))
        if config.do_tvs:
            dtvs = dk[config.tvs_offset: config.tvs_offset + 6]
            q0, t0 = lie.se3_retract((rig.tvs_q[0], rig.tvs_t[0]), -dtvs)
            rig = dataclasses.replace(rig, tvs_q=rig.tvs_q.at[0].set(q0),
                                      tvs_t=rig.tvs_t.at[0].set(t0))
        if config.calib_size and config.lm_size == 1:
            # intrinsics moved: re-unproject each landmark's ray from its
            # reference-view pixel, keeping the ray norm (reference
            # ApplyUpdate, cpp:58-68)
            from ..core import camera as cam_mod
            params_l = rig.params[lms.ref_cam]
            model_l = rig.model[lms.ref_cam]
            ray = cam_mod.unproject(params_l, model_l, lms.z_ref)
            norm = jnp.linalg.norm(lms.x[:, :3], axis=-1, keepdims=True)
            x_new = lms.x.at[:, :3].set(ray * norm)
            use = (lms.has_z_ref & lms.active)[:, None]
            lms = dataclasses.replace(lms, x=jnp.where(use, x_new, lms.x))

    return dataclasses.replace(problem, poses=poses, lms=lms, rig=rig)


class IterResult(NamedTuple):
    problem: Problem        # accepted state (== input if rejected)
    pre_cost: jax.Array
    post_cost: jax.Array
    delta_norm: jax.Array
    accepted: jax.Array     # bool
    trust_radius: jax.Array
    solver_ok: jax.Array    # bool — reduced factorization/CG succeeded
                            # (FactorizationError when False, cpp:756-764)
    # per-trial solve-norm trace (reference SolutionSummary
    # pre_solve_norm/post_solve_norm, cpp:1036-1058: overwritten each
    # inner trial, so these carry the LAST trial — post_solve_norm is the
    # trial's evaluated cost even when the trial was rejected and rolled
    # back, unlike post_cost which reports the committed state).
    # None defaults (not jnp.zeros: a device array here would initialize
    # the JAX backend at import time, before callers can set platform/
    # x64 config); every construction site passes them explicitly.
    pre_solve_norm: Optional[jax.Array] = None
    post_solve_norm: Optional[jax.Array] = None
    inner_trials: Optional[jax.Array] = None


def _cost(problem, config, use_imu, proj_w=None, imu_c9=None):
    """Trial-cost evaluation.  `imu_c9` carries the covariance from the
    last build so trials are covariance-scan-free (reference cpp:236-238)."""
    return evaluate_cost(problem, config,
                         imu_eval=_imu_eval(problem, config, use_imu, False,
                                            c9=imu_c9),
                         proj_w=proj_w)


class BuildOut(NamedTuple):
    """Assembled-and-solved normal equations, solver-agnostic."""

    step: "GnStep"
    cost: jax.Array
    proj_w: jax.Array
    rhs_p: jax.Array
    rhs_l: jax.Array
    cauchy_alpha: jax.Array
    imu_c9: Optional[jax.Array]


def _commit_imu_cov(problem: Problem, config: BAConfig,
                    imu_c9) -> Problem:
    """Store the build's covariance in the pytree when
    `calculate_inertial_covariance_once` is on."""
    if imu_c9 is None or not config.calculate_inertial_covariance_once:
        return problem
    imu = dataclasses.replace(problem.imu, c9=imu_c9,
                              c9_set=jnp.ones((), bool))
    return dataclasses.replace(problem, imu=imu)


def _build_and_solve(problem: Problem, config: BAConfig,
                     use_imu: bool) -> BuildOut:
    """Dense-Cholesky (default) or matrix-free PCG (`use_cg_solver`)
    reduced solve — the reference's dense-LDLT vs SimplicialLDLT switch
    (`use_sparse_solver`, BundleAdjuster.h:92)."""
    imu_eval = _imu_eval(problem, config, use_imu, True)
    imu_c9 = imu_eval.c9 if imu_eval is not None else None
    from .assemble import dims
    D, K, P, L, lm, N = dims(problem, config)
    # banded direct solve: needs a band, no calib block, no marg prior;
    # banded-Schur + dense Cholesky additionally allows a marg prior
    # (all static properties -> plain Python gate)
    banded_ok = (config.use_banded_solver and 0 < config.band_width <= P
                 and K == 0 and problem.marg.H.shape[0] != P * D)
    sob_ok = (config.schur_on_band and not banded_ok
              and 0 < config.band_width <= P and K == 0)
    if config.use_cg_solver or banded_ok or sob_ok:
        from . import cg as cg_mod
        bs, marg_H = cg_mod.assemble_blocks(
            problem, config, imu_eval,
            with_precond=not (banded_ok or sob_ok))
        if banded_ok:
            from . import banded as banded_mod
            F = config.fleet_size
            if (F > 1 and P % F == 0 and L % F == 0
                    and (P // F) * D <= 4096):
                # fleet: batched dense Cholesky per window (no chunk scan)
                step = banded_mod.solve_reduced_fleet_dense(
                    problem, config, bs, P, D)
            else:
                step = banded_mod.solve_reduced_banded(problem, config, bs,
                                                       P, D)
        elif sob_ok:
            from . import banded as banded_mod
            step = banded_mod.solve_reduced_banded_dense(
                problem, config, bs, P, D, marg_H)
        else:
            step = cg_mod.solve_reduced_cg(bs, marg_H, config, P, D, K)
        alpha = cg_mod.cauchy_factor(bs, marg_H, P, D, K)
        return BuildOut(step=step, cost=bs.cost, proj_w=bs.proj_w,
                        rhs_p=bs.rhs_p, rhs_l=bs.rhs_l,
                        cauchy_alpha=alpha, imu_c9=imu_c9)
    asm = assemble(problem, config, imu_eval=imu_eval)
    step = solve_reduced(asm)
    return BuildOut(step=step, cost=asm.cost, proj_w=asm.proj_w,
                    rhs_p=asm.rhs_p, rhs_l=asm.rhs_l,
                    cauchy_alpha=_cauchy_factor(asm), imu_c9=imu_c9)


def _cauchy_factor(asm: Assembly):
    """alpha = ||rhs||^2 / ||J rhs||^2 over all families (cpp:857-925),
    with ||J rhs||^2 = rhs^T H rhs computed from the assembled blocks."""
    L, lm, _ = asm.V.shape
    rl = asm.rhs_l.reshape(L, lm)
    num = jnp.sum(asm.rhs_p**2) + jnp.sum(asm.rhs_l**2)
    den = (asm.rhs_p @ (asm.U @ asm.rhs_p)
           + 2.0 * asm.rhs_p @ (asm.W @ asm.rhs_l)
           + jnp.einsum("li,lij,lj->", rl, asm.V, rl))
    return num / jnp.maximum(den, 1e-30)


def apply_robust_reweighting(problem: Problem, config: BAConfig,
                             use_imu: bool) -> Problem:
    """Persistent robust rescaling of unary/IMU information matrices
    (reference §7.4: `res.cov_inv *= weight` in place, cpp:1463-1481 and
    1526-1527; conditioning IMU edges exempt, cpp:1514-1521).

    NOTE (documented deviation, SURVEY.md quirk Q1): the IMU robust scale is
    computed from *IMU* errors — the reference accidentally reads projection
    errors.
    """
    from ..core import robust

    if config.use_robust_norm_for_unary_residuals:
        from ..core.residuals import prior as prior_mod

        ue = prior_mod.evaluate_unary(problem, config, with_jacobians=False)
        w = robust.huber_weights(ue.err_sq, problem.unary.valid,
                                 jnp.zeros_like(problem.unary.valid),
                                 config.outlier_threshold)
        unary = dataclasses.replace(
            problem.unary,
            cov_inv=problem.unary.cov_inv * w[:, None, None])
        problem = dataclasses.replace(problem, unary=unary)

    if use_imu and config.use_robust_norm_for_inertial_residuals:
        ie = _imu_eval(problem, config, True, False)
        w = robust.huber_weights(ie.err_sq, problem.imu.valid,
                                 problem.imu.cond,
                                 config.outlier_threshold)
        w = jnp.where(problem.imu.cond, 1.0, w)
        imu = dataclasses.replace(problem.imu,
                                  weight=problem.imu.weight * w)
        problem = dataclasses.replace(problem, imu=imu)
    return problem


@partial(jax.jit, static_argnames=("config", "use_imu", "gn_damping",
                                   "error_increase_allowed"))
def gn_iteration(problem: Problem, config: BAConfig, use_imu: bool,
                 gn_damping: float = 1.0,
                 error_increase_allowed: bool = False) -> IterResult:
    """One damped Gauss-Newton outer iteration with rollback
    (reference SolveInternal non-dogleg branch, cpp:1084-1159)."""
    problem = apply_robust_reweighting(problem, config, use_imu)
    built = _build_and_solve(problem, config, use_imu)
    problem = _commit_imu_cov(problem, config, built.imu_c9)
    step = built.step
    candidate = apply_update(problem, config, step.delta_p, step.delta_l,
                             scale=gn_damping)
    post = _cost(candidate, config, use_imu, built.proj_w, built.imu_c9)
    # acceptance is purely cost-based: if the factorization hiccuped the
    # pose delta is zeroed and the candidate is a landmark-only step, which
    # may still reduce cost (reference would raise FactorizationError and
    # stop; degrading gracefully is strictly better)
    accept = (post <= built.cost) | jnp.asarray(error_increase_allowed)
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accept, a, b), candidate, problem)
    dn = gn_damping * jnp.sqrt(jnp.sum(step.delta_p**2)
                               + jnp.sum(step.delta_l**2))
    # rejected iterations report the *committed* state's cost and a zero
    # step, mirroring dogleg_iteration and the reference's snapshot/restore
    # rollback (cpp:1096-1149): the trial cost was never applied
    return IterResult(problem=out, pre_cost=built.cost,
                      post_cost=jnp.where(accept, post, built.cost),
                      delta_norm=jnp.where(accept, dn, 0.0),
                      accepted=accept,
                      trust_radius=jnp.zeros_like(built.cost),
                      solver_ok=step.ok,
                      pre_solve_norm=built.cost, post_solve_norm=post,
                      inner_trials=jnp.ones((), jnp.int32))


def dogleg_search(problem: Problem, config: BAConfig, use_imu: bool,
                  trust_radius, d_gn, d_sd, pre_cost, proj_w, imu_c9, Np):
    """Bounded dogleg trust-region search (reference SolveInternal dogleg
    branch, cpp:850-1083) given the GN and Cauchy steps — shared by the
    single-device and distributed iterations.

    Returns (radius, ok, d, post, n_trials)."""
    norm_gn = jnp.linalg.norm(d_gn)
    norm_sd = jnp.linalg.norm(d_sd)

    # trust region auto-init to ||d_gn|| (kTrustRegionAuto, cpp:976-978)
    trust_radius = jnp.where(trust_radius <= 0, norm_gn, trust_radius)

    def propose(radius):
        def sd_case(_):
            return d_sd * (radius / jnp.maximum(norm_sd, 1e-30))

        def gn_or_blend(_):
            def blend(_):
                dd = d_gn - d_sd
                a = jnp.sum(dd * dd)
                bq = 2.0 * jnp.sum(d_sd * dd)
                cq = norm_sd**2 - radius**2
                disc = jnp.sqrt(jnp.maximum(bq * bq - 4 * a * cq, 0.0))
                beta = (-bq + disc) / jnp.maximum(2 * a, 1e-30)
                return d_sd + beta * dd

            return jax.lax.cond(norm_gn <= radius, lambda _: d_gn, blend,
                                None)

        return jax.lax.cond(norm_sd >= radius, sd_case, gn_or_blend, None)

    def body(state):
        radius, _, _, _, k = state
        d = propose(radius)
        cand = apply_update(problem, config, d[:Np], d[Np:])
        post = _cost(cand, config, use_imu, proj_w, imu_c9)
        ok = post < pre_cost
        new_radius = jnp.where(ok, radius * 2.0, radius * 0.5)
        return (new_radius, ok, d, post, k + 1)

    def cond(state):
        _, ok, _, _, k = state
        return (~ok) & (k < config.dogleg_max_inner_iterations)

    zeros_d = jnp.zeros_like(d_gn)
    state0 = (trust_radius, jnp.asarray(False), zeros_d, pre_cost,
              jnp.asarray(0))
    radius, ok, d, post, k = jax.lax.while_loop(cond, body, state0)
    return radius, ok, d, post, k.astype(jnp.int32)


@partial(jax.jit, static_argnames=("config", "use_imu"))
def dogleg_iteration(problem: Problem, config: BAConfig, use_imu: bool,
                     trust_radius) -> IterResult:
    """One dogleg outer iteration: bounded inner trust-region search
    (reference SolveInternal dogleg branch, cpp:850-1083)."""
    problem = apply_robust_reweighting(problem, config, use_imu)
    built = _build_and_solve(problem, config, use_imu)
    problem = _commit_imu_cov(problem, config, built.imu_c9)
    gn = built.step
    pre_cost = built.cost
    d_gn = jnp.concatenate([gn.delta_p, gn.delta_l])
    d_sd = built.cauchy_alpha * jnp.concatenate([built.rhs_p, built.rhs_l])
    Np = built.rhs_p.shape[0]

    radius, ok, d, post, n_trials = dogleg_search(
        problem, config, use_imu, trust_radius, d_gn, d_sd, pre_cost,
        built.proj_w, built.imu_c9, Np)

    candidate = apply_update(problem, config, d[:Np], d[Np:])
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), candidate, problem)
    dn = jnp.linalg.norm(d)
    return IterResult(problem=out, pre_cost=pre_cost,
                      post_cost=jnp.where(ok, post, pre_cost),
                      delta_norm=jnp.where(ok, dn, 0.0), accepted=ok,
                      trust_radius=radius, solver_ok=gn.ok,
                      pre_solve_norm=pre_cost, post_solve_norm=post,
                      inner_trials=n_trials)


@partial(jax.jit, static_argnames=("config", "use_imu", "n_iters",
                                   "gn_damping"))
def solve_fixed(problem: Problem, config: BAConfig, use_imu: bool,
                n_iters: int, gn_damping: float = 1.0):
    """Fully-jitted fixed-iteration solve: the whole outer loop is ONE XLA
    program (`lax.scan` over GN/dogleg iterations), for production serving
    where per-iteration host round-trips matter.

    Returns (problem, costs (n_iters,), delta_norms (n_iters,)).
    The problem must already be `prepare_landmarks`-ed.
    """
    trust0 = jnp.asarray(config.trust_region_size, problem.poses.t.dtype)

    def body(carry, _):
        p, trust = carry
        if config.use_dogleg:
            res = dogleg_iteration(p, config, use_imu, trust)
            trust = res.trust_radius
        else:
            res = gn_iteration(p, config, use_imu, gn_damping, False)
        return (res.problem, trust), (res.post_cost, res.delta_norm)

    (p, _), (costs, dns) = jax.lax.scan(body, (problem, trust0), None,
                                        length=n_iters)
    return p, costs, dns


@partial(jax.jit, static_argnames=("config", "use_imu", "n_iters",
                                   "gn_damping"))
def solve_fleet(problems: Problem, config: BAConfig, use_imu: bool,
                n_iters: int, gn_damping: float = 1.0):
    """Batched multi-window solve: `solve_fixed` vmapped over a leading
    fleet axis (see `core.problem.stack_problems`).

    The TPU-idiomatic throughput lever for serving: a single 128-keyframe
    window iteration moves only ~80 MB / 89 MFLOP (roofline, BASELINE.md)
    and is dispatch-latency-bound on the chip, so independent sliding
    windows — e.g. one per vehicle — are batched into ONE XLA program,
    amortizing every kernel launch across the fleet.  No reference analog:
    the reference is single-problem single-node (SURVEY.md §2.4); its TBB
    parallelism is *within* one problem only.

    Returns per-window (problems, costs (B, n_iters), delta_norms)."""
    return jax.vmap(
        lambda p: solve_fixed(p, config, use_imu, n_iters, gn_damping)
    )(problems)


# OptimizationResult codes for the jitted adaptive loop (reference enum
# BundleAdjuster.h:38-46); mapped to Summary.result strings in `solve`.
_RUNNING, _SUCCESS, _ERR_INC, _ERR_CHG, _PARAM_CHG, _FACT_ERR = range(6)
_RESULT_NAMES = {
    _RUNNING: "Success",            # stopped at max_iter, still improving
    _SUCCESS: "Success",
    _ERR_INC: "ErrorIncreased",
    _ERR_CHG: "ErrorChangeBelowThreshold",
    _PARAM_CHG: "ParamChangeBelowThreshold",
    _FACT_ERR: "FactorizationError",
}


def _status_code(res: IterResult, config: BAConfig, tiny=1e-30):
    """Exit-criteria status of one iteration (reference cpp:648-661).

    THE single implementation of the convergence tests: `solve_adaptive`
    traces it inside its while_loop and the host loop in `solve` evaluates
    it on concrete arrays — the two paths cannot drift.
    """
    pre, post, dn = res.pre_cost, res.post_cost, res.delta_norm
    rel = jnp.abs(post - pre) / jnp.maximum(pre, tiny)
    return jnp.where(
        ~res.solver_ok, _FACT_ERR,
        jnp.where(~res.accepted, _ERR_INC,
                  jnp.where((pre > 0)
                            & (rel < config.error_change_threshold),
                            _ERR_CHG,
                            jnp.where(dn < config.param_change_threshold,
                                      _PARAM_CHG, _RUNNING))))


@partial(jax.jit, static_argnames=("config", "use_imu", "gn_damping",
                                   "error_increase_allowed"))
def solve_adaptive(problem: Problem, config: BAConfig, use_imu: bool,
                   max_iter, gn_damping: float = 1.0,
                   error_increase_allowed: bool = False):
    """The whole adaptive solve as ONE XLA program: `lax.while_loop` over
    GN/dogleg iterations with the reference's exit criteria (cpp:648-661)
    plus the per-family error epilogue (cpp:666-704) — no host round-trip
    per iteration (a jitted program launch costs ~23 ms through a remote-
    TPU tunnel; see BASELINE.md).

    Returns (problem, stats) where stats is a dict of scalars:
    iterations, status code (_RESULT_NAMES), initial/final cost,
    delta_norm, and the ErrorBreakdown.
    """
    from .summary import error_breakdown

    dtype = problem.poses.t.dtype
    problem = prepare_landmarks(problem, config)
    trust0 = jnp.asarray(config.trust_region_size, dtype)
    tiny = jnp.asarray(1e-30, dtype)

    def cond(carry):
        p, trust, it, status, init_c, post_c, dn, norms = carry
        return (it < max_iter) & (status == _RUNNING)

    def body(carry):
        p, trust, it, status, init_c, post_c, dn0, norms0 = carry
        if config.use_dogleg:
            res = dogleg_iteration(p, config, use_imu, trust)
            trust_n = res.trust_radius
        else:
            res = gn_iteration(p, config, use_imu, gn_damping,
                               error_increase_allowed)
            trust_n = trust
        pre, post, dn = res.pre_cost, res.post_cost, res.delta_norm
        init_c = jnp.where(it == 0, pre, init_c)
        status_n = _status_code(res, config, tiny)
        norms = (res.pre_solve_norm, res.post_solve_norm,
                 res.inner_trials)
        return (res.problem, trust_n, it + 1, status_n, init_c, post, dn,
                norms)

    carry0 = (problem, trust0, jnp.asarray(0), jnp.asarray(_RUNNING),
              jnp.zeros((), dtype), jnp.zeros((), dtype),
              jnp.zeros((), dtype),
              (jnp.zeros((), dtype), jnp.zeros((), dtype),
               jnp.zeros((), jnp.int32)))
    p, trust, it, status, init_c, post_c, dn, norms = jax.lax.while_loop(
        cond, body, carry0)
    eb = error_breakdown(p, config, use_imu)
    p = finalize_landmarks(p, config)
    stats = dict(iterations=it, status=status, initial_cost=init_c,
                 final_cost=post_c, delta_norm=dn, breakdown=eb,
                 pre_solve_norm=norms[0], post_solve_norm=norms[1],
                 inner_trials=norms[2])
    return p, stats


@dataclass
class Summary:
    """SolutionSummary analog (reference BundleAdjuster.h:48-70).

    Per-family weighted squared-error totals (conditioning populations
    separate) mirror the reference's epilogue (cpp:666-704); they are
    filled by `solve` from `ba_tpu.solver.summary.error_breakdown`.
    """

    iterations: int = 0
    initial_cost: float = 0.0
    final_cost: float = 0.0
    delta_norm: float = 0.0
    result: str = "Success"
    # last inner trial's solve-norm trace (reference pre_solve_norm /
    # post_solve_norm, h:60-62, filled per dogleg trial cpp:1036-1058;
    # post_solve_norm keeps the trial's evaluated cost even when that
    # trial was rejected and rolled back)
    pre_solve_norm: float = 0.0
    post_solve_norm: float = 0.0
    inner_iterations: int = 0
    # per-family breakdown at the solution
    proj_error: float = 0.0
    cond_proj_error: float = 0.0
    unary_error: float = 0.0
    binary_error: float = 0.0
    inertial_error: float = 0.0
    cond_inertial_error: float = 0.0
    num_proj_residuals: int = 0
    num_cond_proj_residuals: int = 0
    num_imu_residuals: int = 0
    num_cond_imu_residuals: int = 0
    # (K, K) marginal covariance of the calibration block, filled when
    # config.calculate_calibration_marginals (reference
    # SolutionSummary::calibration_marginals, BundleAdjuster.h:63-67,
    # filled cpp:771-785)
    calibration_marginals: Optional["object"] = None
    # staged-Tvs state at exit (reference IsTranslationEnabled, h:556)
    tvs_translation_enabled: bool = True

    @property
    def is_good(self) -> bool:
        """reference SolutionSummary::IsResultGood (h:68-69)."""
        return self.result in ("Success", "ErrorChangeBelowThreshold",
                               "ParamChangeBelowThreshold")


def _auto_band_width(problem: Problem, config: BAConfig) -> BAConfig:
    """Populate `band_width` from the problem structure when unset, so the
    banded-grid assembly fast path is the default, not opt-in knowledge
    (the reference's `use_sparse_solver` default-on ergonomics, h:92).

    Skipped when a calibration block is present (dense rows break the
    band) or when the detected band covers the whole window (dense wins).
    """
    if config.band_width or config.calib_dim:
        return config
    from .assemble import band_width_of

    P = problem.poses.q.shape[0]
    b = band_width_of(problem)
    if 0 < b < P:
        return dataclasses.replace(config, band_width=b)
    return config


def _calibration_epilogue(problem: Problem, config: BAConfig,
                          use_imu: bool, summary: "Summary") -> None:
    """Fill Summary.calibration_marginals and/or dump the reduced system
    (reference cpp:600-627, 771-785): one extra assembly at the solution.
    Uses the general (dense) assembly path regardless of band_width —
    the calibration block needs the dense S anyway."""
    if not (config.calculate_calibration_marginals
            or config.write_reduced_camera_matrix):
        return
    from .linear import calibration_marginals, dump_system

    cfg = dataclasses.replace(config, band_width=0)
    p = prepare_landmarks(problem, config)
    imu_eval = _imu_eval(p, cfg, use_imu, True)
    asm = assemble(p, cfg, imu_eval=imu_eval)
    if config.calculate_calibration_marginals and config.calib_dim:
        import numpy as np

        summary.calibration_marginals = np.asarray(
            calibration_marginals(asm, config.calib_dim))
    if config.write_reduced_camera_matrix:
        dump_system(asm, config.write_reduced_camera_matrix)


def solve(problem: Problem, config: BAConfig, max_iter: int = 10,
          gn_damping: float = 1.0, error_increase_allowed: bool = False,
          use_imu: Optional[bool] = None, verbose: int = 0):
    """Outer solve loop (reference Solve, cpp:278-705): host-side convergence
    control around jitted whole-iteration programs.

    `verbose > 0` prints per-iteration lines (the reference's level-gated
    StreamMessage debug stream, Utils.h:40-43).

    Returns (problem, Summary).

    With `verbose == 0` and no Tvs staging the entire adaptive loop runs
    as one jitted program (`solve_adaptive`); the host loop below is kept
    for the per-iteration debug stream and for staged-Tvs solves (whose
    activation flips a *static* config bit between compiled programs).
    Both paths share `_status_code` for the exit criteria.
    """
    if use_imu is None:
        use_imu = bool(jax.device_get(jnp.any(problem.imu.valid)))
    config = _auto_band_width(problem, config)
    staging = (config.do_tvs and config.tvs_translation_staging
               and config.tvs_translation_active)
    if staging:
        # start with Tvs translation frozen (reference initializes
        # translation_enabled_ false, h:170)
        config = dataclasses.replace(config, tvs_translation_active=False)
    if not verbose and not staging:
        p, stats = solve_adaptive(problem, config, use_imu, max_iter,
                                  gn_damping, error_increase_allowed)
        summary = Summary()
        summary.iterations = int(stats["iterations"])
        summary.initial_cost = float(stats["initial_cost"])
        summary.final_cost = float(stats["final_cost"])
        summary.delta_norm = float(stats["delta_norm"])
        summary.result = _RESULT_NAMES[int(stats["status"])]
        summary.pre_solve_norm = float(stats["pre_solve_norm"])
        summary.post_solve_norm = float(stats["post_solve_norm"])
        summary.inner_iterations = int(stats["inner_trials"])
        _fill_breakdown(summary, stats["breakdown"])
        _calibration_epilogue(p, config, use_imu, summary)
        return p, summary
    problem = prepare_landmarks(problem, config)
    summary = Summary()
    trust = jnp.asarray(config.trust_region_size, problem.poses.t.dtype)
    n_poses = int(jax.device_get(jnp.sum(problem.poses.active)))
    last_tvs = (jax.device_get((problem.rig.tvs_q[0], problem.rig.tvs_t[0]))
                if staging else None)
    for it in range(max_iter):
        if config.use_dogleg:
            res = dogleg_iteration(problem, config, use_imu, trust)
            trust = res.trust_radius
        else:
            res = gn_iteration(problem, config, use_imu, gn_damping,
                               error_increase_allowed)
        problem = res.problem
        pre = float(res.pre_cost)
        post = float(res.post_cost)
        if verbose:
            print(f"  iter {it:3d}: cost {pre:12.6g} -> {post:12.6g}  "
                  f"|dx| {float(res.delta_norm):10.4g}  "
                  f"{'accepted' if bool(res.accepted) else 'REJECTED'}")
        if it == 0:
            summary.initial_cost = pre
        summary.iterations = it + 1
        summary.final_cost = post
        summary.delta_norm = float(res.delta_norm)
        summary.pre_solve_norm = float(res.pre_solve_norm)
        summary.post_solve_norm = float(res.post_solve_norm)
        summary.inner_iterations = int(res.inner_trials)
        if staging and not config.tvs_translation_active:
            # stabilization test (reference cpp:257-271): enable the Tvs
            # translation once the extrinsic's se3-log difference between
            # consecutive builds drops below 0.01 with >= 30 poses
            tvs_now = jax.device_get((problem.rig.tvs_q[0],
                                      problem.rig.tvs_t[0]))
            log_dif = float(jnp.linalg.norm(lie.se3_log_decoupled(
                tvs_now, last_tvs)))
            if verbose:
                print(f"  tvs logDif {log_dif:.5g}")
            if log_dif < 0.01 and n_poses >= 30:
                if verbose:
                    print("  ENABLING Tvs TRANSLATION")
                config = dataclasses.replace(config,
                                             tvs_translation_active=True)
            last_tvs = tvs_now
        status = int(jax.device_get(_status_code(res, config)))
        if status != _RUNNING:
            summary.result = _RESULT_NAMES[status]
            break
    summary.tvs_translation_enabled = config.tvs_translation_active
    # per-family error epilogue (reference cpp:666-704)
    from .summary import error_breakdown

    eb = error_breakdown(problem, config, use_imu)
    _fill_breakdown(summary, eb)
    problem = finalize_landmarks(problem, config)
    _calibration_epilogue(problem, config, use_imu, summary)
    return problem, summary


def _fill_breakdown(summary: "Summary", eb) -> None:
    summary.proj_error = float(eb.proj_error)
    summary.cond_proj_error = float(eb.cond_proj_error)
    summary.unary_error = float(eb.unary_error)
    summary.binary_error = float(eb.binary_error)
    summary.inertial_error = float(eb.inertial_error)
    summary.cond_inertial_error = float(eb.cond_inertial_error)
    summary.num_proj_residuals = int(eb.num_proj)
    summary.num_cond_proj_residuals = int(eb.num_cond_proj)
    summary.num_imu_residuals = int(eb.num_imu)
    summary.num_cond_imu_residuals = int(eb.num_cond_imu)
