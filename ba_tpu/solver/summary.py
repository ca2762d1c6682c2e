"""Solution diagnostics: per-family error totals + landmark outlier ratio.

Parity with the reference's `SolutionSummary<Scalar>` (BundleAdjuster.h:
48-70, filled in Solve / SolveInternal cpp:666-704, 1036-1058) and
`LandmarkOutlierRatio` (cpp:1806-1812).  Everything here is a pure jitted
reduction over the residual tables — no solver state is mutated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import robust
from ..core.problem import BAConfig, Problem
from ..core.residuals import prior, reprojection


class ErrorBreakdown(NamedTuple):
    """Weighted squared-error totals per residual family, with the
    conditioning-edge populations reported separately (the reference's
    conditioning error epilogue, cpp:666-704)."""

    proj_error: jax.Array            # non-conditioning projection error
    cond_proj_error: jax.Array       # conditioning projection error
    unary_error: jax.Array
    binary_error: jax.Array
    inertial_error: jax.Array        # non-conditioning IMU error
    cond_inertial_error: jax.Array
    num_proj: jax.Array              # valid residual counts
    num_cond_proj: jax.Array
    num_unary: jax.Array
    num_binary: jax.Array
    num_imu: jax.Array
    num_cond_imu: jax.Array


@partial(jax.jit, static_argnames=("config", "use_imu"))
def error_breakdown(problem: Problem, config: BAConfig,
                    use_imu: bool) -> ErrorBreakdown:
    pe = reprojection.evaluate(problem, config, with_jacobians=False)
    pr = problem.proj
    w = jnp.where(pr.valid, pr.weight, 0.0)
    esq = w * pe.err_sq
    cond = pr.cond & pr.valid

    ue = prior.evaluate_unary(problem, config, with_jacobians=False)
    be = prior.evaluate_binary(problem, config, with_jacobians=False)

    dtype = esq.dtype
    if use_imu:
        from ..core.residuals import imu as imu_mod

        ie = imu_mod.evaluate(problem, config, with_jacobians=False)
        icond = problem.imu.cond & problem.imu.valid
        inertial = jnp.sum(jnp.where(icond, 0.0, ie.err_sq))
        cond_inertial = jnp.sum(jnp.where(icond, ie.err_sq, 0.0))
        num_imu = jnp.sum(problem.imu.valid & ~problem.imu.cond)
        num_cond_imu = jnp.sum(icond)
    else:
        inertial = cond_inertial = jnp.zeros((), dtype)
        num_imu = num_cond_imu = jnp.zeros((), jnp.int32)

    return ErrorBreakdown(
        proj_error=jnp.sum(jnp.where(cond, 0.0, esq)),
        cond_proj_error=jnp.sum(jnp.where(cond, esq, 0.0)),
        unary_error=jnp.sum(ue.err_sq),
        binary_error=jnp.sum(be.err_sq),
        inertial_error=inertial,
        cond_inertial_error=cond_inertial,
        num_proj=jnp.sum(pr.valid & ~pr.cond),
        num_cond_proj=jnp.sum(cond),
        num_unary=jnp.sum(problem.unary.valid),
        num_binary=jnp.sum(problem.binary.valid),
        num_imu=num_imu,
        num_cond_imu=num_cond_imu)


@partial(jax.jit, static_argnames=("config",))
def landmark_outlier_ratio(problem: Problem, config: BAConfig) -> jax.Array:
    """Fraction of each landmark's projection residuals flagged as robust
    outliers (weight < 1 under the current Huber scale) — the reference's
    `LandmarkOutlierRatio(id)` accessor (cpp:1806-1812), batched over all
    landmarks.  Landmarks with no residuals report 0.
    """
    pe = reprojection.evaluate(problem, config, with_jacobians=False)
    pr = problem.proj
    L = problem.lms.x.shape[0]
    base_w = jnp.where(pr.valid, pr.weight, 0.0)
    w_rob = robust.huber_weights(base_w * pe.err_sq, pr.valid, pr.cond,
                                 config.outlier_threshold)
    is_outlier = (w_rob < 1.0) & pr.valid
    lm_ids = pr.lm.astype(jnp.int32)
    n_out = jax.ops.segment_sum(is_outlier.astype(pe.err_sq.dtype), lm_ids,
                                num_segments=L)
    n_tot = jax.ops.segment_sum(pr.valid.astype(pe.err_sq.dtype), lm_ids,
                                num_segments=L)
    return n_out / jnp.maximum(n_tot, 1.0)
