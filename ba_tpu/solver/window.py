"""Sliding-window marginalization (fixed-lag VINS).

The reference only *prototypes* the marginalization prior in
/root/reference/matlab/marginalization.py (reorder the Hessian so the
departing pose+landmarks are the trailing block; prior = U - W V^-1 W^T) and
relies on inactive poses + conditioning residuals at runtime
(SURVEY.md §5.7).  Here marginalization is first-class and fully jitted:

  1. select the residuals consumed by the departing poses: observations of
     landmarks *anchored* at a departing pose, and IMU/unary/binary edges
     touching a departing pose (observations of surviving landmarks from
     departing poses are dropped — the standard sparsity-preserving choice);
  2. assemble their normal equations (plus the existing prior, folded in at
     the current estimate) over all pose dims, eliminating the departing
     landmarks with the usual batched Schur step;
  3. Schur-complement the departing pose dims with a masked-inverse trick
     (no dynamic slicing — everything stays static-shape):
         B = Pd S Pd + (I - Pd) + eps*Pd
         H_prior = (I-Pd) (S - S B^-1 S) (I-Pd),
         g_prior = (I-Pd) (rhs - S B^-1 rhs)
     where Pd projects onto departing dims;
  4. the result is a dense `MargPrior` linearized at the current state
     (first-estimate Jacobian: the prior's Hessian is fixed; only the
     right-tangent offset delta = x (-) lin varies between iterations).

`apply_marginalization` deactivates the departing states and invalidates the
consumed residuals, returning the updated problem with the new prior.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.problem import BAConfig, MargPrior, Problem
from . import assemble as asm


def _select_residuals(problem: Problem, drop):
    """Mask residual tables down to the set consumed by marginalization."""
    lm_drop = drop[problem.lms.ref_pose] & problem.lms.active

    proj = dataclasses.replace(
        problem.proj,
        valid=problem.proj.valid & lm_drop[problem.proj.lm])
    unary = dataclasses.replace(
        problem.unary,
        valid=problem.unary.valid & drop[problem.unary.pose])
    binary = dataclasses.replace(
        problem.binary,
        valid=problem.binary.valid
        & (drop[problem.binary.pose1] | drop[problem.binary.pose2]))
    imu = dataclasses.replace(
        problem.imu,
        valid=problem.imu.valid
        & (drop[problem.imu.pose1] | drop[problem.imu.pose2]))
    return dataclasses.replace(problem, proj=proj, unary=unary,
                               binary=binary, imu=imu), lm_drop


@partial(jax.jit, static_argnames=("config", "use_imu"))
def marginalize(problem: Problem, config: BAConfig, use_imu: bool,
                drop) -> MargPrior:
    """Compute the new prior for departing poses `drop` ((P,) bool)."""
    D = config.pose_dim
    P = problem.poses.q.shape[0]
    n = P * D
    dtype = problem.poses.t.dtype

    sub, lm_drop = _select_residuals(problem, drop)
    # all currently-active dims participate (departing poses included)
    cmask = asm.col_mask(sub, config)
    colm = cmask.astype(dtype)
    colm6 = asm.col_mask(sub, config, 6).astype(dtype)

    comp, _ = asm.proj_contribution(sub, config, colm6)
    comp = asm._add(comp, asm.prior_contribution(sub, config, colm6))
    contrib = asm.expand_contribution(comp, P, D, config.calib_dim)
    if use_imu:
        from ..core.residuals import imu as imu_mod
        ie = imu_mod.evaluate(sub, config, with_jacobians=True)
        contrib = asm._add(contrib,
                           asm.imu_contribution(sub, config, colm, ie))
    contrib = asm._add(contrib, asm.marg_contribution(sub, config, colm))

    # eliminate departing landmarks (only they carry residuals here)
    L, lm, _ = contrib.V.shape
    from ..utils.linalg import block_diag_inv
    vinv = block_diag_inv(contrib.V)
    W3 = contrib.W.reshape(-1, L, lm)
    WVi = jnp.einsum("nlk,lkj->nlj", W3, vinv).reshape(-1, L * lm)
    S_full = contrib.U - WVi @ contrib.W.T
    rhs_full = contrib.rhs_p - WVi @ contrib.rhs_l

    S = S_full[:n, :n]
    rhs = rhs_full[:n]

    # Schur out departing pose dims via the masked-inverse trick
    dmask = (jnp.repeat(drop, D) & cmask[:n]).astype(dtype)
    eps = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-5, dtype)
    Pd = dmask
    B = (S * Pd[:, None] * Pd[None, :]
         + jnp.diag(1.0 - Pd)
         + eps * jnp.diag(Pd))
    Binv = jnp.linalg.inv(B)
    # only the d-block of B^-1 matters; zero the rest to avoid leakage
    Binv = Binv * Pd[:, None] * Pd[None, :]
    SP = S * Pd[None, :]        # columns d
    H_new = S - SP @ Binv @ SP.T
    g_new = rhs - SP @ (Binv @ (rhs * Pd))
    keep = (1.0 - Pd)
    H_new = H_new * keep[:, None] * keep[None, :]
    g_new = g_new * keep
    # PSD safeguard: the Schur subtraction is PSD in exact arithmetic,
    # but TPU-f32 matmul roundoff can tip an eigenvalue slightly
    # negative — an INDEFINITE prior makes the window cost unbounded
    # below and the fixed-lag pipeline diverges (observed: one of 16
    # otherwise-identical streams walked 15 km off on the chip while
    # every CPU run stayed at 0.4 cm ATE).  Symmetrize and clip negative
    # eigenvalues; in f64 the clip is a no-op to roundoff.
    H_new = 0.5 * (H_new + H_new.T)
    evals, evecs = jnp.linalg.eigh(H_new)
    H_new = (evecs * jnp.maximum(evals, 0.0)[None, :]) @ evecs.T

    poses = problem.poses
    return MargPrior(H=H_new, g=g_new, lin_q=poses.q, lin_t=poses.t,
                     lin_v=poses.v, lin_b=poses.b,
                     active=jnp.ones((), bool))


def apply_marginalization(problem: Problem, config: BAConfig, use_imu: bool,
                          drop) -> Problem:
    """Marginalize + deactivate departing states + invalidate consumed
    residuals.  `drop` is a (P,) bool mask of departing poses."""
    prior = marginalize(problem, config, use_imu, drop)
    lm_drop = drop[problem.lms.ref_pose] & problem.lms.active

    poses = dataclasses.replace(problem.poses,
                                active=problem.poses.active & ~drop)
    lms = dataclasses.replace(problem.lms,
                              active=problem.lms.active & ~lm_drop)
    proj = dataclasses.replace(
        problem.proj,
        valid=problem.proj.valid & ~lm_drop[problem.proj.lm]
        & ~drop[problem.proj.pose])
    unary = dataclasses.replace(
        problem.unary,
        valid=problem.unary.valid & ~drop[problem.unary.pose])
    binary = dataclasses.replace(
        problem.binary,
        valid=problem.binary.valid & ~drop[problem.binary.pose1]
        & ~drop[problem.binary.pose2])
    imu = dataclasses.replace(
        problem.imu,
        valid=problem.imu.valid & ~drop[problem.imu.pose1]
        & ~drop[problem.imu.pose2])
    return dataclasses.replace(problem, poses=poses, lms=lms, proj=proj,
                               unary=unary, binary=binary, imu=imu,
                               marg=prior)
