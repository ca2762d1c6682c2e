"""Unary (pose prior) and binary (relative pose) residuals.

Reference: `UnaryResidualT` / `BinaryResidualT` (Types.h:270-296) evaluated in
the serial loops at BundleAdjuster.cpp:1392-1484.  Residuals are 6-dim on the
decoupled SE3 manifold and are whitened by sqrt(cov_inv) (eigh-based batched
matrix sqrt here vs Eigen MatrixFunctions there).

  unary:  r = log_decoupled(T_wp, T_prior)
  binary: r = log_decoupled(T_w1 * T_12_meas, T_w2)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from ...utils.linalg import whiten_factor


class PriorEval(NamedTuple):
    r: jax.Array        # (N, 6) whitened
    j1: jax.Array       # (N, 6, 6) whitened, wrt pose (or pose1)
    j2: jax.Array       # (N, 6, 6) whitened, wrt pose2 (zeros for unary)
    err_sq: jax.Array   # (N,) squared mahalanobis error


def _whiten(r, J1, J2, cov_inv, valid):
    # any S with S^T S = cov_inv whitens (the solver only sees quadratic
    # forms); the triangular chol factor avoids batched eigh on TPU
    S = whiten_factor(cov_inv)
    rw = jnp.einsum("nij,nj->ni", S, r)
    j1w = jnp.einsum("nij,njk->nik", S, J1)
    j2w = jnp.einsum("nij,njk->nik", S, J2) if J2 is not None else \
        jnp.zeros_like(j1w)
    m = valid[:, None]
    rw = jnp.where(m, rw, 0.0)
    j1w = jnp.where(m[..., None], j1w, 0.0)
    j2w = jnp.where(m[..., None], j2w, 0.0)
    err_sq = jnp.einsum("ni,nij,nj->n", r, cov_inv, r)
    err_sq = jnp.where(valid, err_sq, 0.0)
    return rw, j1w, j2w, err_sq


def evaluate_unary(problem, config, with_jacobians=True) -> PriorEval:
    u = problem.unary
    poses = problem.poses
    pq, pt = poses.q[u.pose], poses.t[u.pose]

    def r_of(delta, pq, pt, uq, ut):
        q, t = lie.se3_retract((pq, pt), delta)
        return lie.se3_log_decoupled((q, t), (uq, ut))

    zeros = jnp.zeros((u.pose.shape[0], 6), pt.dtype)
    r = jax.vmap(r_of)(zeros, pq, pt, u.q, u.t)
    if with_jacobians:
        J = jax.vmap(jax.jacfwd(r_of))(zeros, pq, pt, u.q, u.t)
    else:
        J = jnp.zeros(r.shape + (6,), r.dtype)
    return PriorEval(*_whiten(r, J, None, u.cov_inv, u.valid))


def evaluate_binary(problem, config, with_jacobians=True) -> PriorEval:
    b = problem.binary
    poses = problem.poses
    p1 = (poses.q[b.pose1], poses.t[b.pose1])
    p2 = (poses.q[b.pose2], poses.t[b.pose2])

    def r_of(delta, q1, t1, q2, t2, mq, mt):
        d1, d2 = delta[:6], delta[6:]
        T1 = lie.se3_retract((q1, t1), d1)
        T2 = lie.se3_retract((q2, t2), d2)
        pred = lie.se3_compose(T1, (mq, mt))
        return lie.se3_log_decoupled(pred, T2)

    zeros = jnp.zeros((b.pose1.shape[0], 12), p1[1].dtype)
    r = jax.vmap(r_of)(zeros, p1[0], p1[1], p2[0], p2[1], b.q, b.t)
    if with_jacobians:
        J = jax.vmap(jax.jacfwd(r_of))(zeros, p1[0], p1[1], p2[0], p2[1],
                                       b.q, b.t)
        J1, J2 = J[..., :6], J[..., 6:]
    else:
        J1 = jnp.zeros(r.shape + (6,), r.dtype)
        J2 = J1
    return PriorEval(*_whiten(r, J1, J2, b.cov_inv, b.valid))
