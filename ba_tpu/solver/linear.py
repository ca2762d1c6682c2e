"""Reduced-system solve + landmark back-substitution.

Reference: `CalculateGn` (LDLT of the reduced camera matrix S,
src/BundleAdjuster.cpp:748-833) and `GetLandmarkDelta` (back-substitution,
cpp:709-744).  TPU-native: dense Cholesky of S (poses are few relative to
landmarks — the same asymmetry the Schur trick exploits), batched block
products for the landmark deltas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .assemble import Assembly


class GnStep(NamedTuple):
    delta_p: jax.Array     # (N,)
    delta_l: jax.Array     # (L*lm,)
    ok: jax.Array          # scalar bool — factorization succeeded


def solve_reduced(asm: Assembly) -> GnStep:
    """delta_p = S^-1 rhs_sc via Cholesky; delta_l by back-substitution."""
    S = asm.S
    # tiny Tikhonov jitter keeps the masked-diag matrix SPD in f32
    eps = jnp.asarray(1e-10 if S.dtype == jnp.float64 else 1e-6, S.dtype)
    Sj = S + eps * jnp.eye(S.shape[0], dtype=S.dtype)
    c, low = jax.scipy.linalg.cho_factor(Sj, lower=True)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(c)))
    delta_p = jax.scipy.linalg.cho_solve((c, low), asm.rhs_sc)
    delta_p = jnp.where(jnp.isfinite(delta_p), delta_p, 0.0)
    delta_p = jnp.where(asm.col_mask, delta_p, 0.0)
    delta_l = back_substitute(asm, delta_p)
    return GnStep(delta_p=delta_p, delta_l=delta_l, ok=ok)


def back_substitute(asm: Assembly, delta_p) -> jax.Array:
    """delta_l = V^-1 (rhs_l - W^T delta_p)  (reference GetLandmarkDelta)."""
    L, lm, _ = asm.vinv.shape
    resid = (asm.rhs_l - asm.W.T @ delta_p).reshape(L, lm)
    return jnp.einsum("lij,lj->li", asm.vinv, resid).reshape(-1)


def calibration_marginals(asm: Assembly, calib_dim: int) -> jax.Array:
    """Marginal covariance of the calibration block by unit-vector solves
    (reference cpp:771-785)."""
    N = asm.S.shape[0]
    c, low = jax.scipy.linalg.cho_factor(
        asm.S + 1e-10 * jnp.eye(N, dtype=asm.S.dtype), lower=True)
    eye = jnp.eye(N, dtype=asm.S.dtype)[:, N - calib_dim:]
    cols = jax.scipy.linalg.cho_solve((c, low), eye)
    return cols[N - calib_dim:, :]
