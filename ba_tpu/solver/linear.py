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
    """delta_p = S^-1 rhs_sc via Jacobi-scaled Cholesky + one step of
    iterative refinement; delta_l by back-substitution.

    The Jacobi scaling S' = D^-1/2 S D^-1/2 (D = diag(S)) is essential on
    TPU: S mixes pixel^2 and IMU-mahalanobis units with entry magnitudes
    spanning 1e4..1e8, and an unscaled f32 Cholesky loses the step entirely
    at a few hundred pose dims.  Refinement recovers another ~3 digits.
    """
    S = asm.S
    dtype = S.dtype
    d = jnp.diagonal(S)
    scal = jax.lax.rsqrt(jnp.maximum(d, 1e-12))
    Ss = S * scal[:, None] * scal[None, :]
    # after scaling, diag(Ss) == 1, so eps is a *relative* Levenberg
    # damping: sqrt(machine-eps)-scale keeps the factorization PD against
    # rounding of the Schur subtraction AND bounds steps along exact gauge
    # null directions (e.g. DoTvs without IMU) at negligible bias for
    # well-conditioned dims
    eps = jnp.asarray(1e-8 if dtype == jnp.float64 else 1e-4, dtype)
    Ss = Ss + eps * jnp.eye(S.shape[0], dtype=dtype)
    c, low = jax.scipy.linalg.cho_factor(Ss, lower=True)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(c)))

    def scaled_solve(rhs):
        y = jax.scipy.linalg.cho_solve((c, low), rhs * scal)
        return y * scal

    delta_p = scaled_solve(asm.rhs_sc)
    # one step of iterative refinement in the original units
    resid = asm.rhs_sc - S @ delta_p
    delta_p = delta_p + scaled_solve(resid)
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


def dump_system(asm: Assembly, out_dir: str) -> None:
    """Write the reduced camera system as text files — the reference's
    `write_reduced_camera_matrix` dumps (`s.txt`, `rhs.txt`, ...,
    src/BundleAdjuster.cpp:600-627), used for cross-implementation numeric
    comparison (matlab/test_marginalization.py consumes the same format)."""
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    for name, arr in [("s", asm.S), ("rhs", asm.rhs_sc), ("u", asm.U),
                      ("rhs_p", asm.rhs_p), ("w", asm.W),
                      ("v", asm.V.reshape(asm.V.shape[0], -1)),
                      ("rhs_l", asm.rhs_l)]:
        np.savetxt(os.path.join(out_dir, f"{name}.txt"), np.asarray(arr))
