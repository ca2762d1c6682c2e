"""Small batched linear-algebra helpers."""

from __future__ import annotations

import jax.numpy as jnp


def spd_sqrt(A):
    """Symmetric PSD matrix square root via eigh, batched over leading dims.

    The reference whitens residuals with `cov_inv.sqrt()` (Eigen
    MatrixFunctions, e.g. BundleAdjuster.h:377-456); eigh is the batched,
    differentiable TPU equivalent.
    """
    w, v = jnp.linalg.eigh(A)
    w = jnp.sqrt(jnp.maximum(w, 0.0))
    return jnp.einsum("...ij,...j,...kj->...ik", v, w, v)


def block_diag_inv(V, floor=1e-6):
    """Invert a batch of small SPD blocks with a diagonal floor (the
    reference's per-landmark jtj inversion, cpp:431-442)."""
    k = V.shape[-1]
    V = V + floor * jnp.eye(k, dtype=V.dtype)
    return jnp.linalg.inv(V)
