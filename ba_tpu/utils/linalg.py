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


def inv3(A):
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    TPU-friendly: pure VPU elementwise math, no LU factorization (which XLA
    TPU does not implement for f64 and serializes for tiny batched blocks).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / det
    rows = jnp.stack([
        jnp.stack([co00, co01, co02], axis=-1),
        jnp.stack([co10, co11, co12], axis=-1),
        jnp.stack([co20, co21, co22], axis=-1),
    ], axis=-2)
    return rows * inv_det[..., None, None]


def block_diag_inv(V, floor=1e-6):
    """Invert a batch of small SPD blocks with a diagonal floor (the
    reference's per-landmark jtj inversion, cpp:431-442).  Closed forms for
    the 1x1 (inverse-depth) and 3x3 (XYZ landmark) cases keep this on the
    VPU instead of a serialized batched LU."""
    k = V.shape[-1]
    V = V + floor * jnp.eye(k, dtype=V.dtype)
    if k == 1:
        return 1.0 / V
    if k == 3:
        return inv3(V)
    return jnp.linalg.inv(V)
