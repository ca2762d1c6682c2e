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


def chol3(A):
    """Closed-form lower Cholesky of batched 3x3 SPD blocks (pure VPU
    elementwise math — XLA TPU serializes tiny batched `cholesky` calls).

    Pivots are clamped at a tiny positive floor so exactly-PSD inputs
    (e.g. prior information matrices with zero rows from infinite
    covariances) yield a zero factor column instead of 0/0 NaNs."""
    tiny = jnp.asarray(1e-30, A.dtype)
    l11 = jnp.sqrt(jnp.maximum(A[..., 0, 0], 0.0))
    d1 = jnp.maximum(l11, tiny)
    l21 = A[..., 1, 0] / d1
    l31 = A[..., 2, 0] / d1
    l22 = jnp.sqrt(jnp.maximum(A[..., 1, 1] - l21 * l21, 0.0))
    d2 = jnp.maximum(l22, tiny)
    l32 = (A[..., 2, 1] - l31 * l21) / d2
    l33 = jnp.sqrt(jnp.maximum(A[..., 2, 2] - l31 * l31 - l32 * l32, 0.0))
    z = jnp.zeros_like(l11)
    return jnp.stack([
        jnp.stack([l11, z, z], axis=-1),
        jnp.stack([l21, l22, z], axis=-1),
        jnp.stack([l31, l32, l33], axis=-1)], axis=-2)


def tri_inv3(L):
    """Closed-form inverse of batched lower-triangular 3x3 blocks."""
    i11 = 1.0 / L[..., 0, 0]
    i22 = 1.0 / L[..., 1, 1]
    i33 = 1.0 / L[..., 2, 2]
    w21 = -L[..., 1, 0] * i11 * i22
    w32 = -L[..., 2, 1] * i22 * i33
    w31 = (L[..., 1, 0] * L[..., 2, 1]
           - L[..., 2, 0] * L[..., 1, 1]) * i11 * i22 * i33
    z = jnp.zeros_like(i11)
    return jnp.stack([
        jnp.stack([i11, z, z], axis=-1),
        jnp.stack([w21, i22, z], axis=-1),
        jnp.stack([w31, w32, i33], axis=-1)], axis=-2)


def _blk(A, i, j):
    return A[..., 3 * i: 3 * i + 3, 3 * j: 3 * j + 3]


def chol_blocked(A):
    """Lower Cholesky of batched (3n x 3n) SPD matrices by 3x3 blocks —
    closed-form `chol3`/`tri_inv3` on the pivots, batched einsums for the
    updates; everything stays on the VPU (no serialized LAPACK loops).

    Used for the per-residual covariance factors (9x9 IMU, 6x6 priors)."""
    n = A.shape[-1] // 3
    L = [[None] * n for _ in range(n)]
    Rinv = [None] * n
    mT = lambda M: jnp.swapaxes(M, -1, -2)
    for i in range(n):
        for j in range(i + 1):
            S = _blk(A, i, j)
            for k in range(j):
                S = S - L[i][k] @ mT(L[j][k])
            if i == j:
                L[i][i] = chol3(S)
                Rinv[i] = tri_inv3(L[i][i])
            else:
                L[i][j] = S @ mT(Rinv[j])
    z3 = jnp.zeros_like(_blk(A, 0, 0))
    rows = [jnp.concatenate([L[i][j] if j <= i else z3 for j in range(n)],
                            axis=-1) for i in range(n)]
    return jnp.concatenate(rows, axis=-2)


def tri_inv_blocked(L):
    """Inverse of batched lower-triangular (3n x 3n) matrices by 3x3
    blocks (companion of `chol_blocked`)."""
    n = L.shape[-1] // 3
    W = [[None] * n for _ in range(n)]
    for i in range(n):
        W[i][i] = tri_inv3(_blk(L, i, i))
    for i in range(n):
        for j in range(i - 1, -1, -1):
            S = _blk(L, i, j) @ W[j][j]
            for k in range(j + 1, i):
                S = S + _blk(L, i, k) @ W[k][j]
            W[i][j] = -W[i][i] @ S
    z3 = jnp.zeros_like(_blk(L, 0, 0))
    rows = [jnp.concatenate([W[i][j] if j <= i else z3 for j in range(n)],
                            axis=-1) for i in range(n)]
    return jnp.concatenate(rows, axis=-2)


def whiten_factor(cov_inv_or_cov, from_cov=False):
    """A factor S with S^T S == cov_inv, batched.

    Any square root whitens: the assembled normal equations, costs and
    robust weights only see the quadratic forms J^T cov_inv J, J^T cov_inv
    r and r^T cov_inv r, which are invariant to S -> Q S for orthogonal Q.
    The reference's symmetric `cov_inv.sqrt()` (Eigen MatrixFunctions) is
    one such choice; the triangular factor here is the TPU-native one
    (closed-form blocked Cholesky, no eigh).

    `from_cov=True` takes the *covariance* C instead and returns
    S = chol(C)^-1 (so S^T S = C^-1) without ever forming the inverse.
    """
    if from_cov:
        return tri_inv_blocked(chol_blocked(cov_inv_or_cov))
    return jnp.swapaxes(chol_blocked(cov_inv_or_cov), -1, -2)


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
