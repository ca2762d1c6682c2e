"""Batched camera models: linear (pinhole) and FOV distortion.

TPU-native replacement for the Calibu camera surface the reference depends on
(`CameraInterface::Transfer3d`, `dTransfer3d_dray`, `dTransfer_dparams` — see
SURVEY.md L0 row).  Models are pure functions of (params, point); Jacobians
come from `jax.jacfwd` at the call site, so adding a model only requires
`project`/`unproject`.

Parameter layouts (leading entries of a fixed-width `params` vector, so a rig
with mixed models still batches to a static shape):
  linear:      [fx, fy, cx, cy]
  fov:         [fx, fy, cx, cy, w]   (FOV distortion of Devernay & Faugeras —
               the model used by the reference's synthetic generator,
               /root/reference/matlab/simulate_vins.py:56-93)
  poly3:       [fx, fy, cx, cy, k1, k2, k3]  (radial polynomial,
               r_d = r_u (1 + k1 r_u^2 + k2 r_u^4 + k3 r_u^6) — Calibu's
               Poly3 model; unprojection by a fixed-iteration Newton solve)
  equidistant: [fx, fy, cx, cy]  (fisheye r_d = atan(r_u) — Calibu's
               equidistant/KB1 model)

Projection is scale-invariant in the homogeneous 4-vector sense: `project`
takes a 3-vector ray (the head of T_sw * [xyz, rho]) and needs no depth
division beyond x/z, y/z, so inverse-depth (rho=0 included) transfers work
unchanged.

Every model is expressed as a radial factor on the normalized coordinates;
dispatch is by `jnp.where` over the (traced) model id so a mixed-model rig
still evaluates in one fused batch.
"""

from __future__ import annotations

import jax.numpy as jnp

MODEL_LINEAR = 0
MODEL_FOV = 1
MODEL_POLY3 = 2
MODEL_EQUIDISTANT = 3

# widest parameter vector across models (poly3: 7)
MAX_PARAMS = 7
_SMALL = 1e-9


def _fov_factor(params, r_u):
    """Distorted/undistorted radius ratio for the FOV model, Taylor-safe.

    factor(r) = atan(2 r tan(w/2)) / (r w);  lim_{r->0} = 2 tan(w/2)/w.
    """
    w = _p(params, 4)
    tan_half = jnp.tan(0.5 * w)
    small_r = r_u < _SMALL
    r_safe = jnp.where(small_r, jnp.ones_like(r_u), r_u)
    # guard w ~ 0 (no distortion)
    small_w = jnp.abs(w) < _SMALL
    w_safe = jnp.where(small_w, jnp.ones_like(w), w)
    mul = 2.0 * tan_half
    lin = jnp.arctan(r_safe * mul) / (r_safe * w_safe)
    lim = mul / w_safe
    factor = jnp.where(small_r, lim, lin)
    return jnp.where(small_w, jnp.ones_like(factor), factor)


def _p(params, i):
    """params[..., i], tolerating vectors shorter than MAX_PARAMS (callers
    may pass unpadded per-model parameter vectors)."""
    if params.shape[-1] > i:
        return params[..., i]
    return jnp.zeros_like(params[..., 0])


def _poly3_factor(params, r_u):
    """r_d / r_u for the radial polynomial model."""
    k1, k2, k3 = _p(params, 4), _p(params, 5), _p(params, 6)
    r2 = r_u * r_u
    return 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))


def _equi_factor(r_u):
    """r_d / r_u = atan(r)/r for the equidistant fisheye, Taylor-safe."""
    small = r_u < _SMALL
    r_safe = jnp.where(small, jnp.ones_like(r_u), r_u)
    f = jnp.arctan(r_safe) / r_safe
    return jnp.where(small, jnp.ones_like(f), f)


def project(params, model, ray):
    """Pixel coordinates of a 3D ray in the sensor frame (z forward).

    Args:
      params: (..., MAX_PARAMS) intrinsics.
      model:  scalar int (static or traced) — MODEL_*.
      ray:    (..., 3) point or direction in sensor frame.

    Returns (..., 2) pixels.
    """
    z = ray[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _SMALL, jnp.sign(z) * _SMALL + (z == 0) * _SMALL, z)
    xn = ray[..., 0] / z_safe
    yn = ray[..., 1] / z_safe
    r_u = jnp.sqrt(xn * xn + yn * yn)
    factor = jnp.where(
        model == MODEL_FOV, _fov_factor(params, r_u),
        jnp.where(model == MODEL_POLY3, _poly3_factor(params, r_u),
                  jnp.where(model == MODEL_EQUIDISTANT, _equi_factor(r_u),
                            1.0)))
    fx, fy = params[..., 0], params[..., 1]
    cx, cy = params[..., 2], params[..., 3]
    return jnp.stack(
        [fx * factor * xn + cx, fy * factor * yn + cy], axis=-1
    )


def _poly3_inv_factor(params, r_d):
    """r_u / r_d by a fixed-iteration Newton solve of
    r_u (1 + k1 r_u^2 + ...) = r_d (Calibu Poly3 unprojection)."""
    small = r_d < _SMALL
    rd = jnp.where(small, jnp.ones_like(r_d), r_d)
    k1, k2, k3 = _p(params, 4), _p(params, 5), _p(params, 6)
    ru = rd
    for _ in range(8):
        r2 = ru * ru
        f = ru * (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))) - rd
        df = 1.0 + r2 * (3.0 * k1 + r2 * (5.0 * k2 + r2 * 7.0 * k3))
        ru = ru - f / jnp.where(jnp.abs(df) < _SMALL, 1.0, df)
    inv = ru / rd
    return jnp.where(small, jnp.ones_like(inv), inv)


def unproject(params, model, pix):
    """Unit-norm ray in the sensor frame for pixel(s) `pix` (..., 2)."""
    fx, fy = params[..., 0], params[..., 1]
    cx, cy = params[..., 2], params[..., 3]
    xd = (pix[..., 0] - cx) / fx
    yd = (pix[..., 1] - cy) / fy
    r_d = jnp.sqrt(xd * xd + yd * yd)
    w = _p(params, 4)
    tan_half = jnp.tan(0.5 * w)
    small = (r_d < _SMALL) | (jnp.abs(w) < _SMALL)
    r_safe = jnp.where(small, jnp.ones_like(r_d), r_d)
    # inverse FOV distortion: r_u = tan(r_d w) / (2 tan(w/2))
    inv_fov = jnp.tan(r_safe * w) / (2.0 * tan_half * r_safe)
    inv_fov = jnp.where(small, jnp.ones_like(inv_fov), inv_fov)
    # inverse equidistant: r_u = tan(r_d)  (own r-guard — the FOV guard
    # above also triggers on w == 0, which is always true for this model)
    small_e = r_d < _SMALL
    r_safe_e = jnp.where(small_e, jnp.ones_like(r_d), r_d)
    inv_equi = jnp.tan(r_safe_e) / r_safe_e
    inv_equi = jnp.where(small_e, jnp.ones_like(inv_equi), inv_equi)
    factor = jnp.where(
        model == MODEL_FOV, inv_fov,
        jnp.where(model == MODEL_POLY3, _poly3_inv_factor(params, r_d),
                  jnp.where(model == MODEL_EQUIDISTANT, inv_equi,
                            jnp.ones_like(inv_fov))))
    ray = jnp.stack([xd * factor, yd * factor, jnp.ones_like(xd)], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
