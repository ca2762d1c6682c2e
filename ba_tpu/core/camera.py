"""Batched camera models: linear (pinhole) and FOV distortion.

TPU-native replacement for the Calibu camera surface the reference depends on
(`CameraInterface::Transfer3d`, `dTransfer3d_dray`, `dTransfer_dparams` — see
SURVEY.md L0 row).  Models are pure functions of (params, point); Jacobians
come from `jax.jacfwd` at the call site, so adding a model only requires
`project`/`unproject`.

Parameter layouts (leading entries of a fixed-width `params` vector, so a rig
with mixed models still batches to a static shape):
  linear: [fx, fy, cx, cy]
  fov:    [fx, fy, cx, cy, w]   (FOV distortion of Devernay & Faugeras —
          the model used by the reference's synthetic generator,
          /root/reference/matlab/simulate_vins.py:56-93)

Projection is scale-invariant in the homogeneous 4-vector sense: `project`
takes a 3-vector ray (the head of T_sw * [xyz, rho]) and needs no depth
division beyond x/z, y/z, so inverse-depth (rho=0 included) transfers work
unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

MODEL_LINEAR = 0
MODEL_FOV = 1

# widest parameter vector across models (fov: 5)
MAX_PARAMS = 5
_SMALL = 1e-9


def _fov_factor(params, r_u):
    """Distorted/undistorted radius ratio for the FOV model, Taylor-safe.

    factor(r) = atan(2 r tan(w/2)) / (r w);  lim_{r->0} = 2 tan(w/2)/w.
    """
    w = params[..., 4]
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


def project(params, model, ray):
    """Pixel coordinates of a 3D ray in the sensor frame (z forward).

    Args:
      params: (..., MAX_PARAMS) intrinsics.
      model:  scalar int (static or traced) — MODEL_LINEAR / MODEL_FOV.
      ray:    (..., 3) point or direction in sensor frame.

    Returns (..., 2) pixels.
    """
    z = ray[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _SMALL, jnp.sign(z) * _SMALL + (z == 0) * _SMALL, z)
    xn = ray[..., 0] / z_safe
    yn = ray[..., 1] / z_safe
    r_u = jnp.sqrt(xn * xn + yn * yn)
    factor = jnp.where(model == MODEL_FOV, _fov_factor(params, r_u), 1.0)
    fx, fy = params[..., 0], params[..., 1]
    cx, cy = params[..., 2], params[..., 3]
    return jnp.stack(
        [fx * factor * xn + cx, fy * factor * yn + cy], axis=-1
    )


def unproject(params, model, pix):
    """Unit-norm ray in the sensor frame for pixel(s) `pix` (..., 2)."""
    fx, fy = params[..., 0], params[..., 1]
    cx, cy = params[..., 2], params[..., 3]
    xd = (pix[..., 0] - cx) / fx
    yd = (pix[..., 1] - cy) / fy
    r_d = jnp.sqrt(xd * xd + yd * yd)
    w = params[..., 4]
    tan_half = jnp.tan(0.5 * w)
    small = (r_d < _SMALL) | (jnp.abs(w) < _SMALL)
    r_safe = jnp.where(small, jnp.ones_like(r_d), r_d)
    # inverse FOV distortion: r_u = tan(r_d w) / (2 tan(w/2))
    inv = jnp.tan(r_safe * w) / (2.0 * tan_half * r_safe)
    inv = jnp.where(small, jnp.ones_like(inv), inv)
    factor = jnp.where(model == MODEL_FOV, inv, jnp.ones_like(inv))
    ray = jnp.stack([xd * factor, yd * factor, jnp.ones_like(xd)], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
