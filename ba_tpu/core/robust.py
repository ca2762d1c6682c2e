"""Huber robust weighting with median-based scale (reference cpp:1353-1388).

sigma = sqrt(lower-median of squared errors) computed with `nth_element`
semantics in the reference — here a full sort on a masked array (cheap at
these sizes on TPU, and deterministic).  c = 1.2107 * sigma (Zhang's
constant); residuals with error e > c get weight c/e.  Conditioning edges get
their own sigma (reference cpp:1360-1381).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HUBER_C = 1.2107  # Zhang's constant, reference cpp:1368-1371


def masked_median(x, valid, axis_name=None):
    """Lower median (nth_element at (n-1)//2) over entries where valid.

    With `axis_name` (inside shard_map over sharded residual rows), the
    median is computed over the *global* population — the shards all-gather
    the (small) error vector so robust weights are independent of the
    device count and bit-identical to the single-device path.
    """
    if axis_name is not None:
        x = jax.lax.all_gather(x, axis_name).reshape(-1)
        valid = jax.lax.all_gather(valid, axis_name).reshape(-1)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(valid, x, big))
    n = jnp.sum(valid)
    idx = jnp.maximum(n - 1, 0) // 2
    med = xs[idx]
    return jnp.where(n > 0, med, jnp.zeros_like(med))


def huber_weights(err_sq, valid, cond, outlier_threshold=1.0,
                  axis_name=None):
    """Per-residual robust weights, split normal vs conditioning populations.

    Args:
      err_sq: (N,) squared (whitened) errors.
      valid:  (N,) bool.
      cond:   (N,) bool — conditioning edges use their own sigma.
      outlier_threshold: scale multiplier on c (reference Options, 1.0 px).
      axis_name: mesh axis for a device-count-invariant global median.

    Returns (N,) weights in (0, 1].
    """
    def weights_for(pop):
        sigma = jnp.sqrt(masked_median(err_sq, valid & pop, axis_name))
        c = HUBER_C * sigma * outlier_threshold
        e = jnp.sqrt(jnp.maximum(err_sq, 1e-30))
        w = jnp.where(e > c, c / e, jnp.ones_like(e))
        # degenerate population (sigma == 0): no reweighting
        return jnp.where(sigma > 0, w, jnp.ones_like(w))

    w_norm = weights_for(~cond)
    w_cond = weights_for(cond)
    return jnp.where(cond, w_cond, w_norm)
