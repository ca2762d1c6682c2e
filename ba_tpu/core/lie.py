"""Batched SO(3)/SE(3) math on quaternions, autodiff-safe everywhere.

TPU-native replacement for the reference's closed-form Lie/quaternion
derivative kernels (`/root/reference/include/ba/Utils.h:112-825`).  Instead of
hand-derived Jacobians of every composition, this module provides the *maps*
(exp/log/compose/act) written so that `jax.jacfwd` through them is exact and
cheap: every near-identity singularity has a Taylor branch guarded with the
double-`where` idiom so both the primal and its derivatives are NaN-free.

Conventions (match the reference's behavioral contract, SURVEY.md §7.1):
  * quaternions are `[w, x, y, z]`, batched over leading axes;
  * SE(3) is the *decoupled* product manifold R^3 x SO(3):
      - ``se3_log_decoupled(a, b) = [a.t - b.t, so3_log(a.R @ b.R^T)]``
        (reference ``log_decoupled``, Utils.h:354-361);
      - retraction ``se3_retract((q,t), [dt,dw]) = (q*exp(dw), t+dt)``
        (reference ``exp_decoupled``, Utils.h:364-369);
  * tangent layout is ``[translation(3), rotation(3)]``.

All functions preserve the input dtype (float32 on TPU, float64 in the
verification suite on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Threshold below which Taylor branches take over.  Generous enough that both
# branches are accurate to full precision at the switch point in f32 and f64.
_SMALL = 1e-6


def _safe(x, small=_SMALL):
    """Replace near-zero values by 1 so the unused `where` branch stays finite."""
    return jnp.where(jnp.abs(x) < small, jnp.ones_like(x), x)


# ---------------------------------------------------------------------------
# Quaternions ([w, x, y, z])
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(a, b):
    """Hamilton product a*b, batched."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q: R(q) @ v.

    Uses the expanded form 2*(q_v x (q_v x v + w v)) + v which is cheap on the
    VPU and exact for unit quaternions.
    """
    w = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """Rotation matrix from unit quaternion, shape (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix_to_quat(m):
    """Unit quaternion [w,x,y,z] from rotation matrix, batched, branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned one
    (largest pivot) with `where`, so it vmaps and differentiates cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # candidate 0: trace pivot
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-30)) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: m00 pivot
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: m11 pivot
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-30)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: m22 pivot
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-30)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------


def so3_exp(w):
    """exp: R^3 tangent -> unit quaternion, with Taylor branch near 0.

    The guard is on ``theta_sq`` *before* the sqrt so that reverse/forward-mode
    derivatives of the unused branch stay finite (sqrt'(0) = inf otherwise).
    """
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta_sq < _SMALL**2
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    half = 0.5 * theta
    # sin(theta/2)/theta  ->  1/2 - theta^2/48 + ...
    sinc_half = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    # cos(theta/2)        ->  1 - theta^2/8 + ...
    cos_half = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cos_half, sinc_half * w], axis=-1)


def so3_log(q):
    """log: unit quaternion -> R^3 tangent, minimal (|w| branch picks the
    short geodesic), Taylor branch near identity.  Matches the reference's
    `log_decoupled` rotation part semantics (Utils.h:137-185, 354-361)."""
    # force w >= 0 so the angle is in [0, pi]
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    w = q[..., 0:1]
    v = q[..., 1:4]
    n_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = n_sq < _SMALL**2
    n = jnp.sqrt(jnp.where(small, jnp.ones_like(n_sq), n_sq))
    # angle = 2*atan2(n, w); scale = angle/n, Taylor: 2/w * (1 - n^2/(3 w^2))
    w_safe = _safe(w, 1e-12)
    scale = jnp.where(
        small,
        2.0 / w_safe - 2.0 * n_sq / (3.0 * w_safe**3),
        2.0 * jnp.arctan2(n, w) / n,
    )
    return scale * v


def so3_retract(q, dw):
    """Right retraction: q * exp(dw) (reference rotation update, Utils.h:367)."""
    return quat_mul(q, so3_exp(dw))


# ---------------------------------------------------------------------------
# Decoupled SE(3): tuples (q, t) — q: (...,4) wxyz, t: (...,3)
# ---------------------------------------------------------------------------


def se3_identity(dtype=jnp.float32):
    return quat_identity(dtype), jnp.zeros(3, dtype=dtype)


def se3_compose(a, b):
    """T_a * T_b (standard SE3 group product)."""
    qa, ta = a
    qb, tb = b
    return quat_mul(qa, qb), ta + quat_rotate(qa, tb)


def se3_inverse(a):
    q, t = a
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def se3_transform_point(a, p):
    q, t = a
    return quat_rotate(q, p) + t


def se3_transform_homog(a, ph):
    """Apply SE3 to a homogeneous 4-vector [xyz, rho]: [R xyz + t rho, rho].

    This is the reference's `MultHomogeneous` (Utils.h) — the inverse-depth
    landmark transfer: scale-free direction plus translation weighted by the
    inverse depth rho.
    """
    q, t = a
    xyz = quat_rotate(q, ph[..., :3]) + t * ph[..., 3:4]
    return jnp.concatenate([xyz, ph[..., 3:4]], axis=-1)


def se3_log_decoupled(a, b):
    """[a.t - b.t, so3_log(q_a * q_b^-1)] — reference log_decoupled(a, b)."""
    qa, ta = a
    qb, tb = b
    return jnp.concatenate([ta - tb, so3_log(quat_mul(qa, quat_conj(qb)))],
                           axis=-1)


def se3_retract(a, x):
    """exp_decoupled(a, x): (q*exp(x[3:6]), t + x[0:3]).

    The solver applies updates as ``se3_retract(pose, -delta)`` — the minus
    lives at the call site (reference ApplyUpdate, BundleAdjuster.cpp:90-94).
    """
    q, t = a
    return so3_retract(q, x[..., 3:6]), t + x[..., 0:3]


# ---------------------------------------------------------------------------
# Gravity parameterization (reference GetGravityVector, Types.h)
# ---------------------------------------------------------------------------

GRAVITY = 9.8007  # reference default magnitude, Types.h:39


def gravity_vector(g2, magnitude=GRAVITY):
    """3-vector from 2-dof direction angles [theta, phi] (reference
    GetGravityVector): g = mag * [-sin(theta), cos(theta) sin(phi),
    -cos(theta) cos(phi)] convention — spherical angles chosen so that
    (0, 0) gives (0, 0, -mag)."""
    th, ph = g2[..., 0], g2[..., 1]
    return magnitude * jnp.stack(
        [-jnp.sin(th), jnp.cos(th) * jnp.sin(ph), -jnp.cos(th) * jnp.cos(ph)],
        axis=-1,
    )
