"""IMU preintegration residuals: RK4 integration + covariance, batched.

TPU-native replacement for the reference's hot loop — `ImuResidualT::
IntegrateResidual / IntegrateImu / IntegratePose / GetPoseDerivative`
(/root/reference/include/ba/Types.h:324-738) and the TBB inertial evaluator
(`ParallelInertialResiduals`, parallel_algos.h:178-358).

Design:
  * Each residual owns a *padded* span of measurements (M steps, masked);
    integration is a `lax.scan` over steps, vmapped over residuals.
  * RK4 with measurement lerp at the midpoint, matching the reference's
    k1..k4 alpha-blend scheme (Types.h:383-388, 419-643).
  * ONE scan accumulates everything the residual needs — the state, the
    state-transition Jacobian Phi = dy/dy0, the bias sensitivity
    Bsum = dy/db, and the Euler-mode covariance (the reference's
    `dy_dy0` / `dy_db` / `c_prior` chain, Types.h:486-608) — with the
    per-step A/B from `jacfwd` of a *single* RK4 step.  The pose/bias
    Jacobians of the residual are then closed-form chains through Phi/Bsum,
    which costs one 16-tangent jacfwd per step instead of differentiating
    the whole scan with 2*pose_dim tangents.

Deviations (documented per SURVEY.md §7):
  * per-step process noise uses the proper first-order discretization
    Qd = B R B^T / dt (B already carries one factor of dt) instead of the
    reference's rate-dependent B R B^T;
  * the integrated quaternion is renormalized each step instead of the
    reference's keep-unnormalized memcpy trick (Types.h:336-339) — that
    trick only exists to make *hand-written* Jacobians match finite
    differences; autodiff is exact for the normalized dynamics.

Residual (behavioral contract §7.5), res_dim = 9 (PoseSize 9) or 15:
  r = [ log_decoupled(y_hat.t_wp, T_w2);  y_hat.v - v2;  b1 - b2 ]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from ...utils.linalg import whiten_factor


class ImuEval(NamedTuple):
    r: jax.Array        # (Ni, R) whitened residuals
    j1: jax.Array       # (Ni, R, D) whitened, wrt pose1 tangent
    j2: jax.Array       # (Ni, R, D) whitened, wrt pose2 tangent
    err_sq: jax.Array   # (Ni,) squared mahalanobis error
    y_t: jax.Array      # (Ni, 3) integrated position (diagnostics)
    y_v: jax.Array      # (Ni, 3) integrated velocity
    c9: jax.Array       # (Ni, 9, 9) integrated residual covariance (the
                        # quantity `calculate_inertial_covariance_once`
                        # caches, reference parallel_algos.h:190-205)


def _quat_deriv(q, w_body):
    """q_dot = 0.5 * q x [0, w]."""
    wq = jnp.concatenate([jnp.zeros_like(w_body[..., :1]), w_body], axis=-1)
    return 0.5 * lie.quat_mul(q, wq)


def _state_deriv(y, w_meas, a_meas, bg, ba, g):
    """y = (t, q, v); biases correct the measurements additively
    (reference GetPoseDerivative, Types.h:376-416)."""
    t, q, v = y
    w_body = w_meas + bg
    a_body = a_meas + ba
    return (v, _quat_deriv(q, w_body), lie.quat_rotate(q, a_body) + g)


def _rk4_step(y, m0, m1, dt, bg, ba, g):
    """One RK4 step across [t_i, t_i+1] with measurement lerp at midpoint
    (reference IntegrateImu k1..k4, Types.h:419-643)."""
    w0, a0 = m0
    w1, a1 = m1
    wh, ah = 0.5 * (w0 + w1), 0.5 * (a0 + a1)

    def add(y, k, s):
        return (y[0] + s * k[0], y[1] + s * k[1], y[2] + s * k[2])

    k1 = _state_deriv(y, w0, a0, bg, ba, g)
    k2 = _state_deriv(add(y, k1, 0.5 * dt), wh, ah, bg, ba, g)
    k3 = _state_deriv(add(y, k2, 0.5 * dt), wh, ah, bg, ba, g)
    k4 = _state_deriv(add(y, k3, dt), w1, a1, bg, ba, g)
    t = y[0] + dt / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
    q = y[1] + dt / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
    v = y[2] + dt / 6.0 * (k1[2] + 2 * k2[2] + 2 * k3[2] + k4[2])
    return (t, lie.quat_normalize(q), v)


def _flat(y):
    return jnp.concatenate(y)


def _unflat(y10):
    return (y10[0:3], y10[3:7], y10[7:10])


def integrate_span(q1, t1, v1, b, w, a, times, g):
    """Integrate one padded measurement span; returns final (t, q, v).

    Padded steps have dt == 0 (builder repeats the last timestamp) and are
    where'd through unchanged.
    """
    bg, ba = b[:3], b[3:]
    y0 = (t1, q1, v1)

    def step(y, inp):
        m0w, m0a, m1w, m1a, dt = inp
        y_new = _rk4_step(y, (m0w, m0a), (m1w, m1a), dt, bg, ba, g)
        y = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(dt > 0, a_, b_), y_new, y)
        return y, None

    inps = (w[:-1], a[:-1], w[1:], a[1:], times[1:] - times[:-1])
    y, _ = jax.lax.scan(step, y0, inps)
    return y


def integrate_full(q1, t1, v1, b, w, a, times, g, r_imu):
    """(y, C10, Phi = dy/dy0, Bsum = dy/db) over one measurement span.

    The reference accumulates these with a hand pushforward inside the
    sequential RK4 loop (IntegrateImu dy_dy0/dy_db, Types.h:486-608).  The
    TPU formulation breaks the latency chain instead:

      1. one *cheap* sequential scan for the state trajectory only;
      2. per-step A = d(step)/d(state), B = d(step)/d(bias) by `jacfwd`
         of the single RK4 step, **vmapped over all steps at once** (each
         A_k depends only on the pre-step state y_k, not on any Jacobian);
      3. the products Phi = A_M...A_1, Bsum = sum A.. B_k and the Euler
         covariance recursion C <- A C A^T + Q are *associative* affine
         compositions -> one `lax.associative_scan` of 10x10 blocks
         (log-depth instead of M sequential matmuls).

    Padded steps (dt == 0) contribute exact identity elements.
    """
    bg, ba = b[:3], b[3:]
    y0 = _flat((t1, q1, v1))
    dtype = y0.dtype

    # pass 1: state trajectory (pre-step states y_k)
    def step(y10, inp):
        m0w, m0a, m1w, m1a, dt = inp
        yn = _flat(_rk4_step(_unflat(y10), (m0w, m0a), (m1w, m1a), dt,
                             bg, ba, g))
        return jnp.where(dt > 0, yn, y10), y10

    inps = (w[:-1], a[:-1], w[1:], a[1:], times[1:] - times[:-1])
    y_final, y_pre = jax.lax.scan(step, y0, inps)

    # pass 2: per-step A/B/Q, batched (no sequential dependency)
    def stepAB(y10, m0w, m0a, m1w, m1a, dt):
        def f(z):
            yn = _flat(_rk4_step(_unflat(z[:10]), (m0w, m0a), (m1w, m1a),
                                 dt, z[10:13] + bg, z[13:16] + ba, g))
            return yn, yn

        J, _ = jax.jacfwd(f, has_aux=True)(
            jnp.concatenate([y10, jnp.zeros(6, dtype)]))
        A, B = J[:, :10], J[:, 10:]
        dt_safe = jnp.maximum(dt, 1e-12)
        Q = (B * r_imu[None, :] / dt_safe) @ B.T
        on = dt > 0
        A = jnp.where(on, A, jnp.eye(10, dtype=dtype))
        B = jnp.where(on, B, 0.0)
        Q = jnp.where(on, Q, 0.0)
        return A, B, Q

    A_k, B_k, Q_k = jax.vmap(stepAB)(y_pre, *inps)

    # pass 3: associative composition (later after earlier).  Only the
    # FINAL products are needed (Phi over the whole span, total Bsum,
    # total covariance), so this is a pairwise tree REDUCE, not a scan —
    # half the matmuls of `associative_scan` and none of its prefix
    # padding/concat plumbing (profiled 2026-08-19: the scan's pad ops
    # alone were ~2 ms/iteration at fleet size 8).
    def combine(x, y):
        A1, B1, Q1 = x
        A2, B2, Q2 = y
        return (A2 @ A1, A2 @ B1 + B2, A2 @ Q1 @ jnp.swapaxes(A2, -1, -2)
                + Q2)

    M_steps = A_k.shape[0]
    ident = (jnp.eye(10, dtype=dtype), jnp.zeros((10, 6), dtype),
             jnp.zeros((10, 10), dtype))
    elems = (A_k, B_k, Q_k)
    while M_steps > 1:
        if M_steps % 2:
            pad1 = jax.tree_util.tree_map(
                lambda e, i: jnp.concatenate([e, i[None]], axis=0),
                elems, ident)
            elems = pad1
            M_steps += 1
        # reshape-based pairing, NOT strided slices e[0::2]/e[1::2]: the
        # strided form hard-crashes the TPU compiler under a second vmap
        # level ("Slice dim size ... greater than dynamic slice
        # dimension", observed 2026-08-19 at fleet vmap B>=2)
        pairs = jax.tree_util.tree_map(
            lambda e: e.reshape((M_steps // 2, 2) + e.shape[1:]), elems)
        even = jax.tree_util.tree_map(lambda e: e[:, 0], pairs)
        odd = jax.tree_util.tree_map(lambda e: e[:, 1], pairs)
        elems = combine(even, odd)
        M_steps //= 2
    Phi, Bsum, C = jax.tree_util.tree_map(lambda e: e[0], elems)
    return y_final, C, Phi, Bsum


# kept for tests / covariance-only callers
def integrate_cov(q1, t1, v1, b, w, a, times, g, r_imu):
    y10, C, _, _ = integrate_full(q1, t1, v1, b, w, a, times, g, r_imu)
    return y10, C


def _dy0_dtangent(q1, dtype):
    """J_y0 (10, 9): d(t1, q1_coords, v1) / d[dt(3), dw(3), dv(3)].

    Rotation block: q1 -> q1*exp(dw) gives dq_coords/dw_c =
    0.5 * q1 x [0, e_c] (quaternion product in coordinates).
    """
    J = jnp.zeros((10, 9), dtype)
    J = J.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    J = J.at[7:10, 6:9].set(jnp.eye(3, dtype=dtype))
    w, x, y, z = q1[0], q1[1], q1[2], q1[3]
    # 0.5 * q1 x [0, e_c] for c = 0,1,2 (wxyz rows)
    qcols = 0.5 * jnp.array([[-x, -y, -z],
                             [w, -z, y],
                             [z, w, -x],
                             [-y, x, w]], dtype=dtype)
    return J.at[3:7, 3:6].set(qcols)


def evaluate(problem, config, with_jacobians: bool = True,
             c9=None) -> ImuEval:
    """Residuals + Jacobians + information weighting for every IMU span.

    `c9` optionally supplies the (Ni, 9, 9) residual covariance from a
    previous build so cost-only evaluation (dogleg trial costs) skips the
    covariance propagation entirely — the reference evaluates trial costs
    without Jacobians and keeps the build's covariance (cpp:236-238,
    `calculate_inertial_covariance_once` parallel_algos.h:190-205).
    """
    im = problem.imu
    poses = problem.poses
    dtype = poses.t.dtype
    D = config.pose_dim
    res_dim = 15 if config.bias_in_state else 9
    g = problem.g_vec

    q1, t1 = poses.q[im.pose1], poses.t[im.pose1]
    v1, b1 = poses.v[im.pose1], poses.b[im.pose1]
    q2, t2 = poses.q[im.pose2], poses.t[im.pose2]
    v2, b2 = poses.v[im.pose2], poses.b[im.pose2]

    r_imu = jnp.concatenate([
        jnp.full((3,), config.gyro_sigma**2, dtype),
        jnp.full((3,), config.accel_sigma**2, dtype)])

    if not with_jacobians:
        def residual_only(q1, t1, v1, b1, q2, t2, v2, b2, w, a, times):
            yt, yq, yv = integrate_span(q1, t1, v1, b1, w, a, times, g)
            r_pose = lie.se3_log_decoupled((yq, yt), (q2, t2))
            parts = [r_pose, yv - v2]
            if config.bias_in_state:
                parts.append(b1 - b2)
            return jnp.concatenate(parts), yt, yv

        r, yts, yvs = jax.vmap(residual_only)(
            q1, t1, v1, b1, q2, t2, v2, b2, im.w, im.a, im.time)
        if c9 is None:
            c9 = _c9(problem, config, r_imu, q1, t1, v1, b1, q2, t2, im)
        S = _whiten_from_c9(problem, config, c9, im, dtype)
        return _whiten_pack(problem, config, r, None, None, S,
                            with_jacobians=False, y_t=yts, y_v=yvs, c9=c9)

    def one(q1, t1, v1, b1, q2, t2, v2, b2, w, a, times):
        y10, C10, Phi, Bsum = integrate_full(q1, t1, v1, b1, w, a, times,
                                             g, r_imu)

        def res_map(y10, d2):
            yt, yq, yv = _unflat(y10)
            Q2, T2 = lie.se3_retract((q2, t2), d2[:6])
            V2 = v2 + d2[6:9]
            rp = lie.se3_log_decoupled((lie.quat_normalize(yq), yt),
                                       (Q2, T2))
            return jnp.concatenate([rp, yv - V2])

        d2z = jnp.zeros(9, dtype)
        r9 = res_map(y10, d2z)
        Jy = jax.jacfwd(res_map, argnums=0)(y10, d2z)     # (9, 10)
        J2s = jax.jacfwd(res_map, argnums=1)(y10, d2z)    # (9, 9)
        J1s = Jy @ (Phi @ _dy0_dtangent(q1, dtype))       # (9, 9)
        J1b = Jy @ Bsum                                   # (9, 6)
        C9 = Jy @ C10 @ Jy.T
        return r9, J1s, J1b, J2s, C9

    r9, J1s, J1b, J2s, C9 = jax.vmap(one)(
        q1, t1, v1, b1, q2, t2, v2, b2, im.w, im.a, im.time)
    if config.calculate_inertial_covariance_once:
        # reuse the covariance cached in the problem pytree once set
        # (reference parallel_algos.h:190-205)
        C9 = jnp.where(problem.imu.c9_set, problem.imu.c9, C9)

    Ni = im.pose1.shape[0]
    if config.bias_in_state:
        r = jnp.concatenate([r9, b1 - b2], axis=-1)
        eye6 = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (Ni, 6, 6))
        z96 = jnp.zeros((Ni, 9, 6), dtype) if D < 15 else None
        j1 = jnp.concatenate([
            jnp.concatenate([J1s, J1b], axis=-1),
            jnp.concatenate([jnp.zeros((Ni, 6, 9), dtype), eye6], axis=-1),
        ], axis=1)
        j2 = jnp.concatenate([
            jnp.concatenate([J2s, jnp.zeros((Ni, 9, 6), dtype)], axis=-1),
            jnp.concatenate([jnp.zeros((Ni, 6, 9), dtype), -eye6], axis=-1),
        ], axis=1)
    else:
        r = r9
        j1 = J1s[:, :, :D]
        j2 = J2s[:, :, :D]

    S = _whiten_from_c9(problem, config, C9, im, dtype)
    return _whiten_pack(problem, config, r, j1, j2, S,
                        with_jacobians=True, y_t=t1, y_v=v1, c9=C9)


def _c9(problem, config, r_imu, q1, t1, v1, b1, q2, t2, im):
    """Integrated residual covariance when no cache is supplied."""
    g = problem.g_vec

    def cov_one(q1, t1, v1, b1, q2, t2, w, a, times):
        y10, C10 = integrate_cov(q1, t1, v1, b1, w, a, times, g, r_imu)

        def res_of_y(y10):
            yt, yq, yv = _unflat(y10)
            rp = lie.se3_log_decoupled((lie.quat_normalize(yq), yt),
                                       (q2, t2))
            return jnp.concatenate([rp, yv])

        Jy = jax.jacfwd(res_of_y)(y10)
        return Jy @ C10 @ Jy.T

    return jax.vmap(cov_one)(q1, t1, v1, b1, q2, t2, im.w, im.a, im.time)


def _whiten_from_c9(problem, config, C9, im, dtype):
    """Whitening factor S (S^T S = weight * cov_inv) from the integrated
    covariance, TPU-native: S9 = chol(C9)^-1 by closed-form blocked 3x3
    Cholesky + triangular inverse (utils.linalg.whiten_factor) — no
    batched LAPACK `inv`/`eigh`, which XLA TPU serializes.  Any square
    root whitens (the assembled system only sees quadratic forms); the
    reference's symmetric `cov_inv.sqrt()` is a different but equivalent
    choice.  The bias block is diagonal (`r_b * dt_total`, reference
    parallel_algos.h:278-307), so its factor is elementwise."""
    C9 = jax.lax.stop_gradient(C9)
    Ni = C9.shape[0]
    eps9 = 1e-12 if dtype == jnp.float64 else 1e-8
    C9 = C9 + eps9 * jnp.eye(9, dtype=dtype)
    if config.imu_rotation_only:
        # rotation-only switched mode: whiten rows 3:6 by the ROTATION
        # MARGINAL factor chol(C9[3:6, 3:6])^-1 and zero every other row.
        # A full triangular factor would mix raw translation/velocity
        # residual rows into the kept rotation rows, re-introducing the
        # very DOF the switch removes (and their near-null directions);
        # the marginal keeps exactly the gyro information.
        C_rot = C9[:, 3:6, 3:6]
        S3 = whiten_factor(C_rot, from_cov=True)
        S9 = jnp.zeros((Ni, 9, 9), dtype).at[:, 3:6, 3:6].set(S3)
    else:
        S9 = whiten_factor(C9, from_cov=True)
    if config.bias_in_state:
        dt_total = jnp.max(im.time, axis=-1) - im.time[:, 0]
        r_b = jnp.concatenate([
            jnp.full((3,), config.gyro_bias_sigma**2, dtype),
            jnp.full((3,), config.accel_bias_sigma**2, dtype)])
        cb = r_b[None, :] * jnp.maximum(dt_total, 1e-12)[:, None]
        S = jnp.zeros((Ni, 15, 15), dtype)
        S = S.at[:, :9, :9].set(S9)
        S = S.at[:, 9:, 9:].set(jax.vmap(jnp.diag)(1.0 / jnp.sqrt(cb)))
    else:
        S = S9
    # persistent robust weight state (reference rescales cov_inv in place,
    # §7.4: cov_inv *= w -> factor *= sqrt(w)); conditioning edges exempt
    # (cpp:1514-1521)
    wgt = jnp.where(im.cond, 1.0, im.weight)
    return S * jnp.sqrt(wgt)[:, None, None]


def _whiten_pack(problem, config, r, j1, j2, S, with_jacobians,
                 y_t, y_v, c9):
    im = problem.imu
    dtype = r.dtype
    D = config.pose_dim
    res_dim = r.shape[-1]
    Ni = r.shape[0]
    valid = im.valid
    rw = jnp.einsum("nij,nj->ni", S, r)
    rw = jnp.where(valid[:, None], rw, 0.0)
    if config.imu_rotation_only:
        # switched rotation-only mode (reference SwitchedFullImuCostFunction,
        # CeresCostFunctions.h:335-338): zero the whitened translation and
        # velocity (and bias) rows, keeping rows 3:6 (rotation)
        keep = (jnp.arange(res_dim) >= 3) & (jnp.arange(res_dim) < 6)
        rw = rw * keep.astype(dtype)[None, :]
    err_sq = jnp.sum(rw * rw, axis=-1)  # == r^T (w * cov_inv) r
    if not with_jacobians:
        zj = jnp.zeros((Ni, res_dim, D), dtype)
        return ImuEval(rw, zj, zj, err_sq, y_t, y_v, c9)
    j1 = jnp.where(valid[:, None, None], j1, 0.0)
    j2 = jnp.where(valid[:, None, None], j2, 0.0)
    j1w = jnp.einsum("nij,njk->nik", S, j1)
    j2w = jnp.einsum("nij,njk->nik", S, j2)
    if config.imu_rotation_only:
        keep_c = keep.astype(dtype)[None, :, None]
        j1w = j1w * keep_c
        j2w = j2w * keep_c
    return ImuEval(rw, j1w, j2w, err_sq, y_t, y_v, c9)
