"""Analytic reprojection residual + Jacobians, lane-vectorized form.

The closed-form chain rule of the reference's projection evaluator
(`ParallelProjectionResiduals::operator()`, parallel_algos.h:59-133, built on
the derivative kernels of Utils.h) — re-derived for this engine's
conventions and written as *elementwise scalar expressions over a lane
vector of residuals*, so the same function body runs inside a Pallas TPU
kernel (features on sublanes, residuals on lanes) and in plain jnp for
verification against the autodiff path.

Conventions (must match core/residuals/reprojection.py):
  pose tangent [dt(3), dw(3)], rotation right-multiplied q*exp(dw);
  residual r = z - project(T_sv^-1 T_wv_m^-1 T_wv_r T_vs x_s);
  landmark tangent = inverse depth rho = x_s[3].

Scope: lm_size == 1, no self-calibration (the autodiff path covers those).
"""

from __future__ import annotations

import jax.numpy as jnp

# feature-major input layout (rows of the (N_FEAT, TILE) block)
#  0: 1  z (2)
#  2: 5  q_m (4, wxyz)
#  6: 8  t_m (3)
#  9:12  q_r (4)
# 13:15  t_r (3)
# 16:19  x_s (4: ray xyz + rho)
# 20:24  cam params of the measuring camera (fx fy cx cy w)
# 25    k = 2*tan(w/2)  (precomputed — Mosaic has no tan lowering)
# 26    model (0 linear / 1 fov)
# 27    valid (0/1)
# 28:31  tvs_q of the measuring camera (4)
# 32:34  tvs_t of the measuring camera (3)
# 35:38  tvs_q of the landmark's reference camera (4)
# 39:41  tvs_t of the landmark's reference camera (3)
# 42    same-pose flag (meas pose == ref pose: pose Jacobians exactly zero,
#       parallel_algos.h — relied on for stereo same-pose rows)
N_FEAT = 43

# output layout (rows of the (N_OUT, TILE) block)
#  0: 1  r (2)
#  2: 7  j_meas row 0 (6)
#  8:13  j_meas row 1 (6)
# 14:19  j_ref row 0 (6)
# 20:25  j_ref row 1 (6)
# 26:27  j_lm (2)
# 28    err_sq
N_OUT = 29


def _rot_apply(q, v):
    """R(q) @ v with q = (w,x,y,z) rows, v = 3 rows (lane vectors)."""
    w, x, y, z = q
    v0, v1, v2 = v
    # t = 2 * cross(q_vec, v)
    t0 = 2.0 * (y * v2 - z * v1)
    t1 = 2.0 * (z * v0 - x * v2)
    t2 = 2.0 * (x * v1 - y * v0)
    return (v0 + w * t0 + (y * t2 - z * t1),
            v1 + w * t1 + (z * t0 - x * t2),
            v2 + w * t2 + (x * t1 - y * t0))


def _rot_apply_t(q, v):
    """R(q)^T @ v  (= rotate by conjugate)."""
    w, x, y, z = q
    return _rot_apply((w, -x, -y, -z), v)


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def atan_poly(x):
    """Vectorized arctan via Abramowitz & Stegun 4.4.49 (|err| < 2e-8) —
    Mosaic TPU has no atan primitive."""
    s = jnp.sign(x)
    t = jnp.abs(x)
    big = t > 1.0
    t_safe = jnp.where(t < 1e-30, 1e-30, t)
    u = jnp.where(big, 1.0 / t_safe, t)
    z = u * u
    p = (1.0 + z * (-0.3333314528 + z * (0.1999355085 + z * (
        -0.1420889944 + z * (0.1065626393 + z * (-0.0752896400 + z * (
            0.0429096138 + z * (-0.0161657367 + z * 0.0028662257))))))))
    a = u * p
    a = jnp.where(big, 0.5 * jnp.pi - a, a)
    return s * a


def proj_forward(feat, atan_fn=jnp.arctan):
    """feat: (N_FEAT, n) array-like; returns (N_OUT, n).

    All intermediates are lane vectors; every line is VPU elementwise math.
    Pass `atan_fn=atan_poly` inside the Pallas kernel.
    """
    z0, z1 = feat[0], feat[1]
    q_m = (feat[2], feat[3], feat[4], feat[5])
    t_m = (feat[6], feat[7], feat[8])
    q_r = (feat[9], feat[10], feat[11], feat[12])
    t_r = (feat[13], feat[14], feat[15])
    x_s = (feat[16], feat[17], feat[18])
    rho = feat[19]
    fx, fy, cx, cy, wfov = feat[20], feat[21], feat[22], feat[23], feat[24]
    k = feat[25]
    model = feat[26]
    valid = feat[27]
    q_v = (feat[28], feat[29], feat[30], feat[31])    # meas-camera T_vs
    t_v = (feat[32], feat[33], feat[34])
    q_vr = (feat[35], feat[36], feat[37], feat[38])   # ref-camera T_vs
    t_vr = (feat[39], feat[40], feat[41])
    same = feat[42]

    # --- transfer chain ------------------------------------------------
    # Ref side uses the landmark's reference camera's extrinsics (q_vr,
    # t_vr — reference parallel_algos.h:47-48), the meas side the measuring
    # camera's (q_v, t_v):
    # w1 = Rvr x_s ;  x_w3 = R2 w1 + (t_r + R2 t_vr) rho
    w1 = _rot_apply(q_vr, x_s)
    r2tv = _rot_apply(q_r, t_vr)
    t_wsr = (t_r[0] + r2tv[0], t_r[1] + r2tv[1], t_r[2] + r2tv[2])
    r2w1 = _rot_apply(q_r, w1)
    x_w = (r2w1[0] + t_wsr[0] * rho,
           r2w1[1] + t_wsr[1] * rho,
           r2w1[2] + t_wsr[2] * rho)
    # u = R1^T (x_w - t_m rho) ;  p = Rv^T u - Rv^T t_v rho
    d = (x_w[0] - t_m[0] * rho, x_w[1] - t_m[1] * rho,
         x_w[2] - t_m[2] * rho)
    u = _rot_apply_t(q_m, d)
    rvtu = _rot_apply_t(q_v, u)
    rvtv = _rot_apply_t(q_v, t_v)
    p = (rvtu[0] - rvtv[0] * rho, rvtu[1] - rvtv[1] * rho,
         rvtu[2] - rvtv[2] * rho)

    # --- projection + dpix/dp ------------------------------------------
    pz_safe = jnp.where(jnp.abs(p[2]) < 1e-9, 1e-9, p[2])
    iz = 1.0 / pz_safe
    xn = p[0] * iz
    yn = p[1] * iz
    r2 = xn * xn + yn * yn
    small = r2 < 1e-18
    r_u = jnp.sqrt(jnp.where(small, 1.0, r2))
    w_safe = jnp.where(jnp.abs(wfov) < 1e-9, 1.0, wfov)
    atn = atan_fn(r_u * k)
    F_fov = jnp.where(small, k / w_safe, atn / (r_u * w_safe))
    # dF/dr = [k r / (1 + (rk)^2) - atan(rk)] / (r^2 w)
    dF_fov = jnp.where(
        small, 0.0,
        (k * r_u / (1.0 + r_u * r_u * k * k) - atn) / (r2 * w_safe))
    is_fov = model > 0.5
    F = jnp.where(is_fov, F_fov, 1.0)
    dF_over_r = jnp.where(is_fov, dF_fov / jnp.where(small, 1.0, r_u), 0.0)

    pix0 = fx * F * xn + cx
    pix1 = fy * F * yn + cy
    r_out0 = z0 - pix0
    r_out1 = z1 - pix1

    # dpix/d(xn,yn) = diag(fx,fy) (F I + dF/r * [xn,yn][xn,yn]^T)
    a00 = fx * (F + dF_over_r * xn * xn)
    a01 = fx * (dF_over_r * xn * yn)
    a10 = fy * (dF_over_r * xn * yn)
    a11 = fy * (F + dF_over_r * yn * yn)
    # d(xn,yn)/dp = 1/pz [[1,0,-xn],[0,1,-yn]]
    g00 = a00 * iz
    g01 = a01 * iz
    g02 = -(a00 * xn + a01 * yn) * iz
    g10 = a10 * iz
    g11 = a11 * iz
    g12 = -(a10 * xn + a11 * yn) * iz

    def dpix(dp):
        """apply G (2x3) to a 3-row direction; returns 2 rows with the
        residual sign (r = z - pix) folded in."""
        return (-(g00 * dp[0] + g01 * dp[1] + g02 * dp[2]),
                -(g10 * dp[0] + g11 * dp[1] + g12 * dp[2]))

    # --- pose/landmark direction vectors --------------------------------
    # meas translation: dp/dt_m[c] = -rho * Rv^T R1^T e_c
    # meas rotation:    dp/dw_m    = Rv^T [u]x  (u = R1^T(x_w - t_m rho))
    # ref translation:  dp/dt_r[c] = +rho * Rv^T R1^T e_c
    # ref rotation:     dp/dw_r    = -Rv^T R1^T R2 ([w1]x + rho [t_v]x)
    # inverse depth:    dp/drho    = Rv^T R1^T (t_wsr - t_m) - Rv^T t_v

    # columns of Rv^T R1^T: apply to basis vectors
    one = jnp.ones_like(rho)
    zero = jnp.zeros_like(rho)
    e0 = _rot_apply_t(q_v, _rot_apply_t(q_m, (one, zero, zero)))
    e1 = _rot_apply_t(q_v, _rot_apply_t(q_m, (zero, one, zero)))
    e2 = _rot_apply_t(q_v, _rot_apply_t(q_m, (zero, zero, one)))

    jm = [None] * 6
    # translation cols (scale by -rho)
    for c, ec in enumerate((e0, e1, e2)):
        jm[c] = dpix((-rho * ec[0], -rho * ec[1], -rho * ec[2]))
    # rotation cols: Rv^T ([u]x e_c) = Rv^T (u x e_c)
    ux = (_rot_apply_t(q_v, (zero, u[2], -u[1])),      # u x e0
          _rot_apply_t(q_v, (-u[2], zero, u[0])),      # u x e1
          _rot_apply_t(q_v, (u[1], -u[0], zero)))      # u x e2
    for c in range(3):
        jm[3 + c] = dpix(ux[c])

    jr = [None] * 6
    for c, ec in enumerate((e0, e1, e2)):
        jr[c] = dpix((rho * ec[0], rho * ec[1], rho * ec[2]))
    # ref rotation: v_c = w1 x e_c + rho (t_vr x e_c); dir = -Rv^T R1^T R2 v_c
    for c in range(3):
        ec = [zero, zero, zero]
        ec[c] = one
        ec = tuple(ec)
        v1c = _cross(w1, ec)
        v2c = _cross(t_vr, ec)
        vc = (v1c[0] + rho * v2c[0], v1c[1] + rho * v2c[1],
              v1c[2] + rho * v2c[2])
        d3 = _rot_apply_t(q_v, _rot_apply_t(q_m, _rot_apply(q_r, vc)))
        jr[3 + c] = dpix((-d3[0], -d3[1], -d3[2]))

    drho3 = (t_wsr[0] - t_m[0], t_wsr[1] - t_m[1], t_wsr[2] - t_m[2])
    drho = _rot_apply_t(q_v, _rot_apply_t(q_m, drho3))
    jl = dpix((drho[0] - rvtv[0], drho[1] - rvtv[1], drho[2] - rvtv[2]))

    # --- pack, masked ----------------------------------------------------
    # same-pose rows: pose Jacobians are exactly zero (meas and ref
    # perturbations cancel); zero them here instead of relying on f32
    # cancellation of j_meas + j_ref in the scatter-add downstream
    v = valid
    vp = valid * (1.0 - same)
    rows = [r_out0 * v, r_out1 * v]
    rows += [jm[c][0] * vp for c in range(6)]
    rows += [jm[c][1] * vp for c in range(6)]
    rows += [jr[c][0] * vp for c in range(6)]
    rows += [jr[c][1] * vp for c in range(6)]
    rows += [jl[0] * v, jl[1] * v]
    rows += [(r_out0 * r_out0 + r_out1 * r_out1) * v]
    return jnp.stack(rows, axis=0)
