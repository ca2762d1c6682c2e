"""Property tests for ba_tpu.core.lie.

Mirrors the reference's finite-difference self-checks (BundleAdjusterTest.h,
math_test app) as pytest property tests: every map is verified against scipy
ground truth and `jax.jacfwd` is verified against central finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ba_tpu.core import lie

rng = np.random.default_rng(0)


def random_quat(n=()):
    q = rng.normal(size=n + (4,))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def to_scipy(q):
    # ours is [w,x,y,z]; scipy is [x,y,z,w]
    q = np.asarray(q)
    return R.from_quat(np.concatenate([q[..., 1:], q[..., :1]], axis=-1))


def test_quat_mul_matches_scipy():
    a, b = random_quat((32,)), random_quat((32,))
    got = to_scipy(lie.quat_mul(a, b)).as_matrix()
    want = (to_scipy(a) * to_scipy(b)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_rotate_matches_matrix():
    q = random_quat((32,))
    v = jnp.asarray(rng.normal(size=(32, 3)))
    np.testing.assert_allclose(
        lie.quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), v),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        lie.quat_rotate(q, v), to_scipy(q).apply(np.array(v)), atol=1e-12
    )


def test_matrix_quat_roundtrip():
    q = random_quat((64,))
    m = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(m)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-10)


def test_exp_log_roundtrip():
    # own rng (execution-order independent under pytest-xdist) and norms
    # kept below pi: log(exp(w)) correctly 2pi-wraps beyond that
    r = np.random.default_rng(7)
    w = r.normal(size=(64, 3))
    n = np.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.asarray(w * np.minimum(n, 3.0) / n)
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-10)


def test_exp_log_near_identity():
    w = jnp.asarray(rng.normal(size=(16, 3)) * 1e-9)
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-14)
    # exact identity
    z = jnp.zeros((3,))
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(z)), z, atol=0)


def test_exp_matches_scipy():
    w = jnp.asarray(rng.normal(size=(32, 3)))
    got = to_scipy(lie.so3_exp(w)).as_matrix()
    want = R.from_rotvec(np.array(w)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_log_shortest_geodesic():
    # quaternion with negative w must give |log| <= pi
    q = random_quat((128,))
    w = lie.so3_log(q)
    assert np.all(np.linalg.norm(w, axis=-1) <= np.pi + 1e-9)


def _fd_jac(f, x, eps=1e-7):
    x = np.asarray(x, dtype=np.float64)
    cols = []
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx.flat[i] = eps
        cols.append((np.asarray(f(x + dx)) - np.asarray(f(x - dx))) / (2 * eps))
    return np.stack(cols, axis=-1)


# NOTE: this environment's XLA CPU build computes *size-1* f64 cos through an
# f32-accurate scalar path (batched shapes are exact to 1e-14).  The FD tests
# therefore evaluate on a batch of 2 and slice, so both the primal and the
# finite differences go through the accurate vectorized path.


def _batched(f):
    return lambda x: f(jnp.broadcast_to(jnp.asarray(x), (2,) + jnp.asarray(x).shape))[0]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_jacfwd_exp_matches_fd(seed):
    w0 = np.random.default_rng(seed).normal(size=3)
    f = _batched(lie.so3_exp)
    np.testing.assert_allclose(jax.jacfwd(f)(jnp.asarray(w0)), _fd_jac(f, w0),
                               atol=1e-6)


@pytest.mark.parametrize("scale", [1.0, 1e-4])
def test_jacfwd_log_matches_fd(scale):
    w0 = np.random.default_rng(4).normal(size=3) * scale
    q0 = lie.so3_exp(jnp.asarray(np.stack([w0, w0])))
    f = lambda d: lie.so3_log(
        lie.quat_mul(q0, lie.so3_exp(jnp.broadcast_to(d, (2, 3))))
    )[0]
    d0 = jnp.zeros(3)
    np.testing.assert_allclose(jax.jacfwd(f)(d0), _fd_jac(f, np.zeros(3)),
                               atol=1e-6)


def test_jacfwd_finite_at_identity():
    # derivative of log(exp(d)) at d=0 must be exactly I, no NaNs
    J = jax.jacfwd(lambda d: lie.so3_log(lie.so3_exp(d)))(jnp.zeros(3))
    np.testing.assert_allclose(J, np.eye(3), atol=1e-10)
    J2 = jax.jacfwd(lambda d: lie.so3_exp(d))(jnp.zeros(3))
    assert np.all(np.isfinite(J2))


def test_se3_compose_inverse():
    q, t = random_quat((8,)), jnp.asarray(rng.normal(size=(8, 3)))
    T = (q, t)
    qi, ti = lie.se3_compose(T, lie.se3_inverse(T))
    np.testing.assert_allclose(jnp.abs(qi[..., 0]), 1.0, atol=1e-12)
    np.testing.assert_allclose(ti, 0.0, atol=1e-12)


def test_se3_transform_homog_consistent():
    q, t = random_quat(()), jnp.asarray(rng.normal(size=3))
    p = jnp.asarray(rng.normal(size=3))
    rho = 0.7
    ph = jnp.concatenate([p * rho, jnp.array([rho])])
    out = lie.se3_transform_homog((q, t), ph)
    # dividing by rho must equal the euclidean transform of p
    np.testing.assert_allclose(out[:3] / out[3],
                               lie.se3_transform_point((q, t), p), atol=1e-12)


def test_se3_log_retract_roundtrip():
    q, t = random_quat((8,)), jnp.asarray(rng.normal(size=(8, 3)))
    x = jnp.asarray(rng.normal(size=(8, 6)) * 0.5)
    b = (q, t)
    a = lie.se3_retract(b, x)
    # log_decoupled(a, b) = [a.t - b.t, log(qa qb^-1)]; with right retraction
    # qa = qb exp(xw): log(qb exp(xw) qb^-1) = R(qb) xw — NOT xw itself.
    got = lie.se3_log_decoupled(a, b)
    np.testing.assert_allclose(got[..., :3], x[..., :3], atol=1e-10)
    np.testing.assert_allclose(got[..., 3:],
                               lie.quat_rotate(q, x[..., 3:]), atol=1e-10)


def test_gravity_vector():
    g = lie.gravity_vector(jnp.zeros(2))
    np.testing.assert_allclose(g, [0, 0, -lie.GRAVITY], atol=1e-12)
    g2 = lie.gravity_vector(jnp.asarray(rng.normal(size=(5, 2))))
    np.testing.assert_allclose(np.linalg.norm(g2, axis=-1), lie.GRAVITY,
                               atol=1e-12)
