"""Camera model tests: project/unproject roundtrips, FOV model vs the
closed-form used by the reference's synthetic generator
(/root/reference/matlab/simulate_vins.py:56-78 semantics, reimplemented here
in numpy as an independent oracle), and autodiff finiteness."""

import jax
import jax.numpy as jnp
import numpy as np

from ba_tpu.core import camera

# the synthetic-sequence camera of the reference generator
FOV_PARAMS = np.array([198.969, 198.1284, 329.9368, 240.1017, 0.9640582])


def np_fov_project(params, p):
    """Independent numpy implementation of the FOV model."""
    fx, fy, cx, cy, w = params
    xn, yn = p[..., 0] / p[..., 2], p[..., 1] / p[..., 2]
    r = np.sqrt(xn**2 + yn**2)
    factor = np.arctan(2 * r * np.tan(w / 2)) / (r * w)
    return np.stack([fx * factor * xn + cx, fy * factor * yn + cy], axis=-1)


def test_linear_project():
    params = jnp.zeros(camera.MAX_PARAMS).at[:4].set(
        jnp.array([100.0, 110.0, 320.0, 240.0]))
    p = jnp.array([0.5, -0.25, 2.0])
    pix = camera.project(params, camera.MODEL_LINEAR, p)
    np.testing.assert_allclose(pix, [100 * 0.25 + 320, 110 * -0.125 + 240],
                               atol=1e-12)


def test_fov_project_matches_numpy_oracle():
    params = jnp.asarray(FOV_PARAMS)
    rng = np.random.default_rng(0)
    p = rng.normal(size=(100, 3))
    p[:, 2] = np.abs(p[:, 2]) + 0.5
    got = camera.project(params, camera.MODEL_FOV, jnp.asarray(p))
    np.testing.assert_allclose(got, np_fov_project(FOV_PARAMS, p), atol=1e-9)


def test_fov_project_on_axis():
    params = jnp.asarray(FOV_PARAMS)
    pix = camera.project(params, camera.MODEL_FOV, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(pix, FOV_PARAMS[2:4], atol=1e-9)
    # derivative on-axis must be finite (Taylor branch)
    J = jax.jacfwd(lambda p: camera.project(params, camera.MODEL_FOV, p))(
        jnp.array([0.0, 0.0, 1.0]))
    assert np.all(np.isfinite(J))
    np.testing.assert_allclose(
        J[:, :2],
        np.diag(FOV_PARAMS[:2]) * 2 * np.tan(FOV_PARAMS[4] / 2) / FOV_PARAMS[4],
        atol=1e-6,
    )


def test_fov_unproject_roundtrip():
    params = jnp.asarray(FOV_PARAMS)
    rng = np.random.default_rng(1)
    p = rng.normal(size=(50, 3))
    p[:, 2] = np.abs(p[:, 2]) + 0.5
    pix = camera.project(params, camera.MODEL_FOV, jnp.asarray(p))
    ray = camera.unproject(params, camera.MODEL_FOV, pix)
    # the ray must be parallel to p
    cos = np.sum(np.asarray(ray) * p, axis=-1) / np.linalg.norm(p, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-9)
    # and reprojection must land on the same pixel
    pix2 = camera.project(params, camera.MODEL_FOV, ray)
    np.testing.assert_allclose(pix2, pix, atol=1e-7)


def test_linear_unproject_roundtrip():
    params = jnp.zeros(camera.MAX_PARAMS).at[:4].set(
        jnp.array([100.0, 110.0, 320.0, 240.0]))
    pix = jnp.array([[300.0, 200.0], [320.0, 240.0]])
    ray = camera.unproject(params, camera.MODEL_LINEAR, pix)
    np.testing.assert_allclose(
        camera.project(params, camera.MODEL_LINEAR, ray), pix, atol=1e-9)


def test_param_jacobian_finite():
    params = jnp.asarray(FOV_PARAMS)
    p = jnp.array([0.3, -0.2, 1.5])
    J = jax.jacfwd(lambda k: camera.project(k, camera.MODEL_FOV, p))(params)
    assert J.shape == (2, len(FOV_PARAMS))
    assert np.all(np.isfinite(J))


def test_project_z_near_zero_is_finite():
    """z_safe guard (camera.py): projection and its Jacobian must stay
    finite for rays with z at/near zero (VERDICT round-1 hygiene item)."""
    params = jnp.asarray(FOV_PARAMS)
    rays = jnp.asarray(np.array([
        [0.3, -0.2, 0.0],
        [0.3, -0.2, 1e-12],
        [0.3, -0.2, -1e-12],
        [1.0, 1.0, 1e-30],
    ]))
    pix = camera.project(params, camera.MODEL_FOV, rays)
    assert bool(jnp.all(jnp.isfinite(pix)))
    J = jax.vmap(jax.jacfwd(
        lambda r: camera.project(params, camera.MODEL_FOV, r)))(rays)
    assert bool(jnp.all(jnp.isfinite(J)))
