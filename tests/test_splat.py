import jax
import jax.numpy as jnp
import numpy as np

from ocrfdet_tpu.geometry.cameras import splat_camera
from ocrfdet_tpu.ops.splat import (preprocess_gaussians,
                                   quat_scale_to_cov3d,
                                   render_gaussians_dense,
                                   render_gaussians_tiled)


def _camera(h=32, w=64, fx=50.0):
    K = jnp.array([[fx, 0.0, w / 2], [0.0, fx, h / 2], [0.0, 0.0, 1.0]])
    c2w = jnp.eye(4)  # camera at origin looking +z (world == cam)
    return splat_camera(c2w, K, (h, w))


def _scene(n=50, seed=0, spread=3.0, depth_range=(4.0, 12.0)):
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-spread, spread, n), rng.uniform(-spread / 2, spread / 2, n),
        rng.uniform(*depth_range, n)], -1)
    quat = rng.normal(size=(n, 4))
    scale = rng.uniform(0.1, 0.6, size=(n, 3))
    color = rng.uniform(0, 1, size=(n, 3))
    opacity = rng.uniform(0.2, 0.95, size=n)
    return (jnp.asarray(means), jnp.asarray(quat), jnp.asarray(scale),
            jnp.asarray(color), jnp.asarray(opacity))


def test_cov3d_isotropic():
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[2.0, 2.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(cov[0]), 4.0 * np.eye(3), atol=1e-6)


def test_preprocess_center_projection():
    cam = _camera()
    means = jnp.array([[0.0, 0.0, 10.0], [0.0, 0.0, -5.0]])
    cov = jnp.tile(0.01 * jnp.eye(3), (2, 1, 1))
    g = preprocess_gaussians(means, cov, cam)
    # centre point projects to principal point (pixel-centre convention)
    np.testing.assert_allclose(np.asarray(g.mean2d[0]), [31.5, 15.5],
                               atol=1e-4)
    assert bool(g.valid[0])
    assert not bool(g.valid[1])  # behind camera


def test_preprocess_center_pixel_exact():
    # principal point at exact pixel centre: cx=31.5 -> ndc 0 -> px 31.5
    cam = _camera(h=32, w=64, fx=50.0)
    means = jnp.array([[0.0, 0.0, 10.0]])
    cov = 0.01 * jnp.eye(3)[None]
    g = preprocess_gaussians(means, cov, cam)
    # K has cx = w/2 = 32.0 -> projects to pixel 32.0 - 0.5 = 31.5
    np.testing.assert_allclose(float(g.mean2d[0, 0]), 31.5, atol=1e-4)
    np.testing.assert_allclose(float(g.mean2d[0, 1]), 15.5, atol=1e-4)
    np.testing.assert_allclose(float(g.depth[0]), 10.0, atol=1e-5)


def test_single_opaque_gaussian_color_and_depth():
    cam = _camera()
    means = jnp.array([[0.0, 0.0, 8.0]])
    cov = quat_scale_to_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                              jnp.array([[1.0, 1.0, 1.0]]))
    g = preprocess_gaussians(means, cov, cam)
    color = jnp.array([[0.2, 0.5, 0.9]])
    opacity = jnp.array([0.999])
    img, depth = render_gaussians_dense(g, color, opacity, 32, 64)
    cy, cx = 15, 31
    # centre pixel: alpha ~= min(.99, .999) -> color * .99
    np.testing.assert_allclose(np.asarray(img[cy, cx]),
                               0.99 * np.array([0.2, 0.5, 0.9]), atol=0.01)
    np.testing.assert_allclose(float(depth[cy, cx]), 8.0, atol=1e-4)
    # far corner: background
    np.testing.assert_allclose(np.asarray(img[0, 0]), 0.0, atol=1e-5)
    assert float(depth[0, 0]) == 15.0


def test_occlusion_order():
    cam = _camera()
    means = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 10.0]])
    cov = quat_scale_to_cov3d(jnp.ones((2, 1)) * jnp.array([[1.0, 0, 0, 0]]),
                              jnp.full((2, 3), 1.0))
    g = preprocess_gaussians(means, cov, cam)
    color = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opacity = jnp.array([0.99, 0.99])
    img, depth = render_gaussians_dense(g, color, opacity, 32, 64)
    cy, cx = 15, 31
    # front (red) dominates regardless of input order
    assert float(img[cy, cx, 0]) > 0.9
    assert float(img[cy, cx, 1]) < 0.05
    np.testing.assert_allclose(float(depth[cy, cx]), 5.0, atol=1e-4)

    # reversed input order gives identical output
    perm = jnp.array([1, 0])
    g2 = jax.tree.map(lambda a: a[perm], g)
    img2, depth2 = render_gaussians_dense(g2, color[perm], opacity[perm],
                                          32, 64)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth2), np.asarray(depth),
                               atol=1e-5)


def test_tiled_matches_dense():
    cam = _camera()
    means, quat, scale, color, opacity = _scene(n=80)
    cov = quat_scale_to_cov3d(quat, scale)
    g = preprocess_gaussians(means, cov, cam)
    img_d, dep_d = render_gaussians_dense(g, color, opacity, 32, 64)
    img_t, dep_t, overflow = render_gaussians_tiled(
        g, color, opacity, 32, 64, tile_h=16, tile_w=16, max_per_tile=80)
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dep_t), np.asarray(dep_d),
                               atol=2e-5)


def test_tiled_overflow_reported():
    cam = _camera()
    means, quat, scale, color, opacity = _scene(n=80)
    cov = quat_scale_to_cov3d(quat, scale)
    g = preprocess_gaussians(means, cov, cam)
    _, _, overflow = render_gaussians_tiled(
        g, color, opacity, 32, 64, tile_h=16, tile_w=16, max_per_tile=8)
    assert int(overflow) > 0


def test_tiled_pallas_matches_xla_backend():
    """Pallas composite kernel == XLA scan composite, fwd and bwd."""
    cam = _camera()
    means, quat, scale, color, opacity = _scene(n=120, seed=3)
    cov = quat_scale_to_cov3d(quat, scale)
    g = preprocess_gaussians(means, cov, cam)

    outs = {}
    for backend in ("xla", "pallas"):
        img, dep, ovf = render_gaussians_tiled(
            g, color, opacity, 32, 64, tile_h=16, tile_w=16,
            max_per_tile=96, backend=backend)
        outs[backend] = (img, dep, ovf)
    np.testing.assert_allclose(np.asarray(outs["pallas"][0]),
                               np.asarray(outs["xla"][0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs["pallas"][1]),
                               np.asarray(outs["xla"][1]), atol=1e-5)

    def loss(backend, color_, opacity_, means_, scale_):
        cov_ = quat_scale_to_cov3d(quat, scale_)
        g_ = preprocess_gaussians(means_, cov_, cam)
        img, dep, _ = render_gaussians_tiled(
            g_, color_, opacity_, 32, 64, tile_h=16, tile_w=16,
            max_per_tile=96, backend=backend)
        # exercise color, depth and transmittance cotangents
        return jnp.sum(img * img) + 0.1 * jnp.sum(dep)

    gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3))(
        color, opacity, means, scale)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(
        color, opacity, means, scale)
    for a, b, name in zip(gx, gp, ("color", "opacity", "means", "scale")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_render_gradients():
    """Gradients flow to color, opacity, and (via preprocess) means."""
    cam = _camera()
    means, quat, scale, color, opacity = _scene(n=30)

    def loss(means_, color_, opacity_, scale_):
        cov = quat_scale_to_cov3d(quat, scale_)
        g = preprocess_gaussians(means_, cov, cam)
        img, _ = render_gaussians_dense(g, color_, opacity_, 32, 64)
        return jnp.sum((img - 0.5) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, color, opacity, scale)
    for gr, name in zip(grads, ("means", "color", "opacity", "scale")):
        s = float(jnp.sum(jnp.abs(gr)))
        assert np.isfinite(s) and s > 0, name
