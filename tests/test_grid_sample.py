import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrfdet_tpu.ops.grid_sample import (bilinear_sample,
                                         bilinear_sample_block,
                                         grid_sample_2d)


def _coords(rng, n, H, W, lo=-2.0, hi_pad=2.0):
    x = rng.uniform(lo, W - 1 + hi_pad, n).astype(np.float32)
    y = rng.uniform(lo, H - 1 + hi_pad, n).astype(np.float32)
    # force exact-boundary cases: x0 == -1, x0 == W-1, integers
    x[:6] = [-0.5, -1.0 + 1e-3, 0.0, W - 1.0, W - 1.5, W - 0.5]
    y[:6] = [-0.5, 0.0, H - 1.0, -1.0 + 1e-3, H - 1.5, H - 0.5]
    return jnp.asarray(x), jnp.asarray(y)


def test_block_matches_four_tap():
    rng = np.random.default_rng(0)
    H, W, C = 13, 29, 4
    img = jnp.asarray(rng.normal(size=(H, W, C)), jnp.float32)
    x, y = _coords(rng, 500, H, W)
    ref = bilinear_sample(img, x, y)
    out = bilinear_sample_block(img, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_block_matches_four_tap_grads():
    rng = np.random.default_rng(1)
    H, W, C = 9, 17, 2
    img = jnp.asarray(rng.normal(size=(H, W, C)), jnp.float32)
    x, y = _coords(rng, 200, H, W)

    def loss(fn, im):
        return jnp.sum(fn(im, x, y) ** 2)

    g_ref = jax.grad(lambda im: loss(bilinear_sample, im))(img)
    g_out = jax.grad(lambda im: loss(bilinear_sample_block, im))(img)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    H, W, C = 11, 19, 3
    img = rng.normal(size=(H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(7, 5, 2)).astype(np.float32)

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                          align_corners=True)
    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None], mode="bilinear",
        padding_mode="zeros", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                               atol=1e-5)
