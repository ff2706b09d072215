import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrfdet_tpu.ops.bev_pool import bev_pool_lss


def brute_force(depth, feat, vox_idx, valid, bev_size):
    X, Y, Z = bev_size
    B, N, D, fH, fW = depth.shape
    C = feat.shape[-1]
    out = np.zeros((B, Z, Y, X, C))
    for b in range(B):
        for n in range(N):
            for d in range(D):
                for h in range(fH):
                    for w in range(fW):
                        if not valid[b, n, d, h, w]:
                            continue
                        x, y, z = vox_idx[b, n, d, h, w]
                        out[b, z, y, x] += depth[b, n, d, h, w] * feat[b, n, h, w]
    return np.moveaxis(out, 1, 3).reshape(B, Y, X, Z * C)


def golden_case():
    """The reference kernel's hand-computed case
    (ops/bev_pool_v2/bev_pool.py:145-176): loss == 4.4 + exact grads."""
    depth = np.array([0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9],
                     dtype=np.float32).reshape(1, 1, 2, 2, 2)
    feat = np.ones((1, 1, 2, 2, 2), dtype=np.float32)
    vox_idx = np.zeros((1, 1, 2, 2, 2, 3), dtype=np.int32)
    valid = np.zeros((1, 1, 2, 2, 2), dtype=bool)
    # valid points -> cells: (d0,h0,w0)->(0,0), (d0,h0,w1)->(1,0),
    #                        (d1,h0,w0)->(0,0), (d1,h1,w0)->(1,0)
    for (d, h, w), (x, y) in [((0, 0, 0), (0, 0)), ((0, 0, 1), (1, 0)),
                              ((1, 0, 0), (0, 0)), ((1, 1, 0), (1, 0))]:
        valid[0, 0, d, h, w] = True
        vox_idx[0, 0, d, h, w] = (x, y, 0)
    return depth, feat, vox_idx, valid, (2, 2, 1)


@pytest.mark.parametrize("impl", ["segsum", "matmul", "sort"])
def test_golden_forward_and_grad(impl):
    depth, feat, vox_idx, valid, bev_size = golden_case()

    def loss_fn(d, f):
        return jnp.sum(bev_pool_lss(d, f, jnp.asarray(vox_idx),
                                    jnp.asarray(valid), bev_size, impl=impl))

    loss, (gd, gf) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(depth), jnp.asarray(feat))
    np.testing.assert_allclose(float(loss), 4.4, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gd).ravel(), [2, 2, 0, 0, 2, 0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gf).ravel(), [1.0, 1.0, 0.4, 0.4, 0.8, 0.8, 0, 0],
        atol=1e-6)


@pytest.mark.parametrize("impl", ["segsum", "matmul", "sort"])
def test_random_vs_brute_force(impl):
    rng = np.random.default_rng(0)
    B, N, D, fH, fW, C = 2, 3, 4, 2, 5, 6
    bev_size = (4, 3, 2)
    depth = rng.random((B, N, D, fH, fW)).astype(np.float32)
    feat = rng.normal(size=(B, N, fH, fW, C)).astype(np.float32)
    vox_idx = np.stack([
        rng.integers(0, bev_size[0], (B, N, D, fH, fW)),
        rng.integers(0, bev_size[1], (B, N, D, fH, fW)),
        rng.integers(0, bev_size[2], (B, N, D, fH, fW))], -1).astype(np.int32)
    valid = rng.random((B, N, D, fH, fW)) < 0.7

    out = bev_pool_lss(jnp.asarray(depth), jnp.asarray(feat),
                       jnp.asarray(vox_idx), jnp.asarray(valid),
                       bev_size, impl=impl)
    expect = brute_force(depth, feat, vox_idx, valid, bev_size)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=1e-4)


def test_impls_agree_under_jit():
    depth, feat, vox_idx, valid, bev_size = golden_case()
    f1 = jax.jit(lambda d, f: bev_pool_lss(
        d, f, jnp.asarray(vox_idx), jnp.asarray(valid), bev_size, "segsum"))
    f2 = jax.jit(lambda d, f: bev_pool_lss(
        d, f, jnp.asarray(vox_idx), jnp.asarray(valid), bev_size, "matmul"))
    a = f1(jnp.asarray(depth), jnp.asarray(feat))
    b = f2(jnp.asarray(depth), jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_pallas_impl_matches_brute_force():
    """Pallas kernel (interpreter mode on CPU) vs brute force."""
    rng = np.random.default_rng(1)
    B, N, D, fH, fW, C = 1, 2, 3, 2, 2, 5
    bev_size = (3, 3, 1)
    depth = rng.random((B, N, D, fH, fW)).astype(np.float32)
    feat = rng.normal(size=(B, N, fH, fW, C)).astype(np.float32)
    vox_idx = np.stack([
        rng.integers(0, bev_size[0], (B, N, D, fH, fW)),
        rng.integers(0, bev_size[1], (B, N, D, fH, fW)),
        np.zeros((B, N, D, fH, fW), np.int64)], -1).astype(np.int32)
    valid = rng.random((B, N, D, fH, fW)) < 0.8

    out = bev_pool_lss(jnp.asarray(depth), jnp.asarray(feat),
                       jnp.asarray(vox_idx), jnp.asarray(valid),
                       bev_size, impl="pallas")
    expect = brute_force(depth, feat, vox_idx, valid, bev_size)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4,
                               atol=1e-5)


def test_pallas_impl_gradients():
    depth, feat, vox_idx, valid, bev_size = golden_case()

    def loss_fn(d, f):
        return jnp.sum(bev_pool_lss(d, f, jnp.asarray(vox_idx),
                                    jnp.asarray(valid), bev_size,
                                    impl="pallas"))

    loss, (gd, gf) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(depth), jnp.asarray(feat))
    np.testing.assert_allclose(float(loss), 4.4, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gd).ravel(), [2, 2, 0, 0, 2, 0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gf).ravel(), [1.0, 1.0, 0.4, 0.4, 0.8, 0.8, 0, 0],
        atol=1e-6)
