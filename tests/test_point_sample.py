"""Separable tent-matmul point sampling vs the packed-gather reference.

Contract under test (ops/point_sample.py): identical bilinear values
with zero-padding semantics, and a matmul backward equal to the
scatter-add the gather path's autodiff produces.
"""
import numpy as np

import jax
import jax.numpy as jnp

from ocrfdet_tpu.ops.point_sample import point_sample_mm, point_sample_ref


def _case(B=1, N=2, H=12, W=20, C=3, P=700, seed=0):
    """P deliberately not a multiple of the 512-point block."""
    rng = np.random.default_rng(seed)
    maps = jnp.asarray(rng.normal(0, 1, (B, N, H, W, C))
                       .astype(np.float32))
    px = jnp.asarray(rng.uniform(-3, W + 3, (B, N, P)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-3, H + 3, (B, N, P)).astype(np.float32))
    return maps, px, py


def test_point_sample_mm_matches_gather():
    maps, px, py = _case()
    ref = point_sample_ref(maps, px, py)
    got = point_sample_mm(maps, px, py, interpret=True)
    # the kernel computes the products in bf16
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=2e-2)
    # sanity on well-inside points at f32-ish agreement via bf16 ref
    ref16 = point_sample_ref(maps.astype(jnp.bfloat16), px, py)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref16, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_point_sample_mm_boundary_zero_padding():
    """Out-of-image taps contribute zero, matching padding_zero."""
    maps, _, _ = _case(seed=1)
    B, N, H, W, C = maps.shape
    px = jnp.asarray([[[-0.5, W - 0.5, -2.0, 0.0]] * N], jnp.float32)
    py = jnp.asarray([[[0.0, H - 0.5, 5.0, -0.5]] * N], jnp.float32)
    ref = point_sample_ref(maps, px, py)
    got = point_sample_mm(maps, px, py, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=2e-2)


def test_point_sample_mm_grad_matches():
    maps, px, py = _case(P=600, seed=2)
    w = jnp.asarray(np.random.default_rng(3)
                    .normal(0, 1, (1, 2, 600, 3)).astype(np.float32))

    def loss_mm(m):
        return jnp.sum(point_sample_mm(m, px, py, interpret=True) * w)

    def loss_ref(m):
        return jnp.sum(point_sample_ref(m, px, py) * w)

    g_mm = jax.grad(loss_mm)(maps)
    g_rf = jax.grad(loss_ref)(maps)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_rf),
                               rtol=3e-2, atol=3e-2)
