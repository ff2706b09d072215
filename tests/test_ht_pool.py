"""MXU one-hot-matmul HT pool vs the gather reference formulation.

The kernel runs in interpret mode on CPU; the contract under test is
ops/ht_pool.py's module docstring: identical pooling (nearest pixel /
depth bin, valid masking, camera+height sum) and matching gradients
for depth and context.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocrfdet_tpu.ops.ht_pool import ht_pool_mm, ht_pool_ref


def _rand_case(B=1, N=2, h=4, w=11, D=16, C=8, Zh=5, Nq=300, seed=0):
    """Random depth/context plus uvd spanning in-view, out-of-view and
    behind-camera (valid=False) points; Nq deliberately NOT a multiple
    of the kernel's 256-pillar block to exercise padding."""
    rng = np.random.default_rng(seed)
    depth = jax.nn.softmax(
        jnp.asarray(rng.normal(0, 1, (B, N, h, w, D)).astype(np.float32)),
        axis=-1)
    context = jnp.asarray(
        rng.normal(0, 1, (B, N, h, w, C)).astype(np.float32))
    uvd = jnp.asarray(
        rng.uniform(-0.3, 1.3, (B, N, Zh, Nq, 3)).astype(np.float32))
    valid = jnp.asarray(
        (rng.random((B, N, Zh, Nq)) > 0.2)
        & np.all((np.asarray(uvd) > 0.0) & (np.asarray(uvd) < 1.0), -1))
    return depth, context, uvd, valid


def test_ht_pool_mm_matches_gather():
    depth, context, uvd, valid = _rand_case()
    ref = ht_pool_ref(depth, context, uvd, valid)
    got = ht_pool_mm(depth, context, uvd, valid, interpret=True)
    # kernel casts depth/context to bf16 for the MXU products
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-3)
    # bf16 reference comparison pins the formulation itself tighter
    ref16 = ht_pool_ref(depth.astype(jnp.bfloat16),
                        context.astype(jnp.bfloat16), uvd, valid)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref16, np.float32),
                               rtol=2e-2, atol=2e-3)


def test_ht_pool_mm_gradients_match():
    depth, context, uvd, valid = _rand_case(seed=3, Nq=260)

    def loss_mm(d, c):
        out = ht_pool_mm(d, c, uvd, valid, interpret=True)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                     .reshape(out.shape)))

    def loss_ref(d, c):
        out = ht_pool_ref(d, c, uvd, valid)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                     .reshape(out.shape)))

    gd_mm, gc_mm = jax.grad(loss_mm, argnums=(0, 1))(depth, context)
    gd_rf, gc_rf = jax.grad(loss_ref, argnums=(0, 1))(depth, context)
    np.testing.assert_allclose(np.asarray(gd_mm), np.asarray(gd_rf),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(gc_mm), np.asarray(gc_rf),
                               rtol=3e-2, atol=3e-2)


def test_ht_pool_mm_zero_when_invalid():
    depth, context, uvd, _ = _rand_case(seed=5, Nq=64)
    valid = jnp.zeros(uvd.shape[:-1], bool)
    out = ht_pool_mm(depth, context, uvd, valid, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_ht_pool_mm_flagship_height_count():
    """Zh=13 (flagship) with Nq an exact block multiple."""
    depth, context, uvd, valid = _rand_case(seed=7, Zh=13, Nq=256)
    ref = ht_pool_ref(depth, context, uvd, valid)
    got = ht_pool_mm(depth, context, uvd, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=6e-3)
