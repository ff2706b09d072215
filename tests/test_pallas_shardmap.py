"""Pallas kernels inside shard_map (vma regression guard).

With check_vma=True (the jax 0.9 shard_map default), pallas_call
out_shapes must declare their varying mesh axes; the flagship TPU step
runs both Pallas kernels inside shard_map, so exercise fwd+bwd of each
under a mesh here (interpret mode on CPU, same code path).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ocrfdet_tpu.ops.bev_pool_pallas import bev_pool_points
from ocrfdet_tpu.ops.splat.render_pallas import composite_tiles
import pytest

pytestmark = pytest.mark.slow

STREAMS = ("mx", "my", "ca", "cb", "cc", "rad", "dep", "op",
           "cr", "cg", "cb_col")


def test_composite_tiles_in_shard_map():
    mesh = jax.make_mesh((2,), ("data",))
    T, M = 8, 128
    rng = np.random.RandomState(0)

    def mk():
        base = {k: jnp.asarray(rng.rand(T, M), jnp.float32)
                for k in STREAMS}
        base["mx"] = base["mx"] * 64.0
        base["my"] = base["my"] * 32.0
        base["rad"] = base["rad"] * 20.0 + 5.0
        base["ca"] = base["ca"] * 0.05
        base["cc"] = base["cc"] * 0.05
        base["cb"] = base["cb"] * 0.0
        return base

    packed = jax.tree.map(lambda *xs: jnp.stack(xs), mk(), mk())

    def local(p):
        def loss(p):
            rgb, med, logt = composite_tiles(p, T, 4, 16, 16)
            return jnp.sum(rgb) + jnp.sum(logt)
        l, g = jax.value_and_grad(loss)(p)
        return l[None], g["op"][None]

    f = jax.jit(jax.shard_map(
        lambda p: local(jax.tree.map(lambda x: x[0], p)),
        mesh=mesh, in_specs=(P("data"),), out_specs=P("data")))
    loss, gop = f(packed)         # [2], [2, T, M] (one row per shard)
    assert np.all(np.isfinite(np.asarray(loss)))
    assert np.all(np.isfinite(np.asarray(gop)))
    # sharded == per-shard unsharded
    l0, gop0 = local(jax.tree.map(lambda x: x[0], packed))
    np.testing.assert_allclose(np.asarray(loss)[0], np.asarray(l0)[0],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gop)[0], np.asarray(gop0)[0],
                               rtol=1e-4, atol=1e-6)


def test_bev_pool_points_in_shard_map():
    mesh = jax.make_mesh((2,), ("data",))
    B, Pn, npix, C, cells = 2, 64, 32, 8, 16
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.rand(B, Pn), jnp.float32)
    pix = jnp.asarray(rng.randint(0, npix, (B, Pn)), jnp.int32)
    cell = jnp.asarray(rng.randint(0, cells, (B, Pn)), jnp.int32)
    feat = jnp.asarray(rng.rand(B, npix, C), jnp.float32)

    def local(w, pix, cell, feat):
        def loss(w, feat):
            return jnp.sum(bev_pool_points(w, pix, cell, feat, cells))
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(w, feat)
        return l[None], g[0], g[1]

    f = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("data"),) * 4,
                              out_specs=P("data")))
    loss, dw, dfeat = f(w, pix, cell, feat)
    l0, dw0, dfeat0 = local(w[:1], pix[:1], cell[:1], feat[:1])
    np.testing.assert_allclose(np.asarray(loss)[0], np.asarray(l0)[0],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw)[0], np.asarray(dw0)[0],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dfeat)[0],
                               np.asarray(dfeat0)[0], rtol=1e-5)
