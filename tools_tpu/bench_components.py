"""Per-component TPU micro-benchmarks at flagship shapes.

Times the candidate hot ops (bev_pool impls, HT gather, tiled splat
renderer fwd/bwd) so optimization effort goes where the time is.
"""
from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_bev_pool(B=1):
    from ocrfdet_tpu.ops.bev_pool import bev_pool_lss
    rng = np.random.default_rng(0)
    N, D, fH, fW, C = 6, 118, 16, 44, 80
    X = Y = 128
    depth = jnp.asarray(rng.random((B, N, D, fH, fW)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(B, N, fH, fW, C)), jnp.float32)
    vox = np.stack([rng.integers(0, X, (B, N, D, fH, fW)),
                    rng.integers(0, Y, (B, N, D, fH, fW)),
                    np.zeros((B, N, D, fH, fW), np.int64)], -1)
    vox = jnp.asarray(vox, jnp.int32)
    valid = jnp.asarray(rng.random((B, N, D, fH, fW)) < 0.6)

    for impl in ("matmul", "segsum", "sort", "pallas"):
        f = jax.jit(lambda d, ft, impl=impl: bev_pool_lss(
            d, ft, vox, valid, (X, Y, 1), impl=impl))
        try:
            dt = timeit(f, depth, feat)
            print(f"bev_pool[{impl}] fwd  B={B}: {dt*1e3:8.2f} ms")
            g = jax.jit(jax.grad(lambda d, ft, impl=impl: jnp.sum(
                bev_pool_lss(d, ft, vox, valid, (X, Y, 1), impl=impl)),
                argnums=(0, 1)))
            dt = timeit(g, depth, feat)
            print(f"bev_pool[{impl}] bwd  B={B}: {dt*1e3:8.2f} ms")
        except Exception as e:
            print(f"bev_pool[{impl}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:150]}")


def bench_renderer(B=1, G=13 * 128 * 128):
    from ocrfdet_tpu.ops.splat import (preprocess_gaussians,
                                       quat_scale_to_cov3d,
                                       render_gaussians_tiled)
    from ocrfdet_tpu.geometry.cameras import splat_camera
    rng = np.random.default_rng(0)
    H, W = 256, 704
    K = jnp.array([[560.0, 0, W / 2], [0, 560.0, H / 2], [0, 0, 1.0]])
    cam = splat_camera(jnp.eye(4), K, (H, W))
    means = jnp.asarray(
        np.stack([rng.uniform(-40, 40, G), rng.uniform(-20, 20, G),
                  rng.uniform(1, 60, G)], -1), jnp.float32)
    cov = quat_scale_to_cov3d(
        jnp.asarray(rng.normal(size=(G, 4)), jnp.float32),
        jnp.asarray(rng.uniform(0.2, 0.8, (G, 3)), jnp.float32))
    color = jnp.asarray(rng.uniform(0, 1, (G, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.9, G), jnp.float32)

    def render(means_, color_, opac_):
        g = preprocess_gaussians(means_, cov, cam)
        img, dep, ovf = render_gaussians_tiled(g, color_, opac_, H, W)
        return img, ovf

    f = jax.jit(render)
    dt = timeit(f, means, color, opac)
    img, ovf = f(means, color, opac)
    print(f"splat_tiled fwd  G={G}: {dt*1e3:8.2f} ms "
          f"(overflow={int(ovf)})")
    gfn = jax.jit(jax.grad(
        lambda m, c, o: jnp.sum(render(m, c, o)[0]), argnums=(1, 2)))
    dt = timeit(gfn, means, color, opac)
    print(f"splat_tiled bwd  G={G}: {dt*1e3:8.2f} ms")


def bench_ht(B=1):
    """HT gather-reduce at flagship shapes (isolated)."""
    rng = np.random.default_rng(0)
    N, h, w, D, C = 6, 16, 44, 118, 80
    Zh, Nq = 13, 128 * 128
    depth = jnp.asarray(rng.random((B, N, h * w, D)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, N, h * w, C)), jnp.float32)
    ui = jnp.asarray(rng.integers(0, w, (B, N, Zh, Nq)), jnp.int32)
    vi = jnp.asarray(rng.integers(0, h, (B, N, Zh, Nq)), jnp.int32)
    di = jnp.asarray(rng.integers(0, D, (B, N, Zh, Nq)), jnp.int32)
    valid = jnp.asarray(rng.random((B, N, Zh, Nq)) < 0.5)

    def ht(depth, ctx):
        def step(acc, nz):
            n, z = nz // Zh, nz % Zh
            pix = vi[:, n, z] * w + ui[:, n, z]
            wgt = jnp.take_along_axis(
                jnp.take_along_axis(depth[:, n], pix[..., None], axis=1),
                di[:, n, z][..., None], axis=2)[..., 0]
            feat = jnp.take_along_axis(ctx[:, n], pix[..., None], axis=1)
            wgt = wgt * valid[:, n, z].astype(wgt.dtype)
            return acc + feat * wgt[..., None], None
        acc, _ = jax.lax.scan(step, jnp.zeros((B, Nq, C), jnp.float32),
                              jnp.arange(N * Zh))
        return acc

    f = jax.jit(ht)
    dt = timeit(f, depth, ctx)
    print(f"ht_pool fwd      B={B}: {dt*1e3:8.2f} ms")
    gfn = jax.jit(jax.grad(lambda d, c: jnp.sum(ht(d, c)), argnums=(0, 1)))
    dt = timeit(gfn, depth, ctx)
    print(f"ht_pool bwd      B={B}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    if which in ("all", "bev"):
        bench_bev_pool()
    if which in ("all", "ht"):
        bench_ht()
    if which in ("all", "splat"):
        bench_renderer()
