"""Exact dense alpha-compositing renderer (pure XLA).

The correctness reference for the splat pipeline: every pixel
composites every Gaussian in front-to-back depth order using the
log-transmittance formulation

    T_i = exp( sum_{j<i} log(1 - alpha_j) )        (exclusive cumsum)
    C   = sum_i c_i * alpha_i * T_i  + bg * T_final
    D_med = depth of first i with T_{i+1} < 0.5    (15.0 if none)

which is mathematically identical to the CUDA rasterizer's sequential
loop (renderCUDA, forward.cu:262-374) minus its T < 1e-4 early-out (a
pure speed optimisation whose contribution bound is 1e-4). Differentiable
end-to-end by JAX autodiff (the reference's backward.cu re-traversal is
exactly the VJP of this expression; median depth carries no gradient,
matching the w-depth fork's "no depth backward").

O(G * H * W) — use for tests/small scenes; the tiled renderer handles
production sizes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .preprocess import Gaussians2D

MEDIAN_DEPTH_DEFAULT = 15.0
ALPHA_EPS = 1.0 / 255.0


def _chunk_alphas(g: Gaussians2D, opacity, chunk_idx, px, py):
    """Alpha of each (gaussian in chunk) x (pixel). Returns [K, P]."""
    m = g.mean2d[chunk_idx]                    # [K, 2]
    dx = px[None, :] - m[:, 0:1]
    dy = py[None, :] - m[:, 1:2]
    con = g.conic[chunk_idx]
    power = (-0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
             - con[:, 1:2] * dx * dy)
    alpha = opacity[chunk_idx][:, None] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(alpha, 0.99)
    inside = ((jnp.abs(dx) <= g.radius[chunk_idx][:, None])
              & (jnp.abs(dy) <= g.radius[chunk_idx][:, None]))
    keep = (inside & (power <= 0.0) & (alpha >= ALPHA_EPS)
            & g.valid[chunk_idx][:, None])
    return jnp.where(keep, alpha, 0.0)


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def render_gaussians_dense(g: Gaussians2D, color, opacity,
                           height: int, width: int,
                           bg_color=(0.0, 0.0, 0.0), chunk: int = 256
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view.

    g: Gaussians2D over G gaussians; color [G, 3]; opacity [G].
    Returns (image [H, W, 3], median_depth [H, W]).
    """
    G = color.shape[0]
    P = height * width
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px = jnp.tile(xs, height)
    py = jnp.repeat(ys, width)

    # global front-to-back order; culled gaussians sort to the back
    order = jnp.argsort(jnp.where(g.valid, g.depth, jnp.inf))
    pad = (-G) % chunk
    order_p = jnp.concatenate(
        [order, jnp.full((pad,), G - 1, dtype=order.dtype)])
    n_chunks = order_p.shape[0] // chunk
    pad_mask = jnp.concatenate(
        [jnp.ones((G,), bool), jnp.zeros((pad,), bool)])

    def body(carry, inp):
        accum, log_t, med_depth, found = carry
        idx, live = inp
        alpha = _chunk_alphas(g, opacity, idx, px, py)       # [K, P]
        alpha = alpha * live[:, None]
        log1m = jnp.log1p(-alpha)
        # exclusive within-chunk cumulative transmittance (log space)
        cum_in = jnp.cumsum(log1m, axis=0)
        excl = jnp.concatenate(
            [jnp.zeros((1, P), log1m.dtype), cum_in[:-1]], axis=0)
        t_here = jnp.exp(log_t[None, :] + excl)              # [K, P]
        w = alpha * t_here
        accum = accum + w.T @ color[idx]                     # [P, 3]
        # median depth: first gaussian where T after update < 0.5
        t_after = jnp.exp(log_t[None, :] + cum_in)
        crossed = (t_after < 0.5) & (alpha > 0.0)
        first = jnp.argmax(crossed, axis=0)                  # [P]
        any_cross = jnp.any(crossed, axis=0)
        d_new = g.depth[idx][first]
        med_depth = jnp.where(~found & any_cross, d_new, med_depth)
        found = found | any_cross
        log_t = log_t + cum_in[-1]
        return (accum, log_t, med_depth, found), None

    from ...utils.vma import match_vma
    init = (match_vma(jnp.zeros((P, 3), jnp.float32), color),
            match_vma(jnp.zeros((P,), jnp.float32), color),
            match_vma(jnp.full((P,), MEDIAN_DEPTH_DEFAULT, jnp.float32),
                      color),
            jnp.zeros((P,), bool) | (color.ravel()[0] > jnp.inf))
    idx_chunks = order_p.reshape(n_chunks, chunk)
    live_chunks = pad_mask.reshape(n_chunks, chunk).astype(jnp.float32)
    (accum, log_t, med_depth, _), _ = jax.lax.scan(
        body, init, (idx_chunks, live_chunks))

    bg = jnp.asarray(bg_color, dtype=jnp.float32)
    img = accum + jnp.exp(log_t)[:, None] * bg[None, :]
    return img.reshape(height, width, 3), med_depth.reshape(height, width)
