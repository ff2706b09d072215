"""Tiled Gaussian renderer (production path).

The reference rasterizer sorts (tile, depth) keys with CUB and walks
per-tile lists (rasterizer_impl.cu:277-314). Data-dependent list
lengths are hostile to XLA, so this redesign keeps everything static:

  1. global compaction: one top_k keeps the nearest `global_cap` valid
     gaussians, producing a depth-ascending stream;
  2. two-level tile selection (XLA): a coarse pass picks the nearest
     `coarse_cap` gaussians per 2x2 tile block, a fine pass picks the
     nearest M per tile from its block's candidates. top_k lowers to a
     full per-row sort on TPU, so shrinking the sorted domain from
     [T, G] to [T/4, G] + [T, coarse_cap] is ~4x cheaper than the
     single-level selection; both top_k's order by -depth, so the
     resulting per-tile streams stay front-to-back;
  3. per-tile chunked alpha compositing identical in math to
     render_xla (shared semantics: square 3-sigma support, alpha cap
     0.99, 1/255 cutoff, median depth at the T<0.5 crossing), with two
     backends:
       * backend="pallas": the fused VMEM-resident kernel in
         render_pallas.py (custom fwd+bwd; the fast path on TPU);
       * backend="xla": a lax.scan over gaussian chunks (autodiff
         backward), the correctness cross-check and CPU fallback.

M bounds per-tile work; `overflow` reports dropped contributors at
either selection level (0 in practice for the 13-plane OcRF scenes
when M is sized per config — coarse drops require >coarse_cap
gaussians stacked on one 32x32 block).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.vma import match_vma
from .preprocess import Gaussians2D
from .render_pallas import composite_tiles
from .render_xla import ALPHA_EPS, MEDIAN_DEPTH_DEFAULT

_STREAM_KEYS = ("mx", "my", "ca", "cb", "cc", "rad", "dep", "op",
                "cr", "cg", "cb_col")


def _compact(g: Gaussians2D, color, opacity, global_cap: int):
    """Keep the nearest `global_cap` valid gaussians, depth-ascending."""
    gprio = jnp.where(g.valid & (g.radius > 0), -g.depth, -jnp.inf)
    gp, gidx = jax.lax.top_k(gprio, global_cap)
    keep_valid = jnp.isfinite(gp)
    g = Gaussians2D(
        mean2d=g.mean2d[gidx], conic=g.conic[gidx],
        radius=jnp.where(keep_valid, g.radius[gidx], 0.0),
        depth=g.depth[gidx], valid=g.valid[gidx] & keep_valid)
    return g, color[gidx], opacity[gidx]


def _select_packed(g: Gaussians2D, color, opacity, n_tx: int, n_ty: int,
                   tile_h: int, tile_w: int, M: int, coarse_cap: int,
                   coarse_group: int = 16):
    """Two-level per-tile selection.

    Returns (packed dict of [T, M] streams in raster tile order with
    depth ascending along M; dead slots have op == 0, overflow)."""
    G = color.shape[0]
    r = g.radius
    x0 = jnp.floor((g.mean2d[:, 0] - r) / tile_w)
    x1 = jnp.floor((g.mean2d[:, 0] + r) / tile_w)
    y0 = jnp.floor((g.mean2d[:, 1] - r) / tile_h)
    y1 = jnp.floor((g.mean2d[:, 1] + r) / tile_h)
    g_ok = g.valid & (r > 0)
    neg_depth = jnp.where(g_ok, -g.depth, -jnp.inf)
    # one [G, 11] attribute matrix: a row gather moves all attributes
    # of a gaussian with ONE descriptor (11 separate [G] gathers cost
    # 11x the descriptors, and descriptors — not bytes — dominate
    # TPU gather time)
    all_attr = jnp.stack(
        [g.mean2d[:, 0], g.mean2d[:, 1],
         g.conic[:, 0], g.conic[:, 1], g.conic[:, 2],
         g.radius, g.depth,
         (opacity * g_ok.astype(opacity.dtype)).astype(jnp.float32),
         color[:, 0], color[:, 1], color[:, 2]],
        axis=-1).astype(jnp.float32)
    bbox_all = jnp.stack([x0, x1, y0, y1], axis=-1)   # [G, 4]

    n_ctx = -(-n_tx // 2)
    n_cty = -(-n_ty // 2)
    Tc = n_ctx * n_cty
    Mc = min(coarse_cap, G)

    ctix = jnp.tile(jnp.arange(n_ctx, dtype=jnp.float32), n_cty)
    ctiy = jnp.repeat(jnp.arange(n_cty, dtype=jnp.float32), n_ctx)
    padC = (-Tc) % coarse_group
    if padC:
        ctix = jnp.concatenate([ctix, jnp.zeros((padC,))])
        ctiy = jnp.concatenate([ctiy, jnp.zeros((padC,))])
    n_cg = (Tc + padC) // coarse_group

    def coarse_group_fn(cx, cy):
        # gaussian overlaps the 2x2 fine-tile block (in fine units)
        ov = ((2 * cx[:, None] <= x1[None]) & (2 * cx[:, None] + 1 >= x0[None])
              & (2 * cy[:, None] <= y1[None]) & (2 * cy[:, None] + 1 >= y0[None])
              & g_ok[None, :])                        # [cg, G]
        c_ovf = jnp.sum(jnp.maximum(jnp.sum(ov, axis=1) - Mc, 0))
        prio = jnp.where(ov, neg_depth[None, :], -jnp.inf)
        cprio, cidx = jax.lax.top_k(prio, Mc)         # [cg, Mc]
        # only the candidate bboxes are gathered here (one row gather);
        # every other attribute is fetched once at the end through the
        # composed index (fine idx -> cidx -> global)
        bbox = bbox_all[cidx]                         # [cg, Mc, 4]
        cprio = jnp.where(jnp.isfinite(cprio), cprio, -jnp.inf)
        return cidx, bbox, cprio, c_ovf

    cidx, bbox, cprio, c_ovfs = jax.lax.map(
        lambda xy: coarse_group_fn(xy[0], xy[1]),
        (ctix.reshape(n_cg, coarse_group), ctiy.reshape(n_cg, coarse_group)))
    Tcp = n_cg * coarse_group
    cidx = cidx.reshape(Tcp, Mc)
    bbox = bbox.reshape(Tcp, Mc, 4)
    bx0, bx1, by0, by1 = [bbox[..., i] for i in range(4)]
    cprio = cprio.reshape(Tcp, Mc)

    # fine stage: each coarse tile owns its 2x2 fine siblings
    # sib 0..3 -> fine tile (2*cy + s//2, 2*cx + s%2)
    ctix_f = ctix.reshape(Tcp, 1)
    ctiy_f = ctiy.reshape(Tcp, 1)
    sx = jnp.asarray([0.0, 1.0, 0.0, 1.0]).reshape(1, 4)
    sy = jnp.asarray([0.0, 0.0, 1.0, 1.0]).reshape(1, 4)
    ftix = 2 * ctix_f + sx                            # [Tcp, 4]
    ftiy = 2 * ctiy_f + sy
    ov_f = ((ftix[..., None] >= bx0[:, None]) & (ftix[..., None] <= bx1[:, None])
            & (ftiy[..., None] >= by0[:, None]) & (ftiy[..., None] <= by1[:, None]))
    prio_f = jnp.where(ov_f, cprio[:, None, :], -jnp.inf)  # [Tcp, 4, Mc]
    # overflow: only real (non-phantom, non-padding) fine tiles count
    real_f = (ftix < n_tx) & (ftiy < n_ty) \
        & (jnp.arange(Tcp) < Tc)[:, None]
    f_ovf = jnp.sum(jnp.where(real_f, jnp.maximum(
        jnp.sum(ov_f & jnp.isfinite(cprio)[:, None, :], axis=2) - M, 0), 0))
    fprio, fidx = jax.lax.top_k(prio_f, M)            # [Tcp, 4, M]
    flive = jnp.isfinite(fprio)

    # compose fine -> coarse -> global indices, then reorder the
    # sibling layout back to raster tile order (static perm)
    gidx = jnp.take_along_axis(cidx[:, None, :], fidx, axis=2)
    T = n_ty * n_tx
    perm = np.zeros((T,), np.int32)
    for ty in range(n_ty):
        for tx in range(n_tx):
            c = (ty // 2) * n_ctx + tx // 2
            s = (ty % 2) * 2 + tx % 2
            perm[ty * n_tx + tx] = c * 4 + s
    perm = jnp.asarray(perm)
    gidx = gidx.reshape(Tcp * 4, M)[perm]             # [T, M]
    live = flive.reshape(Tcp * 4, M)[perm]
    mat = all_attr[gidx]                              # [T, M, 11]
    packed = {k: mat[..., i] for i, k in enumerate(_STREAM_KEYS)}
    packed["op"] = packed["op"] * live.astype(packed["op"].dtype)
    overflow = jnp.sum(c_ovfs) + f_ovf
    return packed, overflow


@partial(jax.jit, static_argnames=("height", "width", "tile_h", "tile_w",
                                   "max_per_tile", "chunk", "tile_group",
                                   "global_cap", "coarse_cap", "backend"))
def render_gaussians_tiled(g: Gaussians2D, color, opacity,
                           height: int, width: int,
                           tile_h: int = 16, tile_w: int = 16,
                           max_per_tile: int = 512, chunk: int = 128,
                           tile_group: int = 16,
                           global_cap: int = 65536,
                           coarse_cap: int = 2048,
                           bg_color=(0.0, 0.0, 0.0),
                           backend: str = "pallas"):
    """Returns (image [H,W,3], median_depth [H,W], overflow [] int32)."""
    assert height % tile_h == 0 and width % tile_w == 0
    n_ty, n_tx = height // tile_h, width // tile_w
    T = n_ty * n_tx
    G = color.shape[0]
    P = tile_h * tile_w
    M = min(max_per_tile, G)

    if G > global_cap:
        g, color, opacity = _compact(g, color, opacity, global_cap)
        G = global_cap
        M = min(max_per_tile, G)

    packed, overflow = _select_packed(
        g, color, opacity, n_tx, n_ty, tile_h, tile_w, M,
        coarse_cap=max(coarse_cap, M))
    bg = jnp.asarray(bg_color, dtype=jnp.float32)

    if backend == "pallas":
        rgb, med, logt = composite_tiles(
            {k: v.astype(jnp.float32) for k, v in packed.items()},
            T, n_tx, tile_h, tile_w)
        imgs = rgb + jnp.exp(logt)[..., None] * bg
        meds = med
    else:
        imgs, meds = _composite_xla(packed, T, n_tx, tile_h, tile_w,
                                    chunk, tile_group, bg, color)

    img = imgs.reshape(n_ty, n_tx, tile_h, tile_w, 3)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(height, width, 3)
    med = meds.reshape(n_ty, n_tx, tile_h, tile_w)
    med = jnp.transpose(med, (0, 2, 1, 3)).reshape(height, width)
    return img, med, overflow


def _composite_xla(packed, T, n_tx, tile_h, tile_w, chunk, tile_group,
                   bg, vma_src):
    """XLA scan formulation over the packed [T, M] streams."""
    M = packed["mx"].shape[1]
    P = tile_h * tile_w
    pad = (-M) % chunk
    Mp = M + pad
    n_chunks = Mp // chunk
    padT = (-T) % tile_group
    Tp = T + padT
    n_groups = Tp // tile_group

    def prep(x):
        x = jnp.pad(x.astype(jnp.float32), ((0, padT), (0, pad)))
        return x.reshape(n_groups, tile_group, n_chunks, chunk)
    s = {k: prep(v) for k, v in packed.items()}

    tid = jnp.arange(Tp, dtype=jnp.int32)
    px_in = jnp.tile(jnp.arange(tile_w, dtype=jnp.float32), tile_h)
    py_in = jnp.repeat(jnp.arange(tile_h, dtype=jnp.float32), tile_w)
    px_all = ((tid % n_tx)[:, None] * tile_w + px_in[None, :]) \
        .reshape(n_groups, tile_group, P)
    py_all = ((tid // n_tx)[:, None] * tile_h + py_in[None, :]) \
        .reshape(n_groups, tile_group, P)

    def render_group(args):
        sg = {k: jnp.moveaxis(v, 1, 0) for k, v in args[0].items()}
        px, py = args[1], args[2]
        tg = px.shape[0]

        def body(carry, c):
            accum, log_t, med, found = carry
            dx = px[:, None, :] - c["mx"][..., None]     # [tg,K,P]
            dy = py[:, None, :] - c["my"][..., None]
            power = (-0.5 * (c["ca"][..., None] * dx * dx
                             + c["cc"][..., None] * dy * dy)
                     - c["cb"][..., None] * dx * dy)
            alpha = c["op"][..., None] * jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.minimum(alpha, 0.99)
            keep = ((jnp.abs(dx) <= c["rad"][..., None])
                    & (jnp.abs(dy) <= c["rad"][..., None])
                    & (power <= 0.0) & (alpha >= ALPHA_EPS))
            alpha = jnp.where(keep, alpha, 0.0)
            log1m = jnp.log1p(-alpha)
            cum_in = jnp.cumsum(log1m, axis=1)
            excl = jnp.concatenate(
                [jnp.zeros_like(cum_in[:, :1]), cum_in[:, :-1]], axis=1)
            t_here = jnp.exp(log_t[:, None, :] + excl)
            w = alpha * t_here
            col = jnp.stack([c["cr"], c["cg"], c["cb_col"]], axis=-1)
            accum = accum + jnp.einsum('tkp,tkc->tpc', w, col)
            t_after = jnp.exp(log_t[:, None, :] + cum_in)
            crossed = (t_after < 0.5) & (alpha > 0.0)
            first = jnp.argmax(crossed, axis=1)
            any_cross = jnp.any(crossed, axis=1)
            d_new = jnp.take_along_axis(c["dep"], first, axis=1)
            med = jnp.where(~found & any_cross, d_new, med)
            found = found | any_cross
            log_t = log_t + cum_in[:, -1]
            return (accum, log_t, med, found), None

        init = (match_vma(jnp.zeros((tg, P, 3), jnp.float32), vma_src),
                match_vma(jnp.zeros((tg, P), jnp.float32), vma_src),
                match_vma(jnp.full((tg, P), MEDIAN_DEPTH_DEFAULT,
                                   jnp.float32), vma_src),
                jnp.zeros((tg, P), bool)
                | (vma_src.ravel()[0] > jnp.inf))
        (accum, log_t, med, _), _ = jax.lax.scan(body, init, sg)
        img = accum + jnp.exp(log_t)[..., None] * bg
        return img, med

    imgs, meds = jax.lax.map(render_group, (s, px_all, py_all))
    return (imgs.reshape(Tp, P, 3)[:T], meds.reshape(Tp, P)[:T])
