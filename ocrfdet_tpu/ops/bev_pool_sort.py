"""Scatter-free BEV pooling: sort + prefix-sum + gather.

The TPU-native answer to the reference's CUDA bev_pool_v2 scatter
kernel. XLA lowers non-unique scatter-adds to a serialised HBM
read-modify-write stream; this formulation removes every scatter:

  forward:
    order   = argsort(cell_id)                       (XLA sort)
    contrib = w[order] * feat[pix[order]]            (gather)
    S       = cumsum(contrib, axis=points)           (log-depth scan)
    out[c]  = S[end_c] - S[start_c - 1]              (searchsorted+gather)

  backward (custom_vjp — no scatter either):
    d_w[p]    = <feat[pix_p], g[cell_p]>             (gather + dot)
    d_feat[q] = sum_d w[q, d] * g[cell(q, d)]        (gather + reduce
                over the depth axis, which is the only axis that maps
                multiple points to one pixel)

Cancellation note: out is a difference of f32 prefix sums over ~5e5
rows; relative error is O(sqrt(P) * eps_f32) ~ 1e-4, fine for training
(the CUDA kernel's atomic-add ordering is nondeterministic at similar
magnitude).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def bev_pool_sorted(w, pix_id, cell_id, feat, cells: int):
    """w [B, P]; pix_id/cell_id [B, P] int32 (invalid -> cells);
    feat [B, npix, C]. Returns [B, cells, C] float32.

    NOTE the depth-structure requirement for the backward pass:
    P = npix * D with point index p = pix * D + d (depth-major-last),
    i.e. pix_id[b, p] == p // D. Callers lay points out accordingly.
    """
    return _forward(w, pix_id, cell_id, feat, cells)


def _forward(w, pix_id, cell_id, feat, cells):
    B, P = w.shape
    C = feat.shape[-1]
    order = jnp.argsort(cell_id, axis=1)
    cell_s = jnp.take_along_axis(cell_id, order, axis=1)
    w_s = jnp.take_along_axis(w.astype(jnp.float32), order, axis=1)
    pix_s = jnp.take_along_axis(pix_id, order, axis=1)
    feat_s = jnp.take_along_axis(
        feat.astype(jnp.float32), pix_s[..., None], axis=1)   # [B,P,C]
    contrib = feat_s * w_s[..., None]
    S = jnp.cumsum(contrib, axis=1)

    cvals = jnp.arange(cells, dtype=cell_id.dtype)

    def per_sample(cell_s_b, S_b):
        start = jnp.searchsorted(cell_s_b, cvals, side="left")
        end = jnp.searchsorted(cell_s_b, cvals, side="right")
        hi = S_b[jnp.clip(end - 1, 0, P - 1)]
        lo = jnp.where((start > 0)[:, None],
                       S_b[jnp.clip(start - 1, 0, P - 1)], 0.0)
        return jnp.where((end > start)[:, None], hi - lo, 0.0)

    return jax.vmap(per_sample)(cell_s, S)


def _fwd_rule(w, pix_id, cell_id, feat, cells):
    out = _forward(w, pix_id, cell_id, feat, cells)
    return out, (w, pix_id, cell_id, feat)


def _bwd_rule(cells, res, g):
    w, pix_id, cell_id, feat = res
    B, P = w.shape
    npix, C = feat.shape[1:]
    D = P // npix
    g = g.astype(jnp.float32)
    gpad = jnp.concatenate(
        [g, jnp.zeros((B, 1, C), g.dtype)], axis=1)          # dummy row
    cell_cl = jnp.minimum(cell_id, cells)
    g_rows = jnp.take_along_axis(gpad, cell_cl[..., None], axis=1)
    feat_rows = jnp.take_along_axis(
        feat.astype(jnp.float32), pix_id[..., None], axis=1)
    d_w = jnp.sum(feat_rows * g_rows, axis=-1)               # [B, P]
    # d_feat: reduce the D points of each pixel (p = pix * D + d)
    d_feat = jnp.sum(
        g_rows.reshape(B, npix, D, C)
        * w.astype(jnp.float32).reshape(B, npix, D, 1), axis=2)
    return (d_w.astype(w.dtype), None, None, d_feat.astype(feat.dtype))


bev_pool_sorted.defvjp(_fwd_rule, _bwd_rule)
