"""Pallas TPU kernel for depth-weighted BEV pooling.

Replaces the XLA scatter in ops/bev_pool.py (and the reference's CUDA
bev_pool_v2 kernel, ops/bev_pool_v2/src/bev_pool_cuda.cu:21-140) with a
VMEM-resident accumulator:

  * the whole [cells, C] output block stays in VMEM across all point
    chunks of one sample (grid = (B, n_chunks); the output block index
    only depends on b, so Mosaic keeps it revisioned in VMEM and we
    zero it at chunk 0), so the ~500k per-frame scatter-adds hit
    on-chip memory instead of the serialised HBM read-modify-write
    stream XLA emits for non-unique scatters;
  * the per-point (weight, pixel, cell) streams arrive chunk by chunk
    through the normal pipelined BlockSpecs into SMEM — the scalar
    core reads them with arbitrary dynamic indices (VMEM vector loads
    must be lane-aligned, which a per-point stream cannot prove);
    context features are VMEM-resident (npix x C ~ 2 MB).

Forward:  out[b, cell, :] = sum over points p with cell_p == cell of
          w[b, p] * feat[b, pix_p, :]
Backward (custom_vjp, mirrors bev_pool_grad_kernel):
          d_feat[b, pix, :] += w * g[b, cell, :]
          d_w[b, p] = <feat[b, pix_p, :], g[b, cell_p, :]>

Points with cell_id == cells (the dummy id for invalid points) land in
a scratch row that is dropped on return. Runs in interpreter mode off
TPU so tests exercise identical code on CPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vma import union_vma

CHUNK = 2048  # per-grid-step point chunk; 3 streams x CHUNK fits SMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(w_ref, pix_ref, cell_ref, feat_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(p, _):
        cell = cell_ref[p]
        row = feat_ref[pix_ref[p], :] * w_ref[p]
        out_ref[cell, :] = out_ref[cell, :] + row
        return 0

    jax.lax.fori_loop(0, w_ref.shape[0], body, 0)


def _bwd_kernel(w_ref, pix_ref, cell_ref, feat_ref, g_ref,
                dfeat_ref, dw_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)

    def body(p, _):
        cell = cell_ref[p]
        pix = pix_ref[p]
        grow = g_ref[cell, :]
        dfeat_ref[pix, :] = dfeat_ref[pix, :] + grow * w_ref[p]
        dw_ref[p] = jnp.sum(feat_ref[pix, :] * grow)
        return 0

    jax.lax.fori_loop(0, w_ref.shape[0], body, 0)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad_points(w, pix_id, cell_id, cells):
    B, P = w.shape
    Pp = _round_up(P, CHUNK)
    if Pp != P:
        pad = Pp - P
        w = jnp.pad(w, ((0, 0), (0, pad)))
        pix_id = jnp.pad(pix_id, ((0, 0), (0, pad)))
        cell_id = jnp.pad(cell_id, ((0, 0), (0, pad)),
                          constant_values=cells)
    return w, pix_id, cell_id, Pp


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def bev_pool_points(w, pix_id, cell_id, feat, cells: int):
    """w [B, P]; pix_id/cell_id [B, P] int32 (invalid -> cells);
    feat [B, npix, C]. Returns [B, cells, C] float32."""
    return _forward(w, pix_id, cell_id, feat, cells)


def _use_mirror(*arrs) -> bool:
    """True when interpreting inside shard_map (check_vma on).

    jax 0.9's Pallas HLO interpreter cannot be evaluated under
    shard_map(check_vma=True) (its internal grid-scan carries are not
    vma-tracked), so off-TPU with varying inputs we run a pure-JAX
    scatter-add mirror of the kernel; the real Mosaic path (with vma
    out_shape declarations) is used on TPU."""
    return _interpret() and union_vma(*arrs) is not None


def _forward(w, pix_id, cell_id, feat, cells):
    B, P = w.shape
    npix, C = feat.shape[1:]
    Cp = _round_up(C, 128)
    featp = jnp.pad(feat.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, Cp - C)))
    w, pix_id, cell_id, Pp = _pad_points(
        w.astype(jnp.float32), pix_id, cell_id, cells)
    if _use_mirror(w, pix_id, cell_id, featp):
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        rows = featp[bidx, pix_id] * w[..., None]      # [B, Pp, Cp]
        out = jnp.zeros((B, cells + 1, Cp), jnp.float32)
        out = out.at[bidx, cell_id].add(rows)
        return out[:, :cells, :C]
    n_chunks = Pp // CHUNK
    stream = lambda: pl.BlockSpec((None, CHUNK), lambda b, c: (b, c),
                                  memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(B, n_chunks),
        in_specs=[
            stream(), stream(), stream(),
            pl.BlockSpec((None, npix, Cp), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, cells + 1, Cp),
                               lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cells + 1, Cp), jnp.float32,
                                       vma=union_vma(w, pix_id, cell_id,
                                                     featp)),
        interpret=_interpret(),
    )(w, pix_id, cell_id, featp)
    return out[:, :cells, :C]


def _fwd_rule(w, pix_id, cell_id, feat, cells):
    out = _forward(w, pix_id, cell_id, feat, cells)
    return out, (w, pix_id, cell_id, feat)


def _bwd_rule(cells, res, g):
    w, pix_id, cell_id, feat = res
    B, P = w.shape
    npix, C = feat.shape[1:]
    Cp = _round_up(C, 128)
    featp = jnp.pad(feat.astype(jnp.float32),
                    ((0, 0), (0, 0), (0, Cp - C)))
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, 1), (0, Cp - C)))   # dummy row reads 0
    wp, pix_p, cell_p, Pp = _pad_points(
        w.astype(jnp.float32), pix_id, cell_id, cells)
    if _use_mirror(wp, pix_p, cell_p, featp, gp):
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        grow = gp[bidx, cell_p]                         # [B, Pp, Cp]
        featrow = featp[bidx, pix_p]
        dw = jnp.sum(featrow * grow, axis=-1)
        dfeat = jnp.zeros_like(featp).at[bidx, pix_p].add(
            grow * wp[..., None])
        return (dw[:, :P].astype(w.dtype), None, None,
                dfeat[:, :, :C].astype(feat.dtype))
    n_chunks = Pp // CHUNK
    stream = lambda: pl.BlockSpec((None, CHUNK), lambda b, c: (b, c),
                                  memory_space=pltpu.SMEM)
    dfeat, dw = pl.pallas_call(
        _bwd_kernel,
        grid=(B, n_chunks),
        in_specs=[
            stream(), stream(), stream(),
            pl.BlockSpec((None, npix, Cp), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cells + 1, Cp), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, npix, Cp), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            stream(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, npix, Cp), jnp.float32,
                                 vma=union_vma(wp, featp, gp)),
            jax.ShapeDtypeStruct((B, Pp), jnp.float32,
                                 vma=union_vma(wp, featp, gp)),
        ),
        interpret=_interpret(),
    )(wp, pix_p, cell_p, featp, gp)
    return (dw[:, :P].astype(w.dtype), None, None,
            dfeat[:, :, :C].astype(feat.dtype))


bev_pool_points.defvjp(_fwd_rule, _bwd_rule)
