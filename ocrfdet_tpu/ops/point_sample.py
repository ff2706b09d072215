"""Batched bilinear point sampling of full-resolution maps as MXU
separable tent-weight matmuls.

`sample_at_voxels` (models/ocrf/view_transformer_ocrf.py) bilinearly
samples per-camera full-res maps (NeRF alphas + unnormalised RGB,
C<=4) at the ~213k projected voxel points per camera — the reference's
grid_sample calls in voxel colouring / alpha back-projection
(view_transformer_ocrf.py:924-942, 1123-1126).  The round-3 gather
path costs ~62 ms forward per frame at flagship, and its BACKWARD is a
2.6 M-row scatter-add (~200 ms) — together the largest single block of
the round-3 profile.

TPU redesign: bilinear sampling is separable,

    val[p, c] = sum_{u,v} relu(1-|px_p-u|) relu(1-|py_p-v|) map[v,u,c]

so with the map laid out as [W, C*H] the whole per-point sample is

    tmp  = Eu @ map_r            [P, C*H]   (MXU; Eu = u-tent [P, W])
    val  = sum_v Ev_exp * tmp    [P, C]     (VPU; Ev_exp = v-tent
                                             expanded over the C*H lanes)

and the transpose (the scatter) is the SAME matmul transposed:

    dmap_r += Eu^T @ (Ev_exp * dout_exp)    [W, C*H]  (MXU)

Zero gather/scatter descriptors in either direction; ~3.7 TFLOP of
burned tent arithmetic per frame replaces the 200 ms scatter (~6x).
Out-of-image taps get zero tent weight — exactly the gather path's
padding_zero semantics.  Inputs are cast to bf16 for the MXU products
(f32 accumulation).

`point_sample_ref` (the packed-gather formulation) remains the off-TPU
mirror and numerical reference.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import bilinear_sample_block
from ..utils.vma import union_vma

PBLK = 512          # points per grid step


def point_sample_ref(maps, px, py):
    """Packed-gather bilinear sampling. maps [B,N,H,W,C];
    px/py [B,N,P] continuous pixel coords. Returns [B,N,P,C]."""
    return jax.vmap(jax.vmap(bilinear_sample_block))(maps, px, py)


def _fwd_kernel(map_ref, pts_ref, out_ref, *, H, W, C):
    mp = map_ref[0]                                  # [W, C*H] bf16
    pts = pts_ref[0, 0]                              # [Pb, 2] f32
    px = pts[:, 0:1]                                 # [Pb, 1]
    py = pts[:, 1:2]
    Pb = pts.shape[0]
    u = jax.lax.broadcasted_iota(jnp.int32, (Pb, W), 1).astype(jnp.float32)
    eu = jnp.maximum(0.0, 1.0 - jnp.abs(px - u))
    tmp = jnp.dot(eu.astype(jnp.bfloat16), mp,
                  preferred_element_type=jnp.float32)  # [Pb, C*H]
    v = (jax.lax.broadcasted_iota(jnp.int32, (Pb, C * H), 1) % H) \
        .astype(jnp.float32)
    ev = jnp.maximum(0.0, 1.0 - jnp.abs(py - v))
    prod = tmp * ev                                  # [Pb, C*H] f32
    # per-channel segment sum over the H lanes of each channel block.
    # NOT a (Pb, C*H) -> (Pb, C, H) reshape + sum: that lane-dim shape
    # cast is rejected by current Mosaic ("infer-vector-layout:
    # unsupported shape cast"); static lane slices + reductions lower
    # cleanly and are exact f32 math.
    cols = [jnp.sum(prod[:, c * H:(c + 1) * H], axis=1, keepdims=True)
            for c in range(C)]
    out_ref[0] = jnp.concatenate(cols, axis=1)       # [Pb, C]


def _bwd_kernel(pts_ref, dout_ref, dmap_ref, *, H, W, C):
    pb = pl.program_id(1)

    @pl.when(pb == 0)
    def _zero():
        dmap_ref[...] = jnp.zeros_like(dmap_ref)

    pts = pts_ref[0, 0]                              # [Pb, 2]
    px = pts[:, 0:1]
    py = pts[:, 1:2]
    dout = dout_ref[0]                               # [Pb, C] f32
    Pb = pts.shape[0]
    u = jax.lax.broadcasted_iota(jnp.int32, (Pb, W), 1).astype(jnp.float32)
    eu = jnp.maximum(0.0, 1.0 - jnp.abs(px - u))
    lane = jax.lax.broadcasted_iota(jnp.int32, (Pb, C * H), 1)
    v = (lane % H).astype(jnp.float32)
    ev = jnp.maximum(0.0, 1.0 - jnp.abs(py - v))
    c_idx = lane // H
    dexp = jnp.zeros((Pb, C * H), jnp.float32)
    for c in range(C):
        dexp = jnp.where(c_idx == c, dout[:, c:c + 1], dexp)
    term = (ev * dexp).astype(jnp.bfloat16)          # [Pb, C*H]
    dmap_ref[0] += jax.lax.dot_general(
        eu.astype(jnp.bfloat16), term, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [W, C*H]


def _pad_p(x, Pp, value=0.0):
    P = x.shape[-1]
    if P == Pp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, Pp - P)]
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _point_sample_mm(maps_t, px, py, dims: Tuple[int, ...],
                     interpret: bool):
    out, _ = _ps_fwd(maps_t, px, py, dims, interpret)
    return out


def _pack_pts(px, py, Pp):
    """[BN, P] x2 -> [BN, nP, PBLK, 2]; padded points park far outside
    so every tent weight is zero."""
    BN = px.shape[0]
    px = _pad_p(px, Pp, value=-10.0)
    py = _pad_p(py, Pp, value=-10.0)
    return jnp.stack([px, py], axis=-1).reshape(
        BN, Pp // PBLK, PBLK, 2)


def _call_fwd(maps_t, px, py, dims, interpret):
    BN, H, W, C, P = dims
    nP = -(-P // PBLK)
    Pp = nP * PBLK
    pts = _pack_pts(px, py, Pp)
    kernel = functools.partial(_fwd_kernel, H=H, W=W, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(BN, nP),
        in_specs=[
            pl.BlockSpec((1, W, C * H), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, 1, PBLK, 2), lambda b, p: (b, p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PBLK, C), lambda b, p: (b, p, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (BN, Pp, C), jnp.float32, vma=union_vma(maps_t, px, py)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BN * Pp * W * C * H,
            bytes_accessed=BN * (W * C * H * 2 + Pp * (8 + 4 * C)),
            transcendentals=0),
        interpret=interpret,
    )(maps_t, pts)
    return out[:, :P]


def _ps_fwd(maps_t, px, py, dims, interpret):
    return _call_fwd(maps_t, px, py, dims, interpret), (px, py)


def _ps_bwd(dims, interpret, res, dout):
    BN, H, W, C, P = dims
    px, py = res
    nP = -(-P // PBLK)
    Pp = nP * PBLK
    pts = _pack_pts(px, py, Pp)
    dout_p = jnp.pad(dout.astype(jnp.float32),
                     ((0, 0), (0, Pp - P), (0, 0))) \
        if Pp != P else dout.astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, H=H, W=W, C=C)
    dmap_t = pl.pallas_call(
        kernel,
        grid=(BN, nP),
        in_specs=[
            pl.BlockSpec((1, 1, PBLK, 2), lambda b, p: (b, p, 0, 0)),
            pl.BlockSpec((1, PBLK, C), lambda b, p: (b, p, 0)),
        ],
        out_specs=pl.BlockSpec((1, W, C * H), lambda b, p: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (BN, W, C * H), jnp.float32,
            vma=union_vma(px, py, dout)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BN * Pp * W * C * H,
            bytes_accessed=BN * (W * C * H * 4 + Pp * (8 + 4 * C)),
            transcendentals=0),
        interpret=interpret,
    )(pts, dout_p)
    return dmap_t.astype(jnp.bfloat16), jnp.zeros_like(px), \
        jnp.zeros_like(py)


_point_sample_mm.defvjp(_ps_fwd, _ps_bwd)


def point_sample_mm(maps, px, py, interpret: bool | None = None):
    """MXU separable-tent bilinear sampling. Same contract as
    point_sample_ref: maps [B,N,H,W,C], px/py [B,N,P] in pixel
    coordinates; returns [B,N,P,C] f32."""
    B, N, H, W, C = maps.shape
    P = px.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # [B,N,H,W,C] -> [BN, W, C*H]: contraction layout (see docstring)
    maps_t = jnp.transpose(maps.reshape(B * N, H, W, C), (0, 2, 3, 1)) \
        .reshape(B * N, W, C * H).astype(jnp.bfloat16)
    dims = (B * N, H, W, C, P)
    out = _point_sample_mm(maps_t, px.reshape(B * N, P),
                           py.reshape(B * N, P), dims, interpret)
    return out.reshape(B, N, P, C)
