"""HT (height-trick) branch pooling as an MXU one-hot matmul.

The reference pools image features at the nearest feature pixel / depth
bin of 13 height points per BEV pillar via bev_pool_v2 with BEV-major
ranks (fast_sample_prepare / fast_sampling, view_transformer_ocrf.py:
758-852).  The round-1..3 TPU formulation was a per-camera batched
gather (`take_along_axis`): ~2.6 M row descriptors per frame forward
plus the matching scatter-adds backward — the round-3 profile put this
family (with the voxel-alpha sampling) at ~60% of the step.

TPU redesign (round 4): the gather is a one-hot matrix product.  For a
block of Q pillars and the Zh=13 heights, the weighted pool

    out[q, c] = sum_z  depth[pix(z,q), di(z,q)] * valid * ctx[pix(z,q), c]

is computed per camera with three dense stages that all run on the MXU
(the whole feature map lives in VMEM — h*w=704 pixels at flagship):

  1. per height z: one-hot U_z[q, hw] = (pix(z,q) == iota_hw)  (VPU)
     tmp_z = U_z @ dep_flat              [Q, D]   (MXU)
  2. w_z[q] = tmp_z[q, di(z,q)] * valid  (VPU one-hot select over D)
     A     += w_z[:, None] * U_z         [Q, hw]  (VPU accumulate)
  3. out   += A @ ctx_flat               [Q, C]   (MXU), summed over
     cameras by revisiting the output block across the camera grid dim.

Cost: ~0.9 TFLOP/step forward at flagship (B2 N6 2 frames) — burned
MXU arithmetic in exchange for zero gather descriptors, the same trade
as ops/cost_volume.py.  The backward kernel mirrors the linearity:
dctx = A^T @ dout, ddep = U_z^T @ (onehot_di * (feat_z . dout)), with
feat_z = U_z @ ctx recomputed in-kernel (nothing is stashed).

The gather formulation is kept as `ht_pool_ref` — the off-TPU mirror
and the numerical reference for tests/test_ht_pool.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vma import union_vma

QBLK = 256          # pillars per grid step


def _indices(depth_shape, uvd, valid):
    """Nearest feature pixel / depth bin (reference round + clamp,
    fast_sample_prepare :785-852). uvd [B,N,Zh,Nq,3] normalised."""
    B, N, h, w, D = depth_shape
    ui = jnp.clip(jnp.round(uvd[..., 0] * w).astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(jnp.round(uvd[..., 1] * h).astype(jnp.int32), 0, h - 1)
    di = jnp.clip(jnp.round(uvd[..., 2] * D).astype(jnp.int32), 0, D - 1)
    pix = vi * w + ui
    wv = valid.astype(jnp.float32)
    return pix, di, wv


def ht_pool_ref(depth, context, uvd, valid):
    """Gather formulation (the round-3 path): one big gather per
    camera. depth [B,N,h,w,D]; context [B,N,h,w,C]. Returns
    [B, Nq, C] summed over local cameras."""
    B, N, h, w, D = depth.shape
    C = context.shape[-1]
    Zh, Nq = uvd.shape[2], uvd.shape[3]
    pix, di, wv = _indices(depth.shape, uvd, valid)
    ctx_flat = context.reshape(B, N, h * w, C)
    dep_flat = depth.reshape(B, N, h * w * D)
    acc = jnp.zeros((B, Nq, C), dtype=context.dtype)
    for n in range(N):
        p = pix[:, n].reshape(B, Zh * Nq)
        dflat = p * D + di[:, n].reshape(B, Zh * Nq)
        wgt = jnp.take_along_axis(dep_flat[:, n], dflat, axis=1)
        feat = jnp.take_along_axis(ctx_flat[:, n], p[..., None], axis=1)
        wgt = wgt * wv[:, n].reshape(B, Zh * Nq).astype(wgt.dtype)
        contrib = (feat * wgt[..., None].astype(feat.dtype)) \
            .reshape(B, Zh, Nq, C)
        acc = acc + jnp.sum(contrib, axis=1)
    return acc


# --------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------

def _fwd_kernel(dep_ref, ctx_ref, pix_ref, di_ref, wv_ref, out_ref, *,
                Zh: int, HW: int, D: int, C: int):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    dep = dep_ref[0, 0]                              # [HW, D] bf16
    ctx = ctx_ref[0, 0]                              # [HW, C] bf16
    pix = pix_ref[0, 0]                              # [Zh, Q] i32
    di = di_ref[0, 0]
    wv = wv_ref[0, 0]                                # [Zh, Q] f32
    Q = pix.shape[1]
    hw_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, HW), 1)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, D), 1)

    A = jnp.zeros((Q, HW), jnp.float32)
    for z in range(Zh):
        U = (pix[z][:, None] == hw_iota).astype(jnp.bfloat16)  # [Q,HW]
        tmp = jnp.dot(U, dep, preferred_element_type=jnp.float32)
        sel = di[z][:, None] == d_iota
        w = jnp.sum(jnp.where(sel, tmp, 0.0), axis=1) * wv[z]  # [Q]
        A = A + w[:, None] * U.astype(jnp.float32)
    out_ref[0] += jnp.dot(A.astype(jnp.bfloat16), ctx,
                          preferred_element_type=jnp.float32)


def _bwd_kernel(dep_ref, ctx_ref, pix_ref, di_ref, wv_ref, dout_ref,
                ddep_ref, dctx_ref, *, Zh: int, HW: int, D: int, C: int):
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _zero():
        ddep_ref[...] = jnp.zeros_like(ddep_ref)
        dctx_ref[...] = jnp.zeros_like(dctx_ref)

    dep = dep_ref[0, 0]                              # [HW, D] bf16
    ctx = ctx_ref[0, 0]                              # [HW, C] bf16
    pix = pix_ref[0, 0]                              # [Zh, Q] i32
    di = di_ref[0, 0]
    wv = wv_ref[0, 0]
    dout = dout_ref[0]                               # [Q, C] f32
    dout_b = dout.astype(jnp.bfloat16)
    Q = pix.shape[1]
    hw_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, HW), 1)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, D), 1)

    A = jnp.zeros((Q, HW), jnp.float32)
    ddep_acc = jnp.zeros((HW, D), jnp.float32)
    for z in range(Zh):
        U = (pix[z][:, None] == hw_iota).astype(jnp.bfloat16)
        tmp = jnp.dot(U, dep, preferred_element_type=jnp.float32)
        sel = di[z][:, None] == d_iota
        w = jnp.sum(jnp.where(sel, tmp, 0.0), axis=1) * wv[z]
        A = A + w[:, None] * U.astype(jnp.float32)
        # dw[q] = <ctx[pix], dout[q]>, masked by valid
        feat = jnp.dot(U, ctx, preferred_element_type=jnp.float32)
        dw = jnp.sum(feat * dout, axis=1) * wv[z]                # [Q]
        Wd = jnp.where(sel, dw[:, None], 0.0).astype(jnp.bfloat16)
        ddep_acc += jax.lax.dot_general(
            U, Wd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [HW,D]
    ddep_ref[0, 0] += ddep_acc
    dctx_ref[0, 0] += jax.lax.dot_general(
        A.astype(jnp.bfloat16), dout_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [HW,C]


def _pad_q(x, Qp):
    """Pad the trailing Nq axis to Qp (constant 0)."""
    Nq = x.shape[-1]
    if Nq == Qp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, Qp - Nq)]
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ht_pool_mm(dep, ctx, pix, di, wv, dims: Tuple[int, ...],
                interpret: bool):
    out, _ = _ht_fwd(dep, ctx, pix, di, wv, dims, interpret)
    return out


def _call_fwd(dep, ctx, pix, di, wv, dims, interpret):
    B, N, HW, D, C, Zh, Nq = dims
    nQ = -(-Nq // QBLK)
    Qp = nQ * QBLK
    pix = _pad_q(pix, Qp)
    di = _pad_q(di, Qp)
    wv = _pad_q(wv, Qp)
    kernel = functools.partial(_fwd_kernel, Zh=Zh, HW=HW, D=D, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B, nQ, N),
        in_specs=[
            pl.BlockSpec((1, 1, HW, D), lambda b, q, n: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, HW, C), lambda b, q, n: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Zh, QBLK),
                         lambda b, q, n: (b, n, 0, q)),
            pl.BlockSpec((1, 1, Zh, QBLK),
                         lambda b, q, n: (b, n, 0, q)),
            pl.BlockSpec((1, 1, Zh, QBLK),
                         lambda b, q, n: (b, n, 0, q)),
        ],
        out_specs=pl.BlockSpec((1, QBLK, C), lambda b, q, n: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (B, Qp, C), jnp.float32,
            vma=union_vma(dep, ctx, pix, di, wv)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * Zh * Qp * HW * (D + C // Zh),
            bytes_accessed=B * N * (HW * (D + C) * 2 + Zh * Qp * 12),
            transcendentals=0),
        interpret=interpret,
    )(dep, ctx, pix, di, wv)
    return out[:, :Nq]


def _ht_fwd(dep, ctx, pix, di, wv, dims, interpret):
    out = _call_fwd(dep, ctx, pix, di, wv, dims, interpret)
    return out, (dep, ctx, pix, di, wv)


def _ht_bwd(dims, interpret, res, dout):
    B, N, HW, D, C, Zh, Nq = dims
    dep, ctx, pix, di, wv = res
    nQ = -(-Nq // QBLK)
    Qp = nQ * QBLK
    pix = _pad_q(pix, Qp)
    di = _pad_q(di, Qp)
    wv = _pad_q(wv, Qp)
    dout_p = jnp.pad(dout.astype(jnp.float32),
                     ((0, 0), (0, Qp - Nq), (0, 0))) \
        if Qp != Nq else dout.astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, Zh=Zh, HW=HW, D=D, C=C)
    vma = union_vma(dep, ctx, pix, di, wv, dout)
    ddep, dctx = pl.pallas_call(
        kernel,
        grid=(B, N, nQ),
        in_specs=[
            pl.BlockSpec((1, 1, HW, D), lambda b, n, q: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, HW, C), lambda b, n, q: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Zh, QBLK),
                         lambda b, n, q: (b, n, 0, q)),
            pl.BlockSpec((1, 1, Zh, QBLK),
                         lambda b, n, q: (b, n, 0, q)),
            pl.BlockSpec((1, 1, Zh, QBLK),
                         lambda b, n, q: (b, n, 0, q)),
            pl.BlockSpec((1, QBLK, C), lambda b, n, q: (b, q, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, HW, D), lambda b, n, q: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, HW, C), lambda b, n, q: (b, n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, HW, D), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((B, N, HW, C), jnp.float32, vma=vma),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * Zh * Qp * HW * (D + C),
            bytes_accessed=B * N * (HW * (D + C) * 6 + Zh * Qp * 12),
            transcendentals=0),
        interpret=interpret,
    )(dep, ctx, pix, di, wv, dout_p)
    f0 = jax.dtypes.float0
    zi = lambda a: np.zeros(a.shape, f0)
    return (ddep.astype(dep.dtype), dctx.astype(ctx.dtype),
            zi(pix), zi(di), jnp.zeros_like(wv))


_ht_pool_mm.defvjp(_ht_fwd, _ht_bwd)


def ht_pool_mm(depth, context, uvd, valid,
               interpret: bool | None = None):
    """MXU one-hot matmul HT pool. Same contract as ht_pool_ref:
    depth [B,N,h,w,D], context [B,N,h,w,C], uvd/valid from
    geometry.frustum.project_points; returns [B, Nq, C] f32 summed
    over the (local) camera axis."""
    B, N, h, w, D = depth.shape
    C = context.shape[-1]
    Zh, Nq = uvd.shape[2], uvd.shape[3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pix, di, wv = _indices(depth.shape, uvd, valid)
    dep_flat = depth.reshape(B, N, h * w, D).astype(jnp.bfloat16)
    ctx_flat = context.reshape(B, N, h * w, C).astype(jnp.bfloat16)
    dims = (B, N, h * w, D, C, Zh, Nq)
    out = _ht_pool_mm(dep_flat, ctx_flat, pix, di, wv, dims, interpret)
    return out.astype(context.dtype)
