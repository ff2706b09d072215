"""Row-block (spatial) sharding primitives for the BEV stack.

Phase-3 spatial scaling (SURVEY §2.7, the Grendel-GS pattern —
reference gaussian_renderer/__init__.py:170-516 splits rasterizer
workload across GPUs; here the BEV 128x128 grid and the rendered image
split into per-device row blocks over the `space` mesh axis, with
1-row halo exchange over ICI before every 3x3 conv).

Exactness argument (pinned by tests/test_parallel.py phase-3 tests):

  * `halo_exchange_rows` ships each block's boundary rows to its
    neighbours with `ppermute`. Destinations that receive nothing
    (the global top/bottom edge) are left ZERO by ppermute semantics —
    which is exactly the zero padding a SAME/pad-1 conv would have
    applied there. A 3x3/stride-1 conv on [halo_top, block, halo_bot]
    with VALID row padding therefore equals the full-grid conv's rows.
  * stride-2 convs with explicit pad 1 on an even grid read input rows
    2o-1..2o+1 for output row o; an even row offset per block means a
    (1, 0) halo reproduces them exactly.
  * BatchNorm statistics are computed on the exact local block (halos
    are consumed by the conv, never double-counted) and psum'd over
    `space` — global-batch statistics, exact.
  * align-corners bilinear row-resize is a banded linear map
    W[out_row, in_row] with support radius 1; each block applies the
    dynamic row/col slice of the (static) full matrix to its
    halo-extended block.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# A halo spec: (axis_name, n_shards). None = sharding inactive.
HaloSpec = Optional[Tuple[str, int]]


def halo_exchange_rows(x, spec: HaloSpec, up: int = 1, down: int = 1,
                       axis: int = 1):
    """Extend the local row block with `up` rows from the previous
    shard and `down` rows from the next (zeros at the global edges).

    x [..., Yl, ...] -> [..., up + Yl + down, ...] along `axis`.
    """
    name, S = spec
    parts = []
    if up:
        top = jax.lax.slice_in_dim(x, x.shape[axis] - up, x.shape[axis],
                                   axis=axis)
        # shard i receives shard i-1's bottom rows; shard 0 gets zeros
        top = jax.lax.ppermute(top, name,
                               [(i, i + 1) for i in range(S - 1)])
        parts.append(top)
    parts.append(x)
    if down:
        bot = jax.lax.slice_in_dim(x, 0, down, axis=axis)
        bot = jax.lax.ppermute(bot, name,
                               [(i + 1, i) for i in range(S - 1)])
        parts.append(bot)
    return jnp.concatenate(parts, axis=axis)


def conv_row_halo(kernel: int, stride: int) -> Tuple[int, int]:
    """(up, down) halo rows a row-blocked conv needs so that VALID row
    padding reproduces the full-grid explicit pad-(k//2) conv.

    stride 1, k 3: reads o-1..o+1            -> (1, 1)
    stride 2, k 3 (even grid, even offsets): reads 2o-1..2o+1 -> (1, 0)
    k 1: pointwise                            -> (0, 0)
    """
    if kernel == 1:
        return 0, 0
    assert kernel == 3, kernel
    if stride == 1:
        return 1, 1
    assert stride == 2, stride
    return 1, 0


def resize_rows_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Static align-corners bilinear row-interpolation matrix
    W [n_out, n_in] (matches fpn.resize_bilinear's row axis)."""
    if n_out == 1 or n_in == 1:
        return np.full((n_out, n_in), 1.0 / n_in, np.float32)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = (pos - lo).astype(np.float32)
    W = np.zeros((n_out, n_in), np.float32)
    W[np.arange(n_out), lo] += 1.0 - w_hi
    W[np.arange(n_out), hi] += w_hi
    return W


def resize_cols(x, n_out: int):
    """align-corners bilinear resize along axis 2 (width) as a static
    matrix contraction — unlike fpn.resize_bilinear this keeps
    align-corners semantics even when other axes are degenerate
    (a 1-row block would otherwise fall back to half-pixel resize)."""
    W = jnp.asarray(resize_rows_matrix(n_out, x.shape[2]))
    return jnp.einsum("ow,bhw...->bho...", W,
                      x.astype(jnp.float32)).astype(x.dtype)


def resize_rows_blocked(x, n_out_global: int, spec: HaloSpec):
    """align-corners row-resize of a row-blocked tensor.

    x [B, Yl_in, ...]: this shard's block of a global Y_in = S*Yl_in
    grid. Returns this shard's [B, Yl_out, ...] block of the global
    n_out_global-row resize. Exact vs resizing the full grid, because
    align-corners upsampling has support radius <= 1 input row: the
    halo-extended block covers every input row any of this block's
    output rows read. Requires n_out_global % S == 0.
    """
    name, S = spec
    Yl_in = x.shape[1]
    assert n_out_global % S == 0, (n_out_global, S)
    # the radius<=1 exactness argument only holds for UPSAMPLING; a
    # downsampling call would read input rows outside the 1-row halo
    # (they contribute zeros — silently wrong) — refuse it
    assert n_out_global >= Yl_in * S, \
        ("resize_rows_blocked is upsampling-only", n_out_global, Yl_in, S)
    Yl_out = n_out_global // S
    W = resize_rows_matrix(n_out_global, Yl_in * S)
    # pad one zero column each side: column j of Wp = input row j-1,
    # matching the halo-extended block's row coordinates
    Wp = jnp.asarray(np.pad(W, ((0, 0), (1, 1))))
    idx = jax.lax.axis_index(name)
    W_band = jax.lax.dynamic_slice(
        Wp, (idx * Yl_out, idx * Yl_in), (Yl_out, Yl_in + 2))
    xh = halo_exchange_rows(x, spec, 1, 1)
    return jnp.einsum("oi,bi...->bo...", W_band,
                      xh.astype(jnp.float32)).astype(x.dtype)


def slice_rows(t, spec: HaloSpec, axis: int = 1):
    """Take this shard's row block of a replicated full-grid tensor."""
    name, S = spec
    Y = t.shape[axis]
    assert Y % S == 0, (Y, S)
    yl = Y // S
    return jax.lax.dynamic_slice_in_dim(
        t, jax.lax.axis_index(name) * yl, yl, axis=axis)
