"""Bilinear grid sampling (the torch.nn.functional.grid_sample ops the
reference leans on: stereo cost-volume warp view_transformer.py:568-596,
voxel colouring view_transformer_ocrf.py:924-942, deformable attention
ops/cross_attention_2d.py, temporal BEV alignment detectors/bevdet.py:372).

Implemented as gather + lerp in pure XLA (static shapes, fused by the
compiler). align_corners semantics match torch.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img, x, y, padding_zero=True):
    """Sample img [H, W, C] at continuous pixel coords x, y [...].

    Out-of-bounds reads contribute 0 when padding_zero, else clamp.
    Returns [..., C].
    """
    H, W = img.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi, wt):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        v = img[yc, xc]
        if padding_zero:
            inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
            wt = jnp.where(inb, wt, 0.0)
        # keep the image dtype (bf16 inputs must not upcast the big
        # tap tensors to f32)
        return v * wt[..., None].astype(img.dtype)

    out = (tap(x0i, y0i, (1 - tx) * (1 - ty))
           + tap(x0i + 1, y0i, tx * (1 - ty))
           + tap(x0i, y0i + 1, (1 - tx) * ty)
           + tap(x0i + 1, y0i + 1, tx * ty))
    return out


def grid_sample_2d(img, grid, align_corners=True, padding_zero=True):
    """torch.grid_sample equivalent for one image.

    img [H, W, C]; grid [..., 2] in [-1, 1] (x, y order).
    """
    H, W = img.shape[:2]
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return bilinear_sample(img, x, y, padding_zero=padding_zero)
