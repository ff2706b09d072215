"""Height-aware Opacity Attention components.

  * HeightAttention: per-height-group (4 groups) max-pool channel
    attention (view_transformer_ocrf.py:421-461)
  * OpacityVoxelToBEV: small U-Net with HeightAttention at every scale
    collapsing the 13 height slices to one BEV opacity logit map
    (:463-518)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class HeightAttention(nn.Module):
    """Channels split into 4 height groups; each gets its own
    maxpool->conv1x1 bottleneck; sigmoid-gated."""
    ratio: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gs = c // 4
        outs = []
        for gidx in range(4):
            grp = x[..., gidx * gs:(gidx + 1) * gs]
            y = jnp.max(grp, axis=(1, 2), keepdims=True)
            mid = max(1, gs // self.ratio)
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"g{gidx}_c1")(y)
            y = nn.relu(y)
            y = nn.Conv(gs, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"g{gidx}_c2")(y)
            outs.append(y)
        return jax.nn.sigmoid(jnp.concatenate(outs, axis=-1))


class _ConvBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                    dtype=self.dtype, name="dw")(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class OpacityVoxelToBEV(nn.Module):
    """[B, H, W, 13] opacity volume (+4-ch positional encoding) ->
    [B, H, W, 1] BEV opacity logit."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position, train: bool):
        enc1 = _ConvBlock(4, self.dtype, name="enc1")(x, train) + position
        enc1 = HeightAttention(dtype=self.dtype, name="ca1")(enc1) * enc1
        p1 = nn.max_pool(enc1, (2, 2), strides=(2, 2))
        enc2 = _ConvBlock(8, self.dtype, name="enc2")(p1, train)
        enc2 = HeightAttention(dtype=self.dtype, name="ca2")(enc2) * enc2
        p2 = nn.max_pool(enc2, (2, 2), strides=(2, 2))

        bott = _ConvBlock(16, self.dtype, name="bottleneck")(p2, train)
        bott = HeightAttention(dtype=self.dtype, name="ca_b")(bott) * bott

        d2 = nn.ConvTranspose(8, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up2")(bott)
        d2 = jnp.concatenate([d2, enc2], axis=-1)
        d2 = _ConvBlock(8, self.dtype, name="dec2")(d2, train)
        d2 = HeightAttention(dtype=self.dtype, name="ca_d2")(d2) * d2

        d1 = nn.ConvTranspose(4, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up1")(d2)
        d1 = jnp.concatenate([d1, enc1], axis=-1)
        d1 = _ConvBlock(4, self.dtype, name="dec1")(d1, train)
        d1 = HeightAttention(dtype=self.dtype, name="ca_d1")(d1) * d1

        return nn.Conv(1, (1, 1), dtype=self.dtype, name="out")(d1)
