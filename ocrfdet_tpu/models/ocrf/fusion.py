"""BEV fusion / attention / mask modules of the OcRF transformer.

Re-implementations of view_transformer_ocrf.py:36-270:
  MS_CAM (local+global channel attention), DualFeatFusion (channel
  gate between LSS and HT features), ChannelAttention/SpatialAttention/
  ResCBAMBlock, ProbNet (BEV foreground mask logit), BEVGeomAttention,
  OpacityMask gate, LearnedPositionalEncoding (mmdet-style), and the
  bev centerness weight.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class MS_CAM(nn.Module):
    out_channels: int
    r: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inter = max(1, x.shape[-1] // self.r)

        def branch(y, name):
            y = nn.Conv(inter, (1, 1), dtype=self.dtype,
                        name=f"{name}_c1")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"{name}_bn1")(y)
            y = nn.relu(y)
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name=f"{name}_c2")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"{name}_bn2")(y)
            return y

        xl = branch(x, "local")
        xg = branch(jnp.mean(x, axis=(1, 2), keepdims=True), "global")
        return jax.nn.sigmoid(xl + xg)


class DualFeatFusion(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        g = MS_CAM(self.out_channels, dtype=self.dtype,
                   name="ca")(jnp.concatenate([x1, x2], -1), train)
        return g * x1 + (1.0 - g) * x2


class ChannelAttention(nn.Module):
    out_channels: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mid = max(1, c // self.ratio)
        fc1 = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fc1")
        fc2 = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="fc2")

        def fc(y):
            return fc2(nn.relu(fc1(y)))

        avg = fc(jnp.mean(x, axis=(1, 2), keepdims=True))
        mx = fc(jnp.max(x, axis=(1, 2), keepdims=True))
        return jax.nn.sigmoid(avg + mx)


class SpatialAttention(nn.Module):
    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], -1)
        y = nn.Conv(1, (self.kernel, self.kernel), padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype)(y)
        return jax.nn.sigmoid(y)


class ResCBAMBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(y)
        y = ChannelAttention(self.channels, dtype=self.dtype,
                             name="ca")(y) * y
        y = SpatialAttention(dtype=self.dtype, name="sa")(y) * y
        return nn.relu(x + y)


class ProbNet(nn.Module):
    """BEV foreground-probability head (logit map)."""
    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.in_channels // 2
        y = nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype,
                    name="base_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="base_bn")(y)
        y = nn.relu(y)
        y = ResCBAMBlock(mid, dtype=self.dtype, name="prob_conv")(y, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="mask_net")(y)


class BEVGeomAttention(nn.Module):
    """sigmoid(conv(avg||max) + mask_logit) spatial gate."""
    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bev_prob_logit):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], -1)
        y = nn.Conv(1, (self.kernel, self.kernel), padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype)(y)
        return jax.nn.sigmoid(y + bev_prob_logit)


class OpacityMask(nn.Module):
    """Same gate structure conditioned on the HOA opacity logit
    (reference ObatinOpacityMask)."""
    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, opacity_bev):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], -1)
        y = nn.Conv(1, (self.kernel, self.kernel), padding=self.kernel // 2,
                    use_bias=False, dtype=self.dtype)(y)
        return jax.nn.sigmoid(y + opacity_bev)


class LearnedPositionalEncoding(nn.Module):
    """mmdet LearnedPositionalEncoding: row/col embedding tables
    concatenated to 2*num_feats channels over an (h, w) map."""
    num_feats: int
    h: int
    w: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: int):
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.h, self.num_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.w, self.num_feats))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, :], (self.h, self.w,
                                               self.num_feats)),
            jnp.broadcast_to(row[:, None, :], (self.h, self.w,
                                               self.num_feats)),
        ], axis=-1)
        return jnp.broadcast_to(pos[None],
                                (batch,) + pos.shape).astype(self.dtype)


def bev_centerness_weight(nx: int, ny: int) -> np.ndarray:
    """sqrt-normalised distance-from-centre + 1 (reference :244-251).

    The reference ignores ny (meshgrids nx twice) — identical on the
    square flagship grid; corrected here for non-square grids."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    gx = (xs - nx // 2) / (nx // 2)
    gy = (ys - ny // 2) / (ny // 2)
    return np.sqrt((gx ** 2 + gy ** 2) / 2.0) + 1.0
