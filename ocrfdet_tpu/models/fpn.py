"""Image FPN + BEV FPN necks.

  * `CustomFPN`: the reference's single-output FPN over (C4, C5)
    (mmdet3d/models/necks/fpn.py:13-232; config out_ids=[0], i.e. only
    the stride-16 level gets an output conv). Lateral 1x1 convs (no
    norm/act, mmcv ConvModule defaults), top-down nearest upsample+add,
    3x3 output conv.
  * `FPN_LSS`: BEV neck (mmdet3d/models/necks/lss_fpn.py:11-100):
    bilinear-up(x4) the deepest BEV feature, concat with the shallow
    one, 2x (conv3x3+BN+ReLU), then x2 upsample + conv3x3 + conv1x1.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def resize_bilinear(x, out_hw, align_corners=True):
    """Bilinear resize for NHWC batches, torch align_corners semantics."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if align_corners and oh > 1 and ow > 1:
        # jax.image.resize has no align_corners; emulate via explicit
        # gather-lerp on the pixel grid.
        ys = jnp.linspace(0.0, H - 1.0, oh)
        xs = jnp.linspace(0.0, W - 1.0, ow)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        ty = (ys - y0)[None, :, None, None]
        tx = (xs - x0)[None, None, :, None]
        g00 = x[:, y0][:, :, x0]
        g01 = x[:, y0][:, :, x1]
        g10 = x[:, y1][:, :, x0]
        g11 = x[:, y1][:, :, x1]
        top = g00 * (1 - tx) + g01 * tx
        bot = g10 * (1 - tx) + g11 * tx
        return top * (1 - ty) + bot * ty
    return jax.image.resize(x, (B, oh, ow, C), method="bilinear")


class CustomFPN(nn.Module):
    out_channels: int = 256
    out_ids: Sequence[int] = (0,)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down pathway (nearest upsample, mmdet FPN default)
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(
                laterals[i],
                laterals[i - 1].shape[:3] + (self.out_channels,),
                method="nearest")
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv{i}")(laterals[i])
            for i in self.out_ids
        ]
        return outs[0] if len(outs) == 1 else tuple(outs)


class FPN_LSS(nn.Module):
    out_channels: int = 256
    scale_factor: int = 4
    extra_upsample: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_shallow, x_deep, train: bool = False, halo=None):
        """With `halo` (phase-3 row sharding, parallel/halo.py) both
        inputs are this shard's row blocks: the align-corners
        upsamples become column-resize + blocked row-resize (bilinear
        is separable) and the 3x3 convs exchange 1-row halos."""
        cf = 2 if self.extra_upsample else 1

        def conv_bn(x, ch, name_c, name_b, kernel=3):
            if halo is not None and kernel > 1:
                from ..parallel.halo import halo_exchange_rows
                x = halo_exchange_rows(x, halo, 1, 1)
                pad = [(0, 0), (1, 1)]
            else:
                pad = kernel // 2
            x = nn.Conv(ch, (kernel, kernel), padding=pad, use_bias=False,
                        dtype=self.dtype, name=name_c)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=name_b,
                             axis_name=halo[0] if halo else None)(x)
            return nn.relu(x)

        def up_rows(x, out_hw_local):
            if halo is None:
                return resize_bilinear(x, out_hw_local, align_corners=True)
            from ..parallel.halo import resize_cols, resize_rows_blocked
            x = resize_cols(x, out_hw_local[1])
            return resize_rows_blocked(x, out_hw_local[0] * halo[1], halo)

        up = up_rows(x_deep, x_shallow.shape[1:3])
        x = jnp.concatenate([x_shallow, up], axis=-1)
        for k in range(2):
            x = conv_bn(x, self.out_channels * cf, f"conv{k}", f"bn{k}")
        if self.extra_upsample:
            oh = x.shape[1] * self.extra_upsample
            ow = x.shape[2] * self.extra_upsample
            x = up_rows(x, (oh, ow))
            x = conv_bn(x, self.out_channels, "up_conv", "up_bn")
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="out_conv")(x)
        return x
