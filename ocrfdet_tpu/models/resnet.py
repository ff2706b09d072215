"""ResNet image backbone + CustomResNet BEV backbone (flax.linen).

TPU-native re-implementations of:
  * torchvision-style ResNet-18/50 used via mmdet (reference config
    configs/ocrfdet/ocrfdet.py:48-58; out_indices (0, 2, 3), the
    stage-0 feature doubling as the stereo feature).
  * `CustomResNet` BEV encoder backbone
    (mmdet3d/models/backbones/resnet.py:11-84): stacks of BasicBlocks
    with per-stage stride, returning the feature of every stage listed
    in backbone_output_ids.

Layout is NHWC (TPU-native); weights are stored in flax convention.
BatchNorm uses flax batch_stats (per-device statistics, matching the
reference's non-synced BN under DDP).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBN(nn.Module):
    """Conv + BN (+ relu).

    With `halo` (phase-3 row-block sharding, parallel/halo.py) the
    input is this shard's row block: boundary rows are exchanged over
    ICI before the conv (VALID row padding afterwards — exact vs the
    full grid) and BN statistics psum over the space axis so they are
    global-batch exact.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, halo=None):
        pad_c = self.dilation * (self.kernel // 2)
        if halo is not None and self.kernel > 1:
            from ..parallel.halo import conv_row_halo, halo_exchange_rows
            assert self.dilation == 1, "halo sharding: dilation=1 only"
            up, down = conv_row_halo(self.kernel, self.stride)
            x = halo_exchange_rows(x, halo, up, down)
            pad = [(0, 0), (pad_c, pad_c)]
        else:
            pad = [(pad_c,) * 2] * 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=pad, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=halo[0] if halo is not None else None)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """2-conv residual block (expansion 1)."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, halo=None):
        residual = x
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(
            x, train, halo)
        y = ConvBN(self.features, 3, 1, use_relu=False,
                   dtype=self.dtype)(y, train, halo)
        if residual.shape != y.shape:
            residual = ConvBN(self.features, 1, self.stride, use_relu=False,
                              dtype=self.dtype, name="downsample")(
                x, train, halo)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    """1-3-1 residual block (expansion 4), torchvision 'pytorch' style
    (stride on the 3x3)."""
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = ConvBN(self.features, 1, 1, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, self.stride, dtype=self.dtype)(y, train)
        y = ConvBN(self.features * 4, 1, 1, use_relu=False,
                   dtype=self.dtype)(y, train)
        if residual.shape != y.shape:
            residual = ConvBN(self.features * 4, 1, self.stride,
                              use_relu=False, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(residual + y)


_RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


class ResNet(nn.Module):
    """Image backbone. Returns the features of `out_indices` stages.

    Stage i has stride 4*2^i relative to the input. `stem_only=True`
    runs just stem+stage0 (the reference's extract_stereo_ref_feat,
    detectors/bevdet.py:600-628).
    """
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 2, 3)
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, stem_only: bool = False):
        block_cls, layers = _RESNET_SPECS[self.depth]
        x = ConvBN(64, 7, 2, dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for i, n_blocks in enumerate(layers):
            width = 64 * (2 ** i)
            cls = (nn.remat(block_cls, static_argnums=(2,))
                   if self.remat else block_cls)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = cls(width, stride, dtype=self.dtype,
                        name=f"layer{i + 1}_{j}")(x, train)
            if stem_only and i == 0:
                return x
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class CustomResNet(nn.Module):
    """BEV encoder backbone (reference CustomResNet).

    num_channels/stride/num_layer per stage; returns features for
    backbone_output_ids (default: all stages).
    """
    num_channels: Sequence[int]
    num_layer: Sequence[int] = (2, 2, 2)
    stride: Sequence[int] = (2, 2, 2)
    backbone_output_ids: Sequence[int] | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, halo=None):
        out_ids = (self.backbone_output_ids
                   if self.backbone_output_ids is not None
                   else range(len(self.num_channels)))
        feats = []
        for i, (ch, n, s) in enumerate(
                zip(self.num_channels, self.num_layer, self.stride)):
            for j in range(n):
                x = BasicBlock(ch, s if j == 0 else 1, dtype=self.dtype,
                               name=f"stage{i}_{j}")(x, train, halo)
            if i in out_ids:
                feats.append(x)
        return tuple(feats)
