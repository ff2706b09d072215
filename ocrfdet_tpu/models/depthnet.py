"""Camera-aware depth/semantic/context head (DepthNet).

Re-implements the reference DepthNet (models/necks/view_transformer.py:
464-625): a reduce conv, camera-parameter SE modulation (27-D MLP ->
per-channel sigmoid gates) for both the context and depth towers, a
stereo cost volume from the previous frame's stem features, three
BasicBlocks + ASPP, and a final 1x1 producing D+2 depth/semantic logits;
context channels are produced by a separate 1x1.

The stereo cost volume itself lives in ops/cost_volume.py (Pallas MXU
kernel + gather mirror) and is re-exported here for compatibility.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, ConvBN
from ..ops.cost_volume import stereo_cost_volume  # noqa: F401 (re-export)

Dtype = Any


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class SELayer(nn.Module):
    """x * sigmoid(conv_expand(relu(conv_reduce(gate))))."""
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gate):
        g = nn.Dense(self.channels, dtype=self.dtype)(gate)
        g = nn.relu(g)
        g = nn.Dense(self.channels, dtype=self.dtype)(g)
        return x * jax.nn.sigmoid(g)[:, None, None, :]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (view_transformer.py:349-421):
    dilations (1, 6, 12, 18) + global pooling branch, concat -> 1x1."""
    mid_channels: int
    out_channels: int
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        branches = [
            ConvBN(self.mid_channels, 1, dtype=self.dtype)(x, train),
            ConvBN(self.mid_channels, 3, dilation=6, dtype=self.dtype)(x, train),
            ConvBN(self.mid_channels, 3, dilation=12, dtype=self.dtype)(x, train),
            ConvBN(self.mid_channels, 3, dilation=18, dtype=self.dtype)(x, train),
        ]
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                     dtype=self.dtype)(gp)
        gp = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype)(gp)
        gp = nn.relu(gp)
        gp = jnp.broadcast_to(gp, x.shape[:3] + (self.mid_channels,))
        y = jnp.concatenate(branches + [gp], axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        # reference ends with Dropout(0.5) (view_transformer.py:395,412);
        # applied only when a 'dropout' rng is threaded (the sharded
        # train step does; plain apply() calls stay deterministic).
        if self.dropout > 0 and train and self.has_rng("dropout"):
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        return y


class DepthNet(nn.Module):
    mid_channels: int
    context_channels: int
    depth_channels: int        # D + 2 (depth bins + 2 semantic classes)
    stereo: bool = True
    use_aspp: bool = True
    aspp_mid_channels: int = 96
    aspp_dropout: float = 0.5
    cv_downsample: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, cost_volume=None, train: bool = False):
        """x [BN, H, W, C_in]; mlp_input [BN, 27];
        cost_volume [BN, Hcv, Wcv, D] (softmaxed, stride cv_downsample)
        or None. Returns [BN, H, W, depth_ch + context_ch].
        """
        mlp_input = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="mlp_bn")(mlp_input)
        x = ConvBN(self.mid_channels, 3, dtype=self.dtype,
                   name="reduce_conv")(x, train)

        ctx_gate = Mlp(self.mid_channels, self.mid_channels,
                       dtype=self.dtype, name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, dtype=self.dtype,
                          name="context_se")(x, ctx_gate)
        context = nn.Conv(self.context_channels, (1, 1), dtype=self.dtype,
                          name="context_conv")(context)

        d_gate = Mlp(self.mid_channels, self.mid_channels,
                     dtype=self.dtype, name="depth_mlp")(mlp_input)
        depth = SELayer(self.mid_channels, dtype=self.dtype,
                        name="depth_se")(x, d_gate)

        if self.stereo:
            D = self.depth_channels - 2
            ratio = 16 // self.cv_downsample   # 4 -> strides (2,2) etc
            s0 = 2 if ratio >= 2 else 1
            s1 = 2 if ratio >= 4 else 1
            if cost_volume is None:
                # first frame has no previous features: zero volume at
                # the cv resolution (reference :605-612)
                BN_, H, W, _ = x.shape
                cost_volume = jnp.zeros(
                    (BN_, H * ratio, W * ratio, D), dtype=x.dtype)
            # cost_volumn_net (reference :614-616): two conv3x3+BN
            # bringing the cv-resolution volume onto the /16 grid
            cv = cost_volume
            for k, s in enumerate((s0, s1)):
                cv = nn.Conv(D, (3, 3), strides=(s, s), padding=1,
                             dtype=self.dtype, name=f"cv_conv{k}")(cv)
                cv = nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, epsilon=1e-5,
                                  dtype=self.dtype, name=f"cv_bn{k}")(cv)
            depth = jnp.concatenate([depth, cv], axis=-1)
            # 1x1 downsample projection for the first BasicBlock residual
        depth = BasicBlock(self.mid_channels, 1, dtype=self.dtype,
                           name="depth_block0")(depth, train)
        depth = BasicBlock(self.mid_channels, 1, dtype=self.dtype,
                           name="depth_block1")(depth, train)
        depth = BasicBlock(self.mid_channels, 1, dtype=self.dtype,
                           name="depth_block2")(depth, train)
        if self.use_aspp:
            depth = ASPP(self.aspp_mid_channels, self.mid_channels,
                         dropout=self.aspp_dropout,
                         dtype=self.dtype, name="aspp")(depth, train)
        depth = nn.Conv(self.depth_channels, (1, 1), dtype=self.dtype,
                        name="depth_pred")(depth)
        return jnp.concatenate([depth, context], axis=-1)
