"""CenterPoint-style detection head.

Re-implements the reference CenterHead + SeparateHead
(models/dense_heads/centerpoint_head.py:19-123, 244-363): a shared
3x3 conv then, per task, independent small conv towers for
(reg 2, height 1, dim 3, rot 2, vel 2, heatmap K_t).

Targets are generated host-side (core/targets.py) because they depend
only on GT boxes; the loss (losses/center.py) consumes the padded
target tensors inside the jitted step.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import CenterHeadConfig
from .resnet import ConvBN

Dtype = Any


class SeparateHead(nn.Module):
    heads: Tuple[Tuple[str, int], ...]   # ((name, out_channels), ...)
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    num_convs: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, halo=None):
        out = {}
        k = self.final_kernel
        for name, ch in self.heads:
            y = x
            for i in range(self.num_convs - 1):
                y = ConvBN(self.head_conv, k, dtype=self.dtype,
                           name=f"{name}_conv{i}")(y, train, halo)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if name == "heatmap"
                         else nn.initializers.zeros_init())
            if halo is not None and k > 1:
                from ..parallel.halo import halo_exchange_rows
                y = halo_exchange_rows(y, halo, k // 2, k // 2)
                pad = [(0, 0), (k // 2, k // 2)]
            else:
                pad = k // 2
            y = nn.Conv(ch, (k, k), padding=pad, use_bias=True,
                        bias_init=bias_init, dtype=self.dtype,
                        name=f"{name}_out")(y)
            out[name] = y
        return out


class CenterHead(nn.Module):
    cfg: CenterHeadConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 halo=None) -> List[Dict[str, jnp.ndarray]]:
        """x: [B, H, W, C] BEV feature. Returns one dict per task with
        channel-last maps; heatmap is raw logits. With `halo` x is this
        shard's BEV row block (parallel/halo.py)."""
        x = ConvBN(self.cfg.share_conv_channel, 3, dtype=self.dtype,
                   name="shared_conv")(x, train, halo)
        outs = []
        for t, task in enumerate(self.cfg.tasks):
            heads = self.cfg.common_heads + (
                ("heatmap", len(task.class_names)),)
            outs.append(SeparateHead(
                heads=heads,
                head_conv=self.cfg.head_conv_channel,
                final_kernel=self.cfg.final_kernel,
                init_bias=self.cfg.init_bias,
                num_convs=self.cfg.num_head_convs,
                dtype=self.dtype,
                name=f"task{t}")(x, train, halo))
        return outs
