"""Single-head deformable cross-attention (lucidrains-style).

Re-implements ops/cross_attention_2d.py:93-220 for the HOA fusion of
opacity (query) and back-projected alpha (key/value) maps: a conv
offset network predicts sampling positions on a downsampled grid; k/v
are bilinearly sampled there; full-resolution queries attend over the
sampled set with a SwinV2 continuous positional bias (CPB).

The OcRF config uses dim=13, 1 head, 1 offset group, head dim 8,
downsample 4, offset kernel 6, offset scale 4.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample_2d

Dtype = Any


class CPB(nn.Module):
    """Continuous positional bias MLP on log-signed relative coords."""
    dim: int
    out: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, grid_q, grid_kv):
        """grid_q [I, 2] (normalised query coords), grid_kv [B, J, 2].
        Returns bias [B, I, J]."""
        pos = grid_q[None, :, None, :] - grid_kv[:, None, :, :]
        bias = jnp.sign(pos) * jnp.log1p(jnp.abs(pos))
        bias = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="l0")(bias))
        bias = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="l1")(bias))
        bias = nn.Dense(self.out, dtype=self.dtype, name="l2")(bias)
        return bias                     # [B, I, J, out]


class DeformableAttention2D(nn.Module):
    dim: int
    dim_head: int = 8
    heads: int = 1
    downsample_factor: int = 4
    offset_scale: float = 4.0
    offset_kernel_size: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_kv, train: bool = False):
        """x_q, x_kv: [B, H, W, dim] -> [B, H, W, dim]."""
        B, H, W, _ = x_q.shape
        inner = self.dim_head * self.heads
        ds = self.downsample_factor
        k = self.offset_kernel_size

        q = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype,
                    name="to_q")(x_q)

        # offset network on (grouped==full) queries, stride=downsample
        off = nn.Conv(inner, (k, k), strides=(ds, ds),
                      padding=(k - ds) // 2, feature_group_count=inner,
                      dtype=self.dtype, name="off_dw")(q)
        off = nn.gelu(off)
        off = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                      name="off_pw")(off)
        off = jnp.tanh(off) * self.offset_scale       # [B, h', w', 2]
        hh, ww = off.shape[1:3]

        gx = jnp.arange(ww, dtype=jnp.float32)
        gy = jnp.arange(hh, dtype=jnp.float32)
        base = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)  # [h',w',2]
        vgrid = base[None] + off
        # normalise over the DOWNSAMPLED grid extent to [-1, 1]
        norm = jnp.array([max(ww - 1, 1), max(hh - 1, 1)],
                         dtype=jnp.float32)
        vgrid_n = 2.0 * vgrid / norm - 1.0

        # sample kv at offset positions (align_corners=False like torch)
        def sample(im, gr):
            return grid_sample_2d(im, gr, align_corners=False)
        kv = jax.vmap(sample)(x_kv, vgrid_n)          # [B, h', w', dim]

        kk = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype,
                     name="to_k")(kv)
        vv = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype,
                     name="to_v")(kv)

        scale = self.dim_head ** -0.5
        qf = (q * scale).reshape(B, H * W, self.heads, self.dim_head)
        kf = kk.reshape(B, hh * ww, self.heads, self.dim_head)
        vf = vv.reshape(B, hh * ww, self.heads, self.dim_head)
        sim = jnp.einsum('bihd,bjhd->bhij', qf, kf)

        # CPB on normalised coordinates
        qgx = jnp.arange(W, dtype=jnp.float32)
        qgy = jnp.arange(H, dtype=jnp.float32)
        qgrid = jnp.stack(jnp.meshgrid(qgx, qgy, indexing="xy"), -1)
        qnorm = jnp.array([max(W - 1, 1), max(H - 1, 1)], dtype=jnp.float32)
        qgrid_n = (2.0 * qgrid / qnorm - 1.0).reshape(H * W, 2)
        bias = CPB(max(1, self.dim // 4), out=self.heads, dtype=self.dtype,
                   name="cpb")(qgrid_n, vgrid_n.reshape(B, hh * ww, 2))
        sim = sim + jnp.moveaxis(bias, -1, 1)         # [B, h, I, J]

        sim = sim - jax.lax.stop_gradient(
            jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum('bhij,bjhd->bihd', attn, vf)
        out = out.reshape(B, H, W, inner)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                       name="to_out")(out)
