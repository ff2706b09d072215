"""VGGT Aggregator (flax) — frozen geometry teacher for GeoEnhDet.

Re-implements the facebookresearch/vggt Aggregator used by the
reference's OcRFDet4DVGGT (mmdet3d/models/backbones/vggt/vggt/models/
aggregator.py:25-305): conv patch embed, camera + register tokens
(separate first-frame/other-frame embeddings), 2D rotary position
embedding on patch tokens, and `depth` pairs of alternating
frame-attention (tokens within each frame) and global-attention
(tokens across all frames) transformer blocks with QK-norm and layer
scale. Returns the concatenated [frame ‖ global] 2*dim token stream of
the final layer, as consumed by the distillation head
(detectors/ocrfdet_vggt.py:243-268 uses aggregated_tokens_list[-1]).

The flagship teacher is VGGT-1B (dim 1024, depth 24, 16 heads); sizes
are configurable so tests run a miniature. `load_torch_weights`
converts the released torch checkpoint when present (no torch import
unless called).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def rope_2d_freqs(dim: int, positions: jnp.ndarray, base: float = 100.0):
    """2D axial RoPE: half the head dim rotates with y, half with x.

    positions [T, 2] (y, x) -> (cos [T, dim], sin [T, dim]).
    """
    quarter = dim // 4
    freqs = 1.0 / (base ** (jnp.arange(quarter) / quarter))
    ay = positions[:, 0:1] * freqs[None]         # [T, dim/4]
    ax = positions[:, 1:2] * freqs[None]
    ang = jnp.concatenate([ay, ax], axis=-1)     # [T, dim/2]
    ang = jnp.concatenate([ang, ang], axis=-1)   # [T, dim]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """x [..., T, d]; rotate-half convention."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xr = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + xr * sin


class Attention(nn.Module):
    dim: int
    num_heads: int
    qk_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        """x [B, T, dim]; rope = (cos, sin) over patch tokens or None."""
        B, T, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, self.num_heads, hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        if self.qk_norm:
            q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos[None, None], sin[None, None])
            k = apply_rope(k, cos[None, None], sin[None, None])
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        ls1 = self.param("ls1", nn.initializers.constant(self.init_values),
                         (self.dim,))
        ls2 = self.param("ls2", nn.initializers.constant(self.init_values),
                         (self.dim,))
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      name="attn")(y, rope=rope)
        x = x + ls1 * y
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = int(self.dim * self.mlp_ratio)
        y = nn.Dense(h, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + ls2 * y


class Aggregator(nn.Module):
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    num_register_tokens: int = 4
    rope_base: float = 100.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> Tuple[jnp.ndarray, int]:
        """images [B, S, H, W, 3] (normalised). Returns
        (tokens [B, S, T, 2*dim] of the final layer, patch_start_idx).
        """
        B, S, H, W, _ = images.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        T_p = ph * pw
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(
            images.reshape(B * S, H, W, 3))
        x = x.reshape(B * S, T_p, self.embed_dim)

        cam_tok = self.param("camera_token",
                             nn.initializers.normal(1e-6),
                             (2, 1, self.embed_dim))
        reg_tok = self.param("register_token",
                             nn.initializers.normal(1e-6),
                             (2, self.num_register_tokens, self.embed_dim))
        # first frame gets embedding 0, all others embedding 1
        sel = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.ones((max(S - 1, 0),), jnp.int32)])
        cam = jnp.broadcast_to(cam_tok[sel][None],
                               (B, S, 1, self.embed_dim))
        reg = jnp.broadcast_to(reg_tok[sel][None],
                               (B, S, self.num_register_tokens,
                                self.embed_dim))
        patch_start = 1 + self.num_register_tokens
        x = x.reshape(B, S, T_p, self.embed_dim)
        x = jnp.concatenate([cam.astype(x.dtype), reg.astype(x.dtype), x],
                            axis=2)
        T = x.shape[2]

        ys = jnp.repeat(jnp.arange(ph, dtype=jnp.float32), pw)
        xs = jnp.tile(jnp.arange(pw, dtype=jnp.float32), ph)
        pos = jnp.stack([ys, xs], -1)
        hd = self.embed_dim // self.num_heads
        cos_p, sin_p = rope_2d_freqs(hd, pos, self.rope_base)
        # special tokens rotate by identity (cos=1, sin=0)
        ones = jnp.ones((patch_start, hd))
        zeros = jnp.zeros((patch_start, hd))
        rope = (jnp.concatenate([ones, cos_p], 0),
                jnp.concatenate([zeros, sin_p], 0))

        frame_out = x
        global_out = x
        for i in range(self.depth):
            # frame attention: each frame's tokens independently
            xf = x.reshape(B * S, T, self.embed_dim)
            xf = Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                       name=f"frame_block{i}")(xf, rope=rope)
            frame_out = xf.reshape(B, S, T, self.embed_dim)
            # global attention: all frames' tokens jointly (RoPE per
            # frame repeats, matching the reference PositionGetter)
            xg = frame_out.reshape(B, S * T, self.embed_dim)
            rope_g = (jnp.tile(rope[0], (S, 1)), jnp.tile(rope[1], (S, 1)))
            xg = Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                       name=f"global_block{i}")(xg, rope=rope_g)
            global_out = xg.reshape(B, S, T, self.embed_dim)
            x = global_out
        tokens = jnp.concatenate([frame_out, global_out], axis=-1)
        return tokens, patch_start


def load_torch_weights(params: dict, ckpt_path: str) -> dict:
    """Convert the released VGGT torch checkpoint into this flax tree
    (only called when a checkpoint file exists; requires torch)."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    sd = {k.replace("aggregator.", ""): v.numpy()
          for k, v in sd.items() if k.startswith("aggregator.")}
    out = jax.tree.map(lambda x: x, params)  # copy

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node[p]
        if node[path[-1]].shape != value.shape:
            raise ValueError(f"{path}: {node[path[-1]].shape} vs "
                             f"{value.shape}")
        node[path[-1]] = jnp.asarray(value)

    put(("camera_token",), sd["camera_token"][0])
    put(("register_token",), sd["register_token"][0])
    put(("patch_embed", "kernel"),
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    put(("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    for grp, pref in (("frame_block", "frame_blocks"),
                      ("global_block", "global_blocks")):
        i = 0
        while f"{pref}.{i}.norm1.weight" in sd:
            b = f"{grp}{i}"
            p = f"{pref}.{i}"
            put((b, "norm1", "scale"), sd[f"{p}.norm1.weight"])
            put((b, "norm1", "bias"), sd[f"{p}.norm1.bias"])
            put((b, "norm2", "scale"), sd[f"{p}.norm2.weight"])
            put((b, "norm2", "bias"), sd[f"{p}.norm2.bias"])
            put((b, "ls1"), sd[f"{p}.ls1.gamma"])
            put((b, "ls2"), sd[f"{p}.ls2.gamma"])
            put((b, "attn", "qkv", "kernel"),
                sd[f"{p}.attn.qkv.weight"].T)
            put((b, "attn", "qkv", "bias"), sd[f"{p}.attn.qkv.bias"])
            put((b, "attn", "proj", "kernel"),
                sd[f"{p}.attn.proj.weight"].T)
            put((b, "attn", "proj", "bias"), sd[f"{p}.attn.proj.bias"])
            put((b, "attn", "q_norm", "scale"),
                sd[f"{p}.attn.q_norm.weight"])
            put((b, "attn", "q_norm", "bias"), sd[f"{p}.attn.q_norm.bias"])
            put((b, "attn", "k_norm", "scale"),
                sd[f"{p}.attn.k_norm.weight"])
            put((b, "attn", "k_norm", "bias"), sd[f"{p}.attn.k_norm.bias"])
            put((b, "mlp_fc1", "kernel"), sd[f"{p}.mlp.fc1.weight"].T)
            put((b, "mlp_fc1", "bias"), sd[f"{p}.mlp.fc1.bias"])
            put((b, "mlp_fc2", "kernel"), sd[f"{p}.mlp.fc2.weight"].T)
            put((b, "mlp_fc2", "bias"), sd[f"{p}.mlp.fc2.bias"])
            i += 1
    return out
