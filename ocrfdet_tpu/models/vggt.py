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
    """2D RoPE angles matching the reference RotaryPositionEmbedding2D
    (vggt/layers/rope.py:63-190): the head dim splits into a VERTICAL
    half rotated by y and a HORIZONTAL half rotated by x, and each half
    applies 1D rotate-half rope WITHIN itself — i.e. feature pairs are
    (i, i+dim/4), not (i, i+dim/2). inv_freq follows torch
    `arange(0, dim/2, 2) / (dim/2)`.

    positions [T, 2] (y, x) -> (cos [T, dim], sin [T, dim]) with layout
    [aV, aV, aH, aH] (quarter blocks).
    """
    quarter = dim // 4
    freqs = 1.0 / (base ** (jnp.arange(quarter) / quarter))
    ay = positions[:, 0:1] * freqs[None]         # [T, dim/4]
    ax = positions[:, 1:2] * freqs[None]
    ang = jnp.concatenate([ay, ay, ax, ax], axis=-1)   # [T, dim]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin):
    """x [..., T, d]; per-half rotate-half (pairs (i, i+d/4)), matching
    the reference's independent 1D rope on each d/2 half."""
    d = x.shape[-1]
    h, q = d // 2, d // 4

    def rot_half(t):
        return jnp.concatenate([-t[..., q:], t[..., :q]], axis=-1)

    v, hh = x[..., :h], x[..., h:]
    out_v = v * cos[..., :h] + rot_half(v) * sin[..., :h]
    out_h = hh * cos[..., h:] + rot_half(hh) * sin[..., h:]
    return jnp.concatenate([out_v, out_h], axis=-1)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qk_norm: bool = True
    # torch nn.LayerNorm default (the VGGT frame/global blocks use it;
    # the DINOv2 ViT passes 1e-6, vision_transformer.py:94)
    eps: float = 1e-5
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
            q = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                             name="q_norm")(q)
            k = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                             name="k_norm")(k)
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
    qk_norm: bool = True
    eps: float = 1e-5            # see Attention.eps
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        ls1 = self.param("ls1", nn.initializers.constant(self.init_values),
                         (self.dim,))
        ls2 = self.param("ls2", nn.initializers.constant(self.init_values),
                         (self.dim,))
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        y = Attention(self.dim, self.num_heads, qk_norm=self.qk_norm,
                      eps=self.eps, dtype=self.dtype, name="attn")(
                          y, rope=rope)
        x = x + ls1 * y
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="norm2")(x)
        h = int(self.dim * self.mlp_ratio)
        y = nn.Dense(h, dtype=self.dtype, name="mlp_fc1")(y)
        # exact erf GELU (torch nn.GELU default)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + ls2 * y


def torch_bicubic_matrix(n_in: int, n_out: int,
                         scale_factor: float | None = None) -> np.ndarray:
    """[n_out, n_in] interpolation matrix reproducing torch
    `F.interpolate(mode='bicubic', align_corners=False, antialias=False)`
    exactly: cubic convolution kernel a=-0.75, source coordinate
    (o + 0.5) / scale - 0.5 where scale is the EXPLICIT scale_factor
    when given (DINOv2 passes the interpolate_offset=0.1 kludge:
    scale = (n_out + 0.1) / n_in, vision_transformer.py:195-201) else
    n_out / n_in, with border-clamped taps."""
    A = -0.75

    def cubic(t):        # |t| <= 1
        return ((A + 2.0) * t - (A + 3.0)) * t * t + 1.0

    def cubic2(t):       # 1 < |t| <= 2
        return ((A * t - 5.0 * A) * t + 8.0 * A) * t - 4.0 * A

    scale = float(scale_factor) if scale_factor else n_out / n_in
    W = np.zeros((n_out, n_in), np.float64)
    for o in range(n_out):
        src = (o + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        w4 = (cubic2(t + 1.0), cubic(t), cubic(1.0 - t), cubic2(2.0 - t))
        for k, wk in enumerate(w4):
            W[o, int(np.clip(i0 - 1 + k, 0, n_in - 1))] += wk
    return W.astype(np.float32)


class DinoViT(nn.Module):
    """DINOv2 vision transformer with register tokens — the VGGT-1B
    patch embedder (aggregator.py:143-182 builds
    `vit_large(patch_size=14, num_register_tokens=4, init_values=1.0,
    block_chunks=0)`; vendored DinoVisionTransformer,
    vggt/layers/vision_transformer.py:42-270).

    Returns `x_norm_patchtokens` — the final-LayerNorm patch tokens
    with cls/register tokens stripped. The learned pos-embed is stored
    at its native grid (37x37 for the released 518px checkpoint) and
    resized to the actual patch grid with an EXACT replica of torch's
    non-antialiased bicubic (a=-0.75) including DINOv2's
    interpolate_offset=0.1 scale-factor kludge
    (vision_transformer.py:180-210) — static [out,in] matrices, two
    einsums."""
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    num_register_tokens: int = 4
    native_grid: int = 37        # pos_embed grid (518 // 14)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images [B, H, W, 3] -> patch tokens [B, ph*pw, dim]."""
        B, H, W, _ = images.shape
        p = self.patch_size
        ph, pw = H // p, W // p
        D = self.embed_dim
        ng = self.native_grid
        x = nn.Conv(D, (p, p), strides=(p, p), dtype=self.dtype,
                    name="proj")(images)
        x = x.reshape(B, ph * pw, D)

        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, D))
        reg = self.param("register_tokens", nn.initializers.normal(1e-6),
                         (1, self.num_register_tokens, D))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + ng * ng, D))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (ng, ng):
            # exact torch bicubic with the DINOv2 offset kludge; the
            # matrices are static (numpy) so this is two small einsums
            wr = jnp.asarray(torch_bicubic_matrix(
                ng, ph, scale_factor=(ph + 0.1) / ng))
            wc = jnp.asarray(torch_bicubic_matrix(
                ng, pw, scale_factor=(pw + 0.1) / ng))
            pp = pos_patch.reshape(ng, ng, D).astype(jnp.float32)
            pp = jnp.einsum('ri,cj,ijd->rcd', wr, wc, pp)
            pos_patch = pp.reshape(1, ph * pw, D)
        # cat(cls, patches) + pos, then registers inserted after cls
        # WITHOUT positional embedding (prepare_tokens_with_masks,
        # vision_transformer.py:215-226)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(x.dtype), x], 1)
        x = x + jnp.concatenate([pos_cls, pos_patch], 1).astype(x.dtype)
        x = jnp.concatenate(
            [x[:, :1],
             jnp.broadcast_to(reg, (B, self.num_register_tokens, D))
             .astype(x.dtype), x[:, 1:]], 1)
        for i in range(self.depth):
            # DINOv2 blocks: LayerScale init 1.0, no QK-norm, no RoPE,
            # LayerNorm eps 1e-6 (vision_transformer.py:94)
            x = Block(D, self.num_heads, init_values=1.0, qk_norm=False,
                      eps=1e-6, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 1 + self.num_register_tokens:]


_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


class Aggregator(nn.Module):
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    num_register_tokens: int = 4
    rope_base: float = 100.0
    # 'dinov2' = full DINOv2 ViT patch embedder (VGGT-1B layout);
    # 'conv' = single conv (miniature tests)
    patch_embed: str = "dinov2"
    vit_depth: int = 24
    vit_native_grid: int = 37
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images) -> Tuple[jnp.ndarray, int]:
        """images [B, S, H, W, 3]. Returns
        (tokens [B, S, T, 2*dim] of the final layer, patch_start_idx).

        The reference normalises its input with the resnet mean/std
        unconditionally (aggregator.py:200-201) — including in the
        OcRFDet4DVGGT path where the input is ALREADY an ImageNet-
        normalised tensor resized to 294x518 (ocrfdet_vggt.py:244);
        that double normalisation is reproduced faithfully here.
        """
        B, S, H, W, _ = images.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        T_p = ph * pw
        images = ((images - jnp.asarray(_RESNET_MEAN, images.dtype))
                  / jnp.asarray(_RESNET_STD, images.dtype))
        flat = images.reshape(B * S, H, W, 3)
        if self.patch_embed == "dinov2":
            x = DinoViT(patch_size=self.patch_size,
                        embed_dim=self.embed_dim,
                        depth=self.vit_depth,
                        num_heads=self.num_heads,
                        num_register_tokens=self.num_register_tokens,
                        native_grid=self.vit_native_grid,
                        dtype=self.dtype, name="patch_embed")(flat)
        else:
            x = nn.Conv(self.embed_dim,
                        (self.patch_size, self.patch_size),
                        strides=(self.patch_size, self.patch_size),
                        dtype=self.dtype, name="patch_embed")(flat)
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

        # patch positions start at 1 — the reference offsets them so the
        # special tokens sit alone at position 0 (aggregator.py:224-227)
        ys = jnp.repeat(jnp.arange(ph, dtype=jnp.float32), pw) + 1.0
        xs = jnp.tile(jnp.arange(pw, dtype=jnp.float32), ph) + 1.0
        pos = jnp.concatenate(
            [jnp.zeros((patch_start, 2), jnp.float32),
             jnp.stack([ys, xs], -1)], axis=0)       # [T, 2]
        hd = self.embed_dim // self.num_heads
        rope = rope_2d_freqs(hd, pos, self.rope_base)

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
    """Convert a released VGGT torch checkpoint into this flax tree.

    Handles both aggregator layouts: the conv patch embed
    (`patch_embed.proj.*`, miniature/test models) and the released
    VGGT-1B layout where `patch_embed.*` is an entire DINOv2 ViT-L/14
    with register tokens (`patch_embed.patch_embed.proj.*`,
    `patch_embed.blocks.{i}.*`, `patch_embed.{cls_token,pos_embed,
    register_tokens,norm.*}`; aggregator.py:143-182). Only called when
    a checkpoint file exists; requires torch."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and not any(
            k.startswith("aggregator.") for k in sd):
        sd = sd["model"]
    sd = {k.replace("aggregator.", ""): v.numpy()
          for k, v in sd.items() if k.startswith("aggregator.")}
    return convert_torch_state_dict(params, sd)


def convert_torch_state_dict(params: dict, sd: dict) -> dict:
    """Map a torch aggregator state dict (numpy values) onto `params`."""
    out = jax.tree.map(lambda x: x, params)  # copy

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node[p]
        if tuple(node[path[-1]].shape) != tuple(value.shape):
            raise ValueError(f"{path}: {node[path[-1]].shape} vs "
                             f"{value.shape}")
        node[path[-1]] = jnp.asarray(value)

    def put_block(flax_prefix, p, qk_norm):
        put(flax_prefix + ("norm1", "scale"), sd[f"{p}.norm1.weight"])
        put(flax_prefix + ("norm1", "bias"), sd[f"{p}.norm1.bias"])
        put(flax_prefix + ("norm2", "scale"), sd[f"{p}.norm2.weight"])
        put(flax_prefix + ("norm2", "bias"), sd[f"{p}.norm2.bias"])
        put(flax_prefix + ("ls1",), sd[f"{p}.ls1.gamma"])
        put(flax_prefix + ("ls2",), sd[f"{p}.ls2.gamma"])
        put(flax_prefix + ("attn", "qkv", "kernel"),
            sd[f"{p}.attn.qkv.weight"].T)
        put(flax_prefix + ("attn", "qkv", "bias"),
            sd[f"{p}.attn.qkv.bias"])
        put(flax_prefix + ("attn", "proj", "kernel"),
            sd[f"{p}.attn.proj.weight"].T)
        put(flax_prefix + ("attn", "proj", "bias"),
            sd[f"{p}.attn.proj.bias"])
        if qk_norm:
            put(flax_prefix + ("attn", "q_norm", "scale"),
                sd[f"{p}.attn.q_norm.weight"])
            put(flax_prefix + ("attn", "q_norm", "bias"),
                sd[f"{p}.attn.q_norm.bias"])
            put(flax_prefix + ("attn", "k_norm", "scale"),
                sd[f"{p}.attn.k_norm.weight"])
            put(flax_prefix + ("attn", "k_norm", "bias"),
                sd[f"{p}.attn.k_norm.bias"])
        put(flax_prefix + ("mlp_fc1", "kernel"), sd[f"{p}.mlp.fc1.weight"].T)
        put(flax_prefix + ("mlp_fc1", "bias"), sd[f"{p}.mlp.fc1.bias"])
        put(flax_prefix + ("mlp_fc2", "kernel"), sd[f"{p}.mlp.fc2.weight"].T)
        put(flax_prefix + ("mlp_fc2", "bias"), sd[f"{p}.mlp.fc2.bias"])

    put(("camera_token",), sd["camera_token"][0])
    put(("register_token",), sd["register_token"][0])
    if "patch_embed.proj.weight" in sd:          # conv variant
        put(("patch_embed", "kernel"),
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        put(("patch_embed", "bias"), sd["patch_embed.proj.bias"])
    else:                                        # DINOv2 ViT variant
        pe = "patch_embed"
        put((pe, "cls_token"), sd[f"{pe}.cls_token"])
        put((pe, "pos_embed"), sd[f"{pe}.pos_embed"])
        put((pe, "register_tokens"), sd[f"{pe}.register_tokens"])
        put((pe, "proj", "kernel"),
            sd[f"{pe}.patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        put((pe, "proj", "bias"), sd[f"{pe}.patch_embed.proj.bias"])
        put((pe, "norm", "scale"), sd[f"{pe}.norm.weight"])
        put((pe, "norm", "bias"), sd[f"{pe}.norm.bias"])
        i = 0
        while f"{pe}.blocks.{i}.norm1.weight" in sd:
            put_block((pe, f"block{i}"), f"{pe}.blocks.{i}",
                      qk_norm=False)
            i += 1
    for grp, pref in (("frame_block", "frame_blocks"),
                      ("global_block", "global_blocks")):
        i = 0
        while f"{pref}.{i}.norm1.weight" in sd:
            put_block((f"{grp}{i}",), f"{pref}.{i}", qk_norm=True)
            i += 1
    return out
