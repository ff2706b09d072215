"""DINOv2 ViT patch embedder: real VGGT-1B key layout conversion +
numerical forward parity against torch.

Builds a miniature torch state dict in the RELEASED checkpoint layout
(`aggregator.patch_embed.{cls_token,pos_embed,register_tokens,
patch_embed.proj.*,blocks.i.*,norm.*}` plus frame/global blocks,
aggregator.py:143-182), converts it with convert_torch_state_dict, and
checks the flax DinoViT forward against a torch.nn.functional
re-implementation of the vendored DinoVisionTransformer
(vision_transformer.py:42-270) at the pos-embed's native grid (the
interpolation shortcut path, so the comparison is kernel-exact).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ocrfdet_tpu.models.vggt import (Aggregator, DinoViT,  # noqa: E402
                                     convert_torch_state_dict)

D, HEADS, R, DEPTH, P, NG = 16, 4, 4, 2, 14, 2   # mini ViT dims


def _vit_sd(rng, prefix="patch_embed."):
    sd = {}
    lin = lambda o, i: rng.normal(0, 0.05, (o, i)).astype(np.float32)
    vec = lambda *s: rng.normal(0, 0.05, s).astype(np.float32)
    sd[prefix + "cls_token"] = vec(1, 1, D)
    sd[prefix + "pos_embed"] = vec(1, 1 + NG * NG, D)
    sd[prefix + "register_tokens"] = vec(1, R, D)
    sd[prefix + "mask_token"] = vec(1, D)
    sd[prefix + "patch_embed.proj.weight"] = \
        rng.normal(0, 0.05, (D, 3, P, P)).astype(np.float32)
    sd[prefix + "patch_embed.proj.bias"] = vec(D)
    for i in range(DEPTH):
        b = f"{prefix}blocks.{i}."
        sd[b + "norm1.weight"] = 1 + vec(D)
        sd[b + "norm1.bias"] = vec(D)
        sd[b + "attn.qkv.weight"] = lin(3 * D, D)
        sd[b + "attn.qkv.bias"] = vec(3 * D)
        sd[b + "attn.proj.weight"] = lin(D, D)
        sd[b + "attn.proj.bias"] = vec(D)
        sd[b + "ls1.gamma"] = 1 + vec(D)
        sd[b + "norm2.weight"] = 1 + vec(D)
        sd[b + "norm2.bias"] = vec(D)
        sd[b + "mlp.fc1.weight"] = lin(4 * D, D)
        sd[b + "mlp.fc1.bias"] = vec(4 * D)
        sd[b + "mlp.fc2.weight"] = lin(D, 4 * D)
        sd[b + "mlp.fc2.bias"] = vec(D)
        sd[b + "ls2.gamma"] = 1 + vec(D)
    sd[prefix + "norm.weight"] = 1 + vec(D)
    sd[prefix + "norm.bias"] = vec(D)
    return sd


def _torch_vit_forward(sd, img, prefix="patch_embed."):
    """torch.nn.functional forward of the vendored DINOv2 ViT."""
    import torch.nn.functional as F
    t = lambda k: torch.from_numpy(sd[prefix + k])
    x = torch.from_numpy(img).permute(0, 3, 1, 2)           # NCHW
    x = F.conv2d(x, t("patch_embed.proj.weight"),
                 t("patch_embed.proj.bias"), stride=P)
    B, _, ph, pw = x.shape
    x = x.flatten(2).transpose(1, 2)                        # [B,T,D]
    cls = t("cls_token").expand(B, -1, -1)
    x = torch.cat([cls, x], 1) + t("pos_embed")             # native grid
    reg = t("register_tokens").expand(B, -1, -1)
    x = torch.cat([x[:, :1], reg, x[:, 1:]], 1)
    hd = D // HEADS
    for i in range(DEPTH):
        b = f"blocks.{i}."
        y = F.layer_norm(x, (D,), t(b + "norm1.weight"),
                         t(b + "norm1.bias"), eps=1e-6)
        qkv = F.linear(y, t(b + "attn.qkv.weight"),
                       t(b + "attn.qkv.bias"))
        T = y.shape[1]
        qkv = qkv.reshape(B, T, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(B, T, D)
        y = F.linear(y, t(b + "attn.proj.weight"),
                     t(b + "attn.proj.bias"))
        x = x + t(b + "ls1.gamma") * y
        y = F.layer_norm(x, (D,), t(b + "norm2.weight"),
                         t(b + "norm2.bias"), eps=1e-6)
        y = F.linear(y, t(b + "mlp.fc1.weight"), t(b + "mlp.fc1.bias"))
        y = F.gelu(y)                                       # exact erf
        y = F.linear(y, t(b + "mlp.fc2.weight"), t(b + "mlp.fc2.bias"))
        x = x + t(b + "ls2.gamma") * y
    x = F.layer_norm(x, (D,), t("norm.weight"), t("norm.bias"),
                     eps=1e-6)
    return x[:, 1 + R:].numpy()


def test_dino_vit_forward_matches_torch():
    rng = np.random.default_rng(0)
    sd = _vit_sd(rng)
    img = rng.normal(0, 1, (2, NG * P, NG * P, 3)).astype(np.float32)

    vit = DinoViT(patch_size=P, embed_dim=D, depth=DEPTH,
                  num_heads=HEADS, num_register_tokens=R, native_grid=NG)
    params = vit.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]

    # reuse the aggregator converter's ViT branch by wrapping the
    # flat vit params as a patch_embed subtree
    converted = convert_torch_state_dict(
        {"patch_embed": params,
         "camera_token": np.zeros((2, 1, D), np.float32),
         "register_token": np.zeros((2, R, D), np.float32)},
        dict(sd, **{"camera_token": np.zeros((1, 2, 1, D), np.float32),
                    "register_token": np.zeros((1, 2, R, D),
                                               np.float32)}))
    got = np.asarray(vit.apply({"params": converted["patch_embed"]},
                               jnp.asarray(img)))
    want = _torch_vit_forward(sd, img)
    assert got.shape == want.shape == (2, NG * NG, D)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dino_vit_pos_interpolation_path():
    """Non-native grid: bicubic pos-embed interpolation traces and
    produces the right token count."""
    vit = DinoViT(patch_size=P, embed_dim=D, depth=1, num_heads=HEADS,
                  num_register_tokens=R, native_grid=NG)
    img = jnp.zeros((1, 3 * P, 4 * P, 3))
    params = vit.init(jax.random.PRNGKey(0), img)
    out = vit.apply(params, img)
    assert out.shape == (1, 12, D)


def test_full_aggregator_convert_and_forward():
    """End-to-end: VGGT-1B-layout state dict (ViT embedder + frame/
    global blocks) converts into the flax Aggregator and runs."""
    rng = np.random.default_rng(1)
    sd = _vit_sd(rng)
    lin = lambda o, i: rng.normal(0, 0.05, (o, i)).astype(np.float32)
    vec = lambda *s: rng.normal(0, 0.05, s).astype(np.float32)
    sd["camera_token"] = vec(1, 2, 1, D)
    sd["register_token"] = vec(1, 2, R, D)
    for grp in ("frame_blocks", "global_blocks"):
        for i in range(DEPTH):
            b = f"{grp}.{i}."
            sd[b + "norm1.weight"] = 1 + vec(D)
            sd[b + "norm1.bias"] = vec(D)
            sd[b + "attn.qkv.weight"] = lin(3 * D, D)
            sd[b + "attn.qkv.bias"] = vec(3 * D)
            sd[b + "attn.proj.weight"] = lin(D, D)
            sd[b + "attn.proj.bias"] = vec(D)
            sd[b + "attn.q_norm.weight"] = 1 + vec(D // HEADS)
            sd[b + "attn.q_norm.bias"] = vec(D // HEADS)
            sd[b + "attn.k_norm.weight"] = 1 + vec(D // HEADS)
            sd[b + "attn.k_norm.bias"] = vec(D // HEADS)
            sd[b + "ls1.gamma"] = vec(D)
            sd[b + "norm2.weight"] = 1 + vec(D)
            sd[b + "norm2.bias"] = vec(D)
            sd[b + "mlp.fc1.weight"] = lin(4 * D, D)
            sd[b + "mlp.fc1.bias"] = vec(4 * D)
            sd[b + "mlp.fc2.weight"] = lin(D, 4 * D)
            sd[b + "mlp.fc2.bias"] = vec(D)
            sd[b + "ls2.gamma"] = vec(D)

    agg = Aggregator(patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, patch_embed="dinov2",
                     vit_depth=DEPTH, vit_native_grid=NG)
    imgs = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 2, NG * P, NG * P, 3))
        .astype(np.float32))
    variables = agg.init(jax.random.PRNGKey(0), imgs)
    params = convert_torch_state_dict(variables["params"], sd)
    # DinoViT params sit under the shared 'patch_embed' module name
    tokens, p0 = agg.apply({"params": params}, imgs)
    assert p0 == 1 + R
    assert tokens.shape == (1, 2, p0 + NG * NG, 2 * D)
    assert np.isfinite(np.asarray(tokens)).all()
