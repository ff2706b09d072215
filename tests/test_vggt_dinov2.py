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
    """torch.nn.functional forward of the vendored DINOv2 ViT,
    including the non-native-grid pos-embed interpolation path
    (interpolate_pos_encoding, vision_transformer.py:180-210:
    bicubic, antialias=False, interpolate_offset=0.1 scale kludge)."""
    import torch.nn.functional as F
    t = lambda k: torch.from_numpy(sd[prefix + k])
    x = torch.from_numpy(img).permute(0, 3, 1, 2)           # NCHW
    x = F.conv2d(x, t("patch_embed.proj.weight"),
                 t("patch_embed.proj.bias"), stride=P)
    B, _, ph, pw = x.shape
    x = x.flatten(2).transpose(1, 2)                        # [B,T,D]
    pos = t("pos_embed")
    if (ph, pw) != (NG, NG):
        pp = pos[:, 1:].reshape(1, NG, NG, D).permute(0, 3, 1, 2)
        pp = F.interpolate(
            pp, scale_factor=((ph + 0.1) / NG, (pw + 0.1) / NG),
            mode="bicubic", antialias=False)
        assert pp.shape[-2:] == (ph, pw)
        pp = pp.permute(0, 2, 3, 1).reshape(1, ph * pw, D)
        pos = torch.cat([pos[:, :1], pp], 1)
    cls = t("cls_token").expand(B, -1, -1)
    x = torch.cat([cls, x], 1) + pos
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


def _torch_rope2d(t, pos, base=100.0):
    """Reference RotaryPositionEmbedding2D (vggt/layers/rope.py:63-190):
    head dim splits into vertical/horizontal halves, each with 1D
    rotate-half rope within the half. t [B,H,T,hd]; pos [B,T,2]."""
    hd = t.shape[-1]
    half, quarter = hd // 2, hd // 4
    freqs = 1.0 / (base ** (torch.arange(0, half, 2,
                                         dtype=torch.float64) / half))
    freqs = freqs.float()

    def one(th, p):
        ang = torch.einsum('bt,f->btf', p.float(), freqs)
        ang = torch.cat([ang, ang], -1)                 # [B,T,half]
        cos, sin = ang.cos()[:, None], ang.sin()[:, None]
        t1, t2 = th[..., :quarter], th[..., quarter:]
        rot = torch.cat([-t2, t1], -1)
        return th * cos + rot * sin

    return torch.cat([one(t[..., :half], pos[..., 0]),
                      one(t[..., half:], pos[..., 1])], -1)


def _torch_agg_block(sd, prefix, x, pos):
    """VGGT frame/global Block (qk_norm=True, LayerNorm eps 1e-5,
    rope applied after qk-norm; attention.py:50-72, block.py)."""
    import torch.nn.functional as F
    t = lambda k: torch.from_numpy(sd[prefix + k])
    B, T, _ = x.shape
    hd = D // HEADS
    y = F.layer_norm(x, (D,), t("norm1.weight"), t("norm1.bias"),
                     eps=1e-5)
    qkv = F.linear(y, t("attn.qkv.weight"), t("attn.qkv.bias"))
    qkv = qkv.reshape(B, T, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = F.layer_norm(q, (hd,), t("attn.q_norm.weight"),
                     t("attn.q_norm.bias"), eps=1e-5)
    k = F.layer_norm(k, (hd,), t("attn.k_norm.weight"),
                     t("attn.k_norm.bias"), eps=1e-5)
    q = _torch_rope2d(q, pos)
    k = _torch_rope2d(k, pos)
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    y = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, T, D)
    y = F.linear(y, t("attn.proj.weight"), t("attn.proj.bias"))
    x = x + t("ls1.gamma") * y
    y = F.layer_norm(x, (D,), t("norm2.weight"), t("norm2.bias"),
                     eps=1e-5)
    y = F.linear(y, t("mlp.fc1.weight"), t("mlp.fc1.bias"))
    y = F.gelu(y)
    y = F.linear(y, t("mlp.fc2.weight"), t("mlp.fc2.bias"))
    return x + t("ls2.gamma") * y


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


def _agg_sd(rng):
    """Miniature state dict in the released VGGT-1B layout: DINOv2 ViT
    patch embedder + frame/global aggregator blocks."""
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
    return sd


def _torch_aggregator_forward(sd, imgs):
    """torch.nn.functional forward of the reference Aggregator
    (aggregator.py:193-305): resnet-normalise, ViT patch embed,
    first-frame/other-frame special tokens, patch positions offset +1
    with special tokens at 0 (:224-227), alternating frame/global
    blocks; returns cat[frame, global] of the final layer."""
    B, S, H, W, _ = imgs.shape
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    flat = ((imgs - mean) / std).reshape(B * S, H, W, 3)
    patches = torch.from_numpy(_torch_vit_forward(sd, flat))  # [BS,T,D]
    ph, pw = H // P, W // P
    Tp = ph * pw

    cam = torch.from_numpy(sd["camera_token"])[0]     # [2,1,D]
    reg = torch.from_numpy(sd["register_token"])[0]   # [2,R,D]
    sel = [0] + [1] * (S - 1)
    cam = torch.stack([cam[i] for i in sel])          # [S,1,D]
    reg = torch.stack([reg[i] for i in sel])
    x = torch.cat([cam.unsqueeze(0).expand(B, -1, -1, -1),
                   reg.unsqueeze(0).expand(B, -1, -1, -1),
                   patches.reshape(B, S, Tp, D)], dim=2)
    T = x.shape[2]
    p0 = 1 + R

    yy, xx = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
    pos_p = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float32) + 1
    pos = np.concatenate([np.zeros((p0, 2), np.float32), pos_p])
    pos_f = torch.from_numpy(pos).expand(B * S, -1, -1)
    pos_g = torch.from_numpy(np.tile(pos, (S, 1))).expand(B, -1, -1)

    frame_out = global_out = None
    for i in range(DEPTH):
        xf = x.reshape(B * S, T, D)
        xf = _torch_agg_block(sd, f"frame_blocks.{i}.", xf, pos_f)
        frame_out = xf.reshape(B, S, T, D)
        xg = frame_out.reshape(B, S * T, D)
        xg = _torch_agg_block(sd, f"global_blocks.{i}.", xg, pos_g)
        global_out = xg.reshape(B, S, T, D)
        x = global_out
    return torch.cat([frame_out, global_out], -1).numpy()


def test_full_aggregator_convert_and_forward():
    """End-to-end: VGGT-1B-layout state dict (ViT embedder + frame/
    global blocks) converts into the flax Aggregator and runs."""
    sd = _agg_sd(np.random.default_rng(1))
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


def test_full_aggregator_matches_torch():
    """Numerical parity of the FULL aggregator (frame+global blocks
    with 2D RoPE incl. the +1 patch offset, QK-norm at eps 1e-5, and
    the non-native pos-embed interpolation path) against a torch
    functional forward of the reference math (VERDICT r3 #4)."""
    sd = _agg_sd(np.random.default_rng(3))
    # non-square 3x4 patch grid: exercises pos-embed interpolation AND
    # asymmetric y/x rope
    ph, pw = 3, 4
    imgs = np.random.default_rng(4).normal(
        0, 1, (2, 2, ph * P, pw * P, 3)).astype(np.float32)

    agg = Aggregator(patch_size=P, embed_dim=D, depth=DEPTH,
                     num_heads=HEADS, patch_embed="dinov2",
                     vit_depth=DEPTH, vit_native_grid=NG)
    variables = agg.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
    params = convert_torch_state_dict(variables["params"], sd)
    got, p0 = agg.apply({"params": params}, jnp.asarray(imgs))
    want = _torch_aggregator_forward(sd, imgs)
    assert np.asarray(got).shape == want.shape \
        == (2, 2, p0 + ph * pw, 2 * D)
    np.testing.assert_allclose(np.asarray(got), want,
                               rtol=3e-4, atol=3e-5)


def test_torch_bicubic_matrix_matches_interpolate():
    """torch_bicubic_matrix reproduces F.interpolate(bicubic,
    antialias=False) bit-for-bit semantics, including the DINOv2
    scale-factor kludge, on up- and down-scaling."""
    from ocrfdet_tpu.models.vggt import torch_bicubic_matrix
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    for n_in, n_out in ((37, 21), (14, 37), (8, 8), (5, 9)):
        x = rng.normal(0, 1, (1, 3, n_in, n_in)).astype(np.float32)
        sf = (n_out + 0.1) / n_in
        want = F.interpolate(torch.from_numpy(x),
                             scale_factor=(sf, sf), mode="bicubic",
                             antialias=False).numpy()
        w = torch_bicubic_matrix(n_in, n_out, scale_factor=sf)
        got = np.einsum('ri,cj,bdij->bdrc', w, w, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
