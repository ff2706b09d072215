"""Stereo cost volume: factored (depth-linear) grid == dense reference.

The production `stereo_cost_volume` exploits that the frustum->sweep
homography is linear in depth (models/depthnet.py). This test pins it
against the literal dense formulation of the reference's gen_grid /
calculate_cost_volumn (view_transformer.py:538-596): transform every
[D,H,W] frustum point through the full matrix chain.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ocrfdet_tpu.models.depthnet import stereo_cost_volume
from ocrfdet_tpu.ops.grid_sample import (bilinear_sample_packed,
                                          grid_sample_2d,
                                          pack_neighborhood)


def dense_cost_volume(curr_feat, prev_feat, cv_frustum, k2s_sensor,
                      intrins, post_rots, post_trans, input_size, bias):
    B, N, Hc, Wc, C = curr_feat.shape
    D = cv_frustum.shape[0]
    Hi, Wi = input_size
    pts = cv_frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum('bnij,bndhwj->bndhwi', inv_post, pts)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]],
                          -1)
    rots = k2s_sensor[..., :3, :3]
    trans = k2s_sensor[..., :3, 3]
    combine = rots @ jnp.linalg.inv(intrins)
    pts = jnp.einsum('bnij,bndhwj->bndhwi', combine, pts)
    pts = pts + trans[:, :, None, None, None, :]
    behind = pts[..., 2] < 1e-3
    pix = jnp.einsum('bnij,bndhwj->bndhwi', intrins, pts)
    pix = pix[..., :2] / pix[..., 2:3]
    pix = jnp.einsum('bnij,bndhwj->bndhwi', post_rots[..., :2, :2], pix)
    pix = pix + post_trans[..., None, None, None, :2]
    gx = pix[..., 0] / (Wi - 1.0) * 2.0 - 1.0
    gy = pix[..., 1] / (Hi - 1.0) * 2.0 - 1.0
    gx = jnp.where(behind, -2.0, gx)
    gy = jnp.where(behind, -2.0, gy)
    grid = jnp.stack([gx, gy], axis=-1)
    # use the SAME packed sampler as production so the comparison
    # isolates the grid math (4-tap vs packed bf16 accumulation order
    # is covered separately in test_grid_sample)
    packed = jax.vmap(pack_neighborhood)(
        prev_feat.reshape(B * N, Hc, Wc, C).astype(jnp.bfloat16))
    g = grid.reshape(B * N, D, Hc * Wc, 2)
    px = (g[..., 0] + 1.0) * 0.5 * (Wc - 1)
    py = (g[..., 1] + 1.0) * 0.5 * (Hc - 1)
    warped = jax.vmap(
        lambda fl, xx, yy: bilinear_sample_packed(fl, Hc, Wc, xx, yy)
    )(packed, px, py)
    cost = jnp.sum(jnp.abs(
        curr_feat.reshape(B * N, 1, Hc * Wc, C).astype(jnp.float32)
        - warped.astype(jnp.float32)), axis=-1)
    # the reference's invalid flag reads group-local channel 0 of the
    # LAST 4-channel group, i.e. stem channel C-4
    # (view_transformer.py:578-592)
    inv_ch = 4 * (C // 4 - 1) if C >= 8 else 0
    cost = jnp.where(warped[..., inv_ch] == 0.0, cost + bias, cost)
    cost = cost.reshape(B, N, D, Hc, Wc)
    return jax.nn.softmax(-cost, axis=2)


def test_factored_grid_matches_dense():
    rng = np.random.default_rng(0)
    B, N, Hc, Wc, C, D = 1, 2, 8, 12, 16, 10
    Hi, Wi = Hc * 4, Wc * 4
    curr = rng.standard_normal((B, N, Hc, Wc, C)).astype(np.float32)
    prev = rng.standard_normal((B, N, Hc, Wc, C)).astype(np.float32)
    u, v = np.meshgrid(np.linspace(0, Wi - 1, Wc),
                       np.linspace(0, Hi - 1, Hc), indexing="xy")
    frustum = np.stack([
        np.broadcast_to(u, (D, Hc, Wc)),
        np.broadcast_to(v, (D, Hc, Wc)),
        np.broadcast_to(np.linspace(1.0, 20.0, D)[:, None, None],
                        (D, Hc, Wc))], -1).astype(np.float32)
    intr = np.broadcast_to(np.array(
        [[60.0, 0, Wi / 2], [0, 60.0, Hi / 2], [0, 0, 1]],
        np.float32), (B, N, 3, 3)).copy()
    k2s = np.broadcast_to(np.eye(4, dtype=np.float32), (B, N, 4, 4)).copy()
    k2s[..., :3, 3] = rng.standard_normal((B, N, 3)) * 0.3
    th = rng.uniform(-0.1, 0.1, (B, N))
    pr = np.zeros((B, N, 3, 3), np.float32)
    pr[..., 0, 0] = np.cos(th) * 0.9
    pr[..., 0, 1] = -np.sin(th)
    pr[..., 1, 0] = np.sin(th)
    pr[..., 1, 1] = np.cos(th) * 0.9
    pr[..., 2, 2] = 1.0
    pt = np.zeros((B, N, 3), np.float32)
    pt[..., :2] = rng.uniform(-3, 3, (B, N, 2))
    args = (jnp.asarray(curr), jnp.asarray(prev), jnp.asarray(frustum),
            jnp.asarray(k2s), jnp.asarray(intr), jnp.asarray(pr),
            jnp.asarray(pt), (Hi, Wi), 5.0)
    got = np.asarray(stereo_cost_volume(*args))
    want = np.asarray(dense_cost_volume(*args))
    # identical math, different fp association: the factored grid
    # coords differ by ~1e-5 px, which moves bf16 bilinear tap weights
    # slightly; bound the post-softmax probabilities instead of exact
    # bits
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-3)
    # depth hypothesis ranking agrees except at random-feature
    # near-ties (probabilities here are almost flat by construction)
    assert (np.argmax(got, 2) == np.argmax(want, 2)).mean() > 0.95
