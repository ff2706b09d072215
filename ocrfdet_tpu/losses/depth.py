"""Depth + semantic supervision for the view transformer.

Reproduces the reference's label construction and losses:
  * min-pool downsample of sparse depth maps to the feature stride and
    one-hot depth bin labels (view_transformer.py:716-745 /
    view_transformer_ocrf.py:1203-1281)
  * semantic max-pool downsample + 2-class one-hot
  * soft depth-label redistribution on foreground pixels: among the
    downsample^2 source pixels, the histogram of (valid) depth bins of
    *semantic-foreground* points replaces the min-pooled one-hot
  * BCE depth loss weighted 0.9 fg / 0.1 bg; focal semantic loss
    (alpha .25, gamma 2) (get_depth_and_semantic_loss:1283-1314)

All functions are jit-safe (static shapes, masking instead of boolean
indexing).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _downsample_blocks(x, ds: int):
    """[BN, H, W] -> [BN, H/ds, W/ds, ds*ds] block view."""
    BN, H, W = x.shape
    x = x.reshape(BN, H // ds, ds, W // ds, ds)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(
        BN, H // ds, W // ds, ds * ds)


def build_depth_semantic_labels(gt_depth, gt_semantic, depth_cfg,
                                num_bins: int, downsample: int):
    """gt_depth/gt_semantic: [BN, H, W] (0 = no point).

    Returns (depth_onehot [BN, h, w, D], semantic_onehot [BN, h, w, 2],
    valid [BN, h, w]) where depth_onehot rows on foreground pixels are
    the soft histogram described above.
    """
    lo, hi, step = depth_cfg
    # range-filter then min-pool depth / max-pool semantic
    in_range = (gt_depth >= lo) & (gt_depth <= hi)
    depth = jnp.where(in_range, gt_depth, 0.0)
    sem = jnp.where(in_range, gt_semantic, 0.0)
    sem_depth = depth * sem

    dblk = _downsample_blocks(depth, downsample)
    dblk_inf = jnp.where(dblk == 0.0, 1e5, dblk)
    dmin = jnp.min(dblk_inf, axis=-1)
    dbin = (dmin - (lo - step)) / step
    dvalid = (dbin >= 0.0) & (dbin < num_bins + 1)
    dbin = jnp.where(dvalid, dbin, 0.0).astype(jnp.int32)
    # one-hot over D+1 then drop the background column
    depth_onehot = jax.nn.one_hot(dbin, num_bins + 1)[..., 1:]

    sblk = _downsample_blocks(sem, downsample)
    smax = jnp.max(sblk, axis=-1)
    semantic_onehot = jax.nn.one_hot(smax.astype(jnp.int32), 2)

    # soft redistribution over foreground pixels: histogram of the
    # (valid, foreground) depth bins within each block
    sdblk = _downsample_blocks(sem_depth, downsample)
    sdblk = jnp.where(sdblk == 0.0, 1e5, sdblk)
    sdbin = (sdblk - (lo - step)) / step
    sdvalid = (sdbin >= 0.0) & (sdbin < num_bins + 1)
    sdbin = jnp.where(sdvalid, sdbin, 0.0).astype(jnp.int32)
    hist = jnp.sum(jax.nn.one_hot(sdbin, num_bins + 1), axis=-2)[..., 1:]
    hist_sum = jnp.sum(hist, axis=-1, keepdims=True)
    soft = hist / jnp.maximum(hist_sum, 1e-12)
    fg = smax > 0.0
    depth_onehot = jnp.where(fg[..., None], soft, depth_onehot)

    valid = jnp.max(depth_onehot, axis=-1) > 0.0
    return depth_onehot, semantic_onehot, valid


def depth_semantic_loss(depth_pred, semantic_pred, depth_onehot,
                        semantic_onehot, valid,
                        loss_depth_weight: float,
                        loss_semantic_weight: float,
                        mean_fn=lambda x: x):
    """depth_pred [BN, h, w, D] (softmaxed), semantic_pred [BN, h, w, 2]
    (softmaxed). Masked equivalents of the reference's boolean-indexed
    losses."""
    eps = 1e-7
    sem_w = jnp.where(semantic_onehot[..., 1] > 0, 0.9, 0.1)
    w = sem_w * valid
    bce = -(depth_onehot * jnp.log(jnp.clip(depth_pred, eps, 1.0))
            + (1.0 - depth_onehot)
            * jnp.log(jnp.clip(1.0 - depth_pred, eps, 1.0)))
    depth_loss = jnp.sum(bce * w[..., None]) / jnp.maximum(
        mean_fn(jnp.sum(w)), 0.1)

    p = semantic_pred
    t = semantic_onehot
    alpha, gamma = 0.25, 2.0
    pt = (1.0 - p) * t + p * (1.0 - t)
    focal_w = (alpha * t + (1.0 - alpha) * (1.0 - t)) * jnp.power(pt, gamma)
    sem_bce = -(t * jnp.log(jnp.clip(p, eps, 1.0))
                + (1.0 - t) * jnp.log(jnp.clip(1.0 - p, eps, 1.0)))
    sem_loss_el = sem_bce * focal_w * valid[..., None]
    # reference normalises by the count of valid rows (len of the
    # boolean-filtered tensor)
    n_valid = jnp.maximum(mean_fn(jnp.sum(valid)), 1.0)
    semantic_loss = jnp.sum(sem_loss_el) / n_valid
    return (loss_depth_weight * depth_loss,
            loss_semantic_weight * semantic_loss)
