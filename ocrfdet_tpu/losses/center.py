"""CenterHead losses (gaussian focal heatmap + task-split L1).

Mirrors the reference loss assembly (centerpoint_head.py:587-661):
  * clip_sigmoid on heatmap logits
  * GaussianFocalLoss with avg_factor = cross-replica mean of num_pos
    (reduce_mean :608) clamped >= 1
  * L1 on gathered box regressions, weighted by code_weights and split
    into xy / z / whl / yaw / vel sub-losses, avg_factor = cross-replica
    mean of positive count (:636)

`mean_fn` abstracts the cross-replica reduce_mean: identity on a single
device, jax.lax.pmean(..., 'data') inside shard_map.
"""
from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp


def clip_sigmoid(x, eps: float = 1e-4):
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def gaussian_focal_loss(pred, target, alpha: float = 2.0,
                        gamma: float = 4.0):
    """Element-wise CornerNet focal loss; pred already sigmoided."""
    eps = 1e-12
    pos_w = (target == 1.0).astype(pred.dtype)
    neg_w = jnp.power(1.0 - target, gamma)
    pos = -jnp.log(pred + eps) * jnp.power(1.0 - pred, alpha) * pos_w
    neg = -jnp.log(1.0 - pred + eps) * jnp.power(pred, alpha) * neg_w * (
        1.0 - pos_w)
    return pos + neg


def center_head_loss(preds: List[Dict[str, jnp.ndarray]],
                     targets: Dict[str, list],
                     code_weights,
                     loss_bbox_weight: float = 0.25,
                     mean_fn: Callable = lambda x: x) -> Dict[str, jnp.ndarray]:
    """Compute all task losses.

    preds: per-task dicts of channel-last maps [B, H, W, ch].
    targets: dict of per-task lists (heatmaps [B,H,W,K], anno_boxes
      [B,max_objs,10], inds [B,max_objs], masks [B,max_objs]).
    """
    losses = {}
    cw = jnp.asarray(code_weights, dtype=jnp.float32)
    names = ["xy", "z", "whl", "yaw", "vel"]
    splits = [0, 2, 3, 6, 8, 10]
    for t, pred in enumerate(preds):
        hm_t = targets["heatmaps"][t]
        hm_p = clip_sigmoid(pred["heatmap"].astype(jnp.float32))
        num_pos = jnp.sum((hm_t == 1.0).astype(jnp.float32))
        avg = jnp.maximum(mean_fn(num_pos), 1.0)
        losses[f"task{t}.loss_heatmap"] = (
            jnp.sum(gaussian_focal_loss(hm_p, hm_t)) / avg)

        anno = jnp.concatenate(
            [pred[k].astype(jnp.float32)
             for k in ("reg", "height", "dim", "rot", "vel")], axis=-1)
        B, H, W, CH = anno.shape
        anno = anno.reshape(B, H * W, CH)
        ind = targets["inds"][t]                       # [B, max_objs]
        gathered = jnp.take_along_axis(
            anno, ind[..., None].astype(jnp.int32), axis=1)
        target_box = targets["anno_boxes"][t]
        mask = targets["masks"][t][..., None].astype(jnp.float32)
        notnan = jnp.isfinite(target_box).astype(jnp.float32)
        weights = mask * notnan * cw[None, None, :]
        target_box = jnp.where(jnp.isfinite(target_box), target_box, 0.0)
        num = mean_fn(jnp.sum(mask))
        num = jnp.maximum(num, 1e-4)
        l1 = jnp.abs(gathered - target_box) * weights
        for s in range(5):
            lo, hi = splits[s], splits[s + 1]
            losses[f"task{t}.loss_{names[s]}"] = (
                loss_bbox_weight * jnp.sum(l1[..., lo:hi]) / (num + 1e-4))
    return losses
