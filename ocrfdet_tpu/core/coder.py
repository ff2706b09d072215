"""CenterPoint box decoding (in-jit top-K + gather).

Re-implements CenterPointBBoxCoder.decode
(core/bbox/coders/centerpoint_bbox_coders.py:117-229): per task, top-K
on the sigmoided heatmap across classes, gather regressions at those
locations, reconstruct metric boxes, and emit score/label plus validity
from score threshold and post-center range. NMS happens on host
(ops/nms.py) after decode.

Boxes decode as [cx, cy, z, dx, dy, dz, yaw, vx, vy] with z the
gravity-free "height" channel as predicted (the reference convention;
output boxes then subtract dz/2 for bottom-centre, see
centerpoint_head.py:709 bboxes[:, 2] -= bboxes[:, 5]*0.5).
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple

import jax
import jax.numpy as jnp


class DecodedBoxes(NamedTuple):
    boxes: jnp.ndarray    # [B, K, 9]
    scores: jnp.ndarray   # [B, K]
    labels: jnp.ndarray   # [B, K] task-local class ids
    valid: jnp.ndarray    # [B, K] bool


def decode_task(pred: Dict[str, jnp.ndarray], max_num: int,
                out_size_factor: int, voxel_size, pc_range,
                post_center_range, score_threshold: float) -> DecodedBoxes:
    heat = jax.nn.sigmoid(pred["heatmap"].astype(jnp.float32))
    B, H, W, K = heat.shape
    flat = heat.reshape(B, H * W * K)
    scores, topk = jax.lax.top_k(flat, max_num)
    labels = topk % K
    pix = topk // K
    ys = (pix // W).astype(jnp.float32)
    xs = (pix % W).astype(jnp.float32)

    def gather(name):
        v = pred[name].astype(jnp.float32)
        c = v.shape[-1]
        return jnp.take_along_axis(
            v.reshape(B, H * W, c), pix[..., None], axis=1)

    reg = gather("reg")
    height = gather("height")[..., 0]
    dim = jnp.exp(gather("dim"))
    rot = gather("rot")
    vel = gather("vel")
    yaw = jnp.arctan2(rot[..., 0], rot[..., 1])

    cx = (xs + reg[..., 0]) * out_size_factor * voxel_size[0] + pc_range[0]
    cy = (ys + reg[..., 1]) * out_size_factor * voxel_size[1] + pc_range[1]
    boxes = jnp.concatenate([
        cx[..., None], cy[..., None], height[..., None], dim,
        yaw[..., None], vel], axis=-1)
    pcr = jnp.asarray(post_center_range)
    centers = boxes[..., :3]
    in_range = jnp.all(centers >= pcr[:3], axis=-1) & jnp.all(
        centers <= pcr[3:], axis=-1)
    valid = in_range & (scores > score_threshold)
    return DecodedBoxes(boxes=boxes, scores=scores, labels=labels,
                        valid=valid)


def decode_all_tasks(preds: List[Dict[str, jnp.ndarray]], head_cfg,
                     grid) -> List[DecodedBoxes]:
    return [
        decode_task(
            # reference decodes max_num=500 per task (test_cfg via
            # centerpoint_bbox_coders.py:117-229), NOT pre_max_size
            p, head_cfg.max_num, head_cfg.out_size_factor,
            head_cfg.voxel_size, (grid.x[0], grid.y[0]),
            head_cfg.post_center_range, head_cfg.score_threshold)
        for p in preds
    ]
