"""Host-side BEV NMS (rotated + circle) and the Scale-NMS task merge.

Replaces the reference's CUDA mmcv.ops.nms_rotated path
(core/post_processing/box3d_nms.py:231-268) and numba circle_nms
(:182-225). Eval-time box counts are tiny (<=1000 per task), so numpy
is fast enough; a C++ ctypes implementation can be slotted in behind
`rotated_iou_matrix` later without touching callers.

Scale-NMS (class-wise box rescaling before NMS, then un-scaling) and
the cross-task merge mirror CenterHead.get_task_detections / get_bboxes
(centerpoint_head.py:670-901).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from . import _nms_native


def _box_corners(boxes: np.ndarray) -> np.ndarray:
    """[N, 5] (cx, cy, dx, dy, yaw) -> [N, 4, 2] corner polygons."""
    cx, cy, dx, dy, yaw = boxes.T
    cos, sin = np.cos(yaw), np.sin(yaw)
    hx, hy = dx / 2, dy / 2
    local = np.stack([
        np.stack([hx, hy], -1), np.stack([-hx, hy], -1),
        np.stack([-hx, -hy], -1), np.stack([hx, -hy], -1)], axis=1)
    rot = np.stack([np.stack([cos, -sin], -1),
                    np.stack([sin, cos], -1)], axis=1)   # [N,2,2]
    pts = np.einsum('nij,nkj->nki', rot, local)
    pts[..., 0] += cx[:, None]
    pts[..., 1] += cy[:, None]
    return pts


def _cross2(u, v) -> float:
    return u[0] * v[1] - u[1] * v[0]


def _poly_clip(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman convex clip of polygon `subject` by `clip`."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = b - a
        inp, out = out, []
        if not inp:
            break
        prev = inp[-1]
        prev_in = _cross2(edge, prev - a) >= 0
        for cur in inp:
            cur_in = _cross2(edge, cur - a) >= 0
            if cur_in != prev_in:
                t_den = _cross2(edge, cur - prev)
                if abs(t_den) > 1e-12:
                    t = _cross2(edge, a - prev) / t_den
                    out.append(prev + t * (cur - prev))
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
    return np.asarray(out)


def _poly_area(p: np.ndarray) -> float:
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def rotated_iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Exact IoU of rotated BEV rectangles [*,5] (cx, cy, dx, dy, yaw)."""
    if _nms_native.available():
        return _nms_native.rotated_iou_matrix(boxes_a, boxes_b)
    ca = _box_corners(boxes_a)
    cb = _box_corners(boxes_b)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    iou = np.zeros((len(boxes_a), len(boxes_b)))
    for i in range(len(boxes_a)):
        for j in range(len(boxes_b)):
            inter = _poly_area(_poly_clip(ca[i], cb[j]))
            union = area_a[i] + area_b[j] - inter
            if union > 1e-12:
                iou[i, j] = inter / union
    return iou


def nms_rotated(boxes: np.ndarray, scores: np.ndarray, iou_thr: float,
                pre_max_size: int | None = None,
                post_max_size: int | None = None) -> np.ndarray:
    """Greedy rotated NMS; boxes [N, 5] (cx, cy, dx, dy, yaw)."""
    order = np.argsort(-scores)
    if pre_max_size is not None:
        order = order[:pre_max_size]
    if _nms_native.available():
        keep_local = _nms_native.nms_rotated(boxes[order], iou_thr)
        keep = order[keep_local]
        return keep[:post_max_size] if post_max_size else keep
    boxes_s = boxes[order]
    iou = rotated_iou_matrix(boxes_s, boxes_s)
    n = len(order)
    suppressed = np.zeros(n, dtype=bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > iou_thr
        suppressed[i] = True
    keep = np.asarray(keep, dtype=np.int64)
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return keep


def circle_nms(centers_scores: np.ndarray, radius_thr: float,
               post_max_size: int = 83) -> np.ndarray:
    """Centre-distance NMS [N, 3] (x, y, score); squared-distance
    threshold as in the reference (box3d_nms.py:182-225)."""
    x, y, scores = centers_scores.T
    order = np.argsort(-scores)
    suppressed = np.zeros(len(order), dtype=bool)
    keep = []
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        d2 = (x[i] - x[order[oi + 1:]]) ** 2 + (y[i] - y[order[oi + 1:]]) ** 2
        suppressed[order[oi + 1:][d2 <= radius_thr]] = True
    return np.asarray(keep[:post_max_size], dtype=np.int64)


def multi_task_nms(task_results: List[Dict[str, np.ndarray]], head_cfg
                   ) -> Dict[str, np.ndarray]:
    """Scale-NMS over decoded tasks for ONE sample, then merge.

    task_results[t]: dict(boxes [K,9], scores [K], labels [K],
    valid [K]) from core.coder.decode_task (already thresholded via
    `valid`). Returns merged dict(boxes [M,9] bottom-centre z,
    scores [M], labels [M] global ids).
    """
    merged_boxes, merged_scores, merged_labels = [], [], []
    class_offset = 0
    for t, res in enumerate(task_results):
        m = res["valid"].astype(bool)
        boxes = res["boxes"][m].copy()
        scores = res["scores"][m]
        labels = res["labels"][m]
        n_cls = len(head_cfg.tasks[t].class_names)
        if len(boxes):
            if head_cfg.nms_type[t] == "circle":
                radius = head_cfg.circle_nms_min_radius[t]
                keep = circle_nms(
                    np.concatenate([boxes[:, :2], scores[:, None]], -1),
                    radius, post_max_size=head_cfg.post_max_size)
            else:
                factor = head_cfg.nms_rescale_factor[t]
                scaled = boxes.copy()
                if isinstance(factor, (tuple, list)):
                    for cid, f in enumerate(factor):
                        scaled[labels == cid, 3:6] *= f
                else:
                    scaled[:, 3:6] *= factor
                bev = scaled[:, [0, 1, 3, 4, 6]]
                keep = nms_rotated(
                    bev, scores, head_cfg.nms_thr[t],
                    pre_max_size=head_cfg.pre_max_size,
                    post_max_size=head_cfg.post_max_size)
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
        merged_boxes.append(boxes)
        merged_scores.append(scores)
        merged_labels.append(labels + class_offset)
        class_offset += n_cls
    boxes = (np.concatenate(merged_boxes)
             if merged_boxes else np.zeros((0, 9)))
    if len(boxes):
        boxes = boxes.copy()
        boxes[:, 2] -= boxes[:, 5] * 0.5   # gravity -> bottom centre
    return dict(
        boxes=boxes,
        scores=(np.concatenate(merged_scores)
                if merged_scores else np.zeros((0,))),
        labels=(np.concatenate(merged_labels)
                if merged_labels else np.zeros((0,), dtype=np.int64)))
