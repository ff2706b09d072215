"""Loss assembly + jitted train step.

Mirrors the reference loss dictionary (detectors/ocrfdet.py:
forward_train:331-386): loss_depth, loss_ce_semantic, loss_gs_color,
loss_gs_ssim, loss_render_depth, mask_ce/dice (+ opacity variants), and
the per-task CenterHead losses. Everything is computed inside one
jitted function; `mean_fn` threads the cross-replica reduce_mean used
by the reference (centerpoint_head.py:608, 636).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import OcRFDetConfig
from ..losses.center import center_head_loss
from ..losses.depth import build_depth_semantic_labels, depth_semantic_loss
from ..losses.mask import bev_mask_loss
from ..losses.render import render_losses
from ..models.ocrf.fusion import bev_centerness_weight


def compute_losses(cfg: OcRFDetConfig, preds, aux, batch,
                   mean_fn: Callable = lambda x: x) -> Dict[str, jnp.ndarray]:
    losses: Dict[str, jnp.ndarray] = {}
    B, N = batch["gt_depth"].shape[:2]
    h = cfg.data.input_size[0] // cfg.vt.downsample
    w = cfg.data.input_size[1] // cfg.vt.downsample
    D = cfg.grid.num_depth_bins

    gt_depth = batch["gt_depth"].reshape(B * N, *batch["gt_depth"].shape[2:])
    gt_sem = batch["gt_semantic"].reshape(
        B * N, *batch["gt_semantic"].shape[2:])
    d_onehot, s_onehot, valid = build_depth_semantic_labels(
        gt_depth, gt_sem, cfg.grid.depth, D, cfg.vt.downsample)
    dl, sl = depth_semantic_loss(
        aux["depth"].reshape(B * N, h, w, D),
        aux["semantic"].reshape(B * N, h, w, 2),
        d_onehot, s_onehot, valid,
        cfg.vt.loss_depth_weight, cfg.vt.loss_semantic_weight,
        mean_fn=mean_fn)
    losses["loss_depth"] = dl
    losses["loss_ce_semantic"] = sl

    if "bev_mask_logit" in aux:
        centerness = jnp.asarray(
            bev_centerness_weight(cfg.vt.bev_h, cfg.vt.bev_w),
            dtype=jnp.float32)
        ce, dice = bev_mask_loss(aux["bev_mask_logit"],
                                 batch["gt_bev_mask"], centerness)
        losses["mask_ce_loss"] = ce
        losses["mask_dice_loss"] = dice
    if "opacity_bev_logit" in aux:
        centerness = jnp.asarray(
            bev_centerness_weight(cfg.vt.bev_h, cfg.vt.bev_w),
            dtype=jnp.float32)
        ce, dice = bev_mask_loss(aux["opacity_bev_logit"],
                                 batch["gt_bev_mask"], centerness)
        losses["mask_ce_opacity_loss"] = ce
        losses["mask_dice_opacity_loss"] = dice

    if "render_img" in aux:
        rl = render_losses(
            aux["render_img"], aux["render_img_g"], aux["render_img_n"],
            aux["render_gt_img"],
            aux["render_depth"], aux["render_depth_g"],
            aux["render_depth_n"], aux["render_gt_depth"],
            batch["render_box_mask"],
            batch.get("use_box_mask", jnp.asarray(0.0)))
        losses.update(rl)

    for k in ("loss_Smoothl1_KD", "loss_cos_KD"):
        if k in aux:
            losses[k] = aux[k]

    tgts = {k: batch[k] for k in ("heatmaps", "anno_boxes", "inds", "masks")}
    losses.update(center_head_loss(
        preds, tgts, cfg.head.code_weights,
        loss_bbox_weight=cfg.head.loss_bbox_weight, mean_fn=mean_fn))
    return losses


def total_loss(losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return sum(jnp.asarray(v, dtype=jnp.float32)
               for v in jax.tree.leaves(losses))
