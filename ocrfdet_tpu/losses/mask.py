"""BEV mask / opacity losses (BCE + Dice, centerness-weighted).

Reference ProbNet.get_bev_mask_loss / get_bev_opacity_loss + DiceLoss
(view_transformer_ocrf.py:139-270): BCEWithLogits with pos_weight 2.13
weighted by the bev centerness map, plus sigmoid Dice with weight 6.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logit, target, pos_weight: float = 2.13):
    """Elementwise BCE-with-logits with positive-class weighting."""
    log_p = jax.nn.log_sigmoid(logit)
    log_1mp = jax.nn.log_sigmoid(-logit)
    return -(pos_weight * target * log_p + (1.0 - target) * log_1mp)


def dice_loss(logit, target, smooth: float = 1e-5):
    p = jax.nn.sigmoid(logit).reshape(-1)
    t = target.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def bev_mask_loss(pred_logit, gt_mask, centerness, loss_weight: float = 6.0):
    """pred_logit [B, H, W(, 1)], gt_mask [B, H, W],
    centerness [H, W]. Returns (ce_loss, dice) both already weighted."""
    if pred_logit.ndim == 4:
        pred_logit = pred_logit[..., 0]
    pred_logit = pred_logit.astype(jnp.float32)
    gt = gt_mask.astype(jnp.float32)
    ce = bce_with_logits(pred_logit, gt)
    ce = jnp.mean(ce * centerness[None])
    return loss_weight * ce, loss_weight * dice_loss(pred_logit, gt)
