"""Rendering supervision (color MSE, SSIM, depth L1).

Reference OcRFViewTransformerFull.get_loss (view_transformer_ocrf.py:
1354-1417): for each sample's rendered camera, MSE x20 + (1-SSIM) x1 on
the color image and L1 x1 on min-max-normalised depth, each averaged
over {blended, Gaussian-only, NeRF-only} renders. After a warmup
(iteration > 2 epochs in the reference) the color losses are masked to
2D GT box regions; we take the mask as a pipeline-provided image
(replacing the reference's in-graph Box2dtoMask python loop) and gate
it with a traced `use_box_mask` scalar so the jitted graph covers both
phases.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.ssim import ssim


def render_losses(render_ng, render_g, render_n, gt_image,
                  depth_ng, depth_g, depth_n, gt_depth,
                  box_mask, use_box_mask,
                  color_weight: float = 20.0, ssim_weight: float = 1.0,
                  depth_weight: float = 1.0) -> Dict[str, jnp.ndarray]:
    """All images [B, H, W, 3] in [0,1]; depths [B, H, W]; gt_depth is
    the sparse metric depth map [B, H, W]; box_mask [B, H, W]."""
    m = jnp.where(use_box_mask > 0, box_mask, jnp.ones_like(box_mask))
    m3 = m[..., None]
    gt_m = gt_image * m3

    def color_pair(r):
        rm = r * m3
        return jnp.mean((rm - gt_m) ** 2), 1.0 - ssim(rm, gt_m)

    mses, ssims = zip(*[color_pair(r)
                        for r in (render_ng, render_g, render_n)])
    color_loss = color_weight * sum(mses) / 3.0
    ssim_loss = ssim_weight * sum(ssims) / 3.0

    # depth: min-max normalise GT per sample (reference :1399-1402)
    dmin = jnp.min(gt_depth, axis=(1, 2), keepdims=True)
    dmax = jnp.max(gt_depth, axis=(1, 2), keepdims=True)
    gt_d = (gt_depth - dmin) / (dmax - dmin + 0.01)
    d_losses = [jnp.mean(jnp.abs(d - gt_d))
                for d in (depth_ng, depth_g, depth_n)]
    depth_loss = depth_weight * sum(d_losses) / 3.0

    return dict(loss_gs_color=color_loss, loss_gs_ssim=ssim_loss,
                loss_render_depth=depth_loss)
