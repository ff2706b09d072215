"""Windowed SSIM (gaussian window 11, per-channel depthwise conv).

Matches the reference SSIM module
(MVSGaussian/lib/train/losses/ssim_loss.py:1-75): gaussian window
sigma 1.5, same-padding depthwise convolutions, C1=0.01^2, C2=0.03^2,
size-averaged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g)


def _depthwise(img, window):
    """img [B, H, W, C]; window [k, k] applied per channel, SAME pad."""
    C = img.shape[-1]
    k = window.shape[0]
    w = jnp.asarray(window, img.dtype)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        img, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over [B, H, W, C] images in [0, 1]."""
    win = _gaussian_window(window_size, sigma)
    mu1 = _depthwise(img1, win)
    mu2 = _depthwise(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise(img1 * img1, win) - mu1_sq
    s2 = _depthwise(img2 * img2, win) - mu2_sq
    s12 = _depthwise(img1 * img2, win) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    num = (2 * mu12 + C1) * (2 * s12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    return jnp.mean(num / den)
