"""Small render-parameter heads of the OcRF branch.

Reference view_transformer_ocrf.py:272-365, 534-573: the per-voxel
Gaussian parameter MLPs (scale/rotation/opacity/color), the NeRF-side
MLPs, the image-feature ResizeNetwork (conv + transposed-conv
upsamples back to full image resolution), and the learned scalar blend
of Gaussian and NeRF renders.

All MLPs are 2-layer with hidden width 4 (tiny by design -- they run
over 13x128x128 voxels).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MLP2(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SigmaMLP(nn.Module):
    """NeRF density head: two STACKED Linears (no inner activation)
    ending in softplus (view_transformer_ocrf.py:605 builds
    nn.Sequential(Linear, Linear, Softplus))."""
    hidden: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.Dense(1, dtype=self.dtype, name="fc2")(x)
        return nn.softplus(x)


class ScaleMLP(nn.Module):
    hidden: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.softplus(MLP2(self.hidden, 3, self.dtype, name="mlp")(x))


class RotationMLP(nn.Module):
    hidden: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = MLP2(self.hidden, 4, self.dtype, name="mlp")(x)
        # eps INSIDE the sqrt: a post-hoc clip still produces NaN grads
        # for exactly-zero q (dead-ReLU voxels at init)
        return q * jax.lax.rsqrt(
            jnp.sum(q * q, axis=-1, keepdims=True) + 1e-8)


class OpacityMLP(nn.Module):
    hidden: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return jax.nn.sigmoid(MLP2(self.hidden, 1, self.dtype,
                                   name="mlp")(x))


class ColorMLP(nn.Module):
    """Input: voxel feature concat mean reprojected RGB (3 extra)."""
    hidden: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return jax.nn.sigmoid(MLP2(self.hidden, 3, self.dtype,
                                   name="mlp")(x))


class ResizeNetwork(nn.Module):
    """FPN feature [h, w, 256] -> full-res [16h, 16w, C_out]:
    conv->up x2 -> conv -> up x2 -> up x4 (all transposed convs)."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.ConvTranspose(64, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="up1")(x)
        x = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up2")(x)
        x = nn.ConvTranspose(self.out_channels, (4, 4), strides=(4, 4),
                             dtype=self.dtype, name="up3")(x)
        return x


class LearnedBlend(nn.Module):
    """w*a + (1-w)*b with a single learned scalar, w init 0.5."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        w = self.param("w", nn.initializers.constant(0.5), ())
        return w * a + (1.0 - w) * b
