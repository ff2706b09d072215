"""Camera models for the Gaussian-splat renderer.

Column-vector convention throughout (p_cam = W2C @ p_world), unlike the
reference which stores transposed matrices for its CUDA row-vector
kernels (MVSGaussian/lib/utils/data_utils.py:703-733).

Deviation from reference (intentional, documented): the reference
builds its world->view matrix as [R_c2w^T | t_c2w] — mixing a C2W
translation into a W2C pose (getWorld2View2 called with c2w's R and t,
view_transformer_ocrf.py:1135-1153). Since we train from scratch we use
the geometrically consistent W2C = inv(C2W); the learned Gaussian
scale/rotation MLPs see a consistent scene instead of compensating.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class SplatCamera(NamedTuple):
    """Static-shape camera bundle for one rendered view (per sample)."""
    w2c: jnp.ndarray         # [..., 4, 4]
    proj: jnp.ndarray        # [..., 4, 4]  K-based off-centre frustum
    cam_center: jnp.ndarray  # [..., 3]     camera origin in world frame
    tan_fovx: jnp.ndarray    # [...]
    tan_fovy: jnp.ndarray    # [...]
    height: int
    width: int


def focal2fov(focal, pixels):
    return 2.0 * jnp.arctan(pixels / (2.0 * focal))


def projection_matrix_from_K(K, h: int, w: int, znear: float, zfar: float):
    """GL-style asymmetric-frustum projection from intrinsics.

    Same frustum construction as the reference getProjectionMatrix
    (data_utils.py:716-733): principal-point-aware left/right/top/bottom
    planes, +z looking direction, depth mapped to [0, 1] z-range.
    K [..., 3, 3] -> P [..., 4, 4].
    """
    # Derivation: continuous image coord u = (K @ p)_x / z lands on the
    # integer pixel-index grid at u - 0.5 (pixel i's centre is i + 0.5
    # in continuous coords). ndc_to_pixel(ndc, W) = ((ndc+1)W - 1)/2
    # must equal u - 0.5, so ndc_x = 2u/W - 1 and row0 = 2*K_row0/W with
    # the z column shifted by -1. Supports a full affine K (skew from
    # folded rotation augmentation), which the reference's
    # left/right/top/bottom construction cannot.
    zeros = jnp.zeros_like(K[..., 0, 0])
    ones = jnp.ones_like(zeros)
    row0 = jnp.stack([2.0 * K[..., 0, 0] / w, 2.0 * K[..., 0, 1] / w,
                      2.0 * K[..., 0, 2] / w - 1.0, zeros], -1)
    row1 = jnp.stack([2.0 * K[..., 1, 0] / h, 2.0 * K[..., 1, 1] / h,
                      2.0 * K[..., 1, 2] / h - 1.0, zeros], -1)
    row2 = jnp.stack([zeros, zeros, ones * zfar / (zfar - znear),
                      -ones * (zfar * znear) / (zfar - znear)], -1)
    row3 = jnp.stack([zeros, zeros, ones, zeros], -1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def splat_camera(c2w, K, image_size: Tuple[int, int],
                 znear: float = 0.01, zfar: float = 999.9) -> SplatCamera:
    """Build the renderer camera from a camera-to-world pose + K.

    c2w [..., 4, 4], K [..., 3, 3].
    """
    h, w = image_size
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    # W2C = [R^T | -R^T t]
    Rt = jnp.swapaxes(R, -1, -2)
    w2c_t = -jnp.einsum('...ij,...j->...i', Rt, t)
    w2c = jnp.zeros(c2w.shape[:-2] + (4, 4), dtype=c2w.dtype)
    w2c = w2c.at[..., :3, :3].set(Rt)
    w2c = w2c.at[..., :3, 3].set(w2c_t)
    w2c = w2c.at[..., 3, 3].set(1.0)
    proj = projection_matrix_from_K(K, h, w, znear, zfar)
    return SplatCamera(
        w2c=w2c,
        proj=proj,
        cam_center=t,
        tan_fovx=jnp.tan(0.5 * focal2fov(K[..., 0, 0], float(w))),
        tan_fovy=jnp.tan(0.5 * focal2fov(K[..., 1, 1], float(h))),
        height=h, width=w,
    )


def ndc_to_pixel(ndc, size):
    """((x+1)*size - 1) / 2 — the 3DGS pixel-centre convention."""
    return ((ndc + 1.0) * size - 1.0) * 0.5
