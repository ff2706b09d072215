"""Gaussian preprocessing: 3D covariance -> screen-space conics.

TPU-native replacement for the per-Gaussian preprocess stage of the
reference's CUDA rasterizer (diff-gaussian-rasterization
cuda_rasterizer/forward.cu:118-256): quaternion/scale -> 3D covariance,
EWA projection to a 2D conic, 3-sigma radius, view depth and frustum
cull — all as one batched XLA computation over the full Gaussian set
(the math follows the published 3DGS formulation; nothing is
translated line-by-line).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...geometry.cameras import SplatCamera, ndc_to_pixel


class Gaussians2D(NamedTuple):
    mean2d: jnp.ndarray   # [G, 2] pixel centres
    conic: jnp.ndarray    # [G, 3] inverse-covariance upper triangle
    radius: jnp.ndarray   # [G] float 3-sigma pixel radius (0 = culled)
    depth: jnp.ndarray    # [G] view-space z
    valid: jnp.ndarray    # [G] bool


def quat_scale_to_cov3d(quat, scale):
    """[G,4] (w,x,y,z, any norm) + [G,3] scales -> [G,3,3] covariance."""
    q = quat * jax.lax.rsqrt(
        jnp.sum(quat * quat, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    M = R * scale[..., None, :]          # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def preprocess_gaussians(means3d, cov3d, cam: SplatCamera,
                         near: float = 0.2) -> Gaussians2D:
    """Project Gaussians into one camera.

    means3d [G, 3], cov3d [G, 3, 3]; cam fields unbatched.
    """
    G = means3d.shape[0]
    ones = jnp.ones((G, 1), dtype=means3d.dtype)
    p_h = jnp.concatenate([means3d, ones], axis=-1)
    p_view = p_h @ cam.w2c.T                       # [G, 4]
    tx, ty, tz = p_view[:, 0], p_view[:, 1], p_view[:, 2]
    in_front = tz > near

    # full projection -> pixel centre
    p_clip = p_view @ cam.proj.T
    w_c = jnp.where(jnp.abs(p_clip[:, 3]) < 1e-7, 1e-7, p_clip[:, 3])
    ndc = p_clip[:, :3] / w_c[:, None]
    mean2d = jnp.stack([
        ndc_to_pixel(ndc[:, 0], cam.width),
        ndc_to_pixel(ndc[:, 1], cam.height)], axis=-1)

    # EWA: cov2d = J W Sigma W^T J^T with fov-clamped tangents
    fx = cam.width / (2.0 * cam.tan_fovx)
    fy = cam.height / (2.0 * cam.tan_fovy)
    tz_safe = jnp.where(in_front, tz, 1.0)
    lim_x = 1.3 * cam.tan_fovx
    lim_y = 1.3 * cam.tan_fovy
    txtz = jnp.clip(tx / tz_safe, -lim_x, lim_x)
    tytz = jnp.clip(ty / tz_safe, -lim_y, lim_y)
    zeros = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz_safe, zeros, -fx * txtz / tz_safe], -1),
        jnp.stack([zeros, fy / tz_safe, -fy * tytz / tz_safe], -1),
    ], axis=-2)                                    # [G, 2, 3]
    Wm = cam.w2c[:3, :3]
    T = J @ Wm                                     # [G, 2, 3]
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)    # [G, 2, 2]
    # low-pass dilation: every splat covers >= ~1 pixel
    cov2d = cov2d + 0.3 * jnp.eye(2, dtype=cov2d.dtype)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))
    valid = in_front & det_ok
    radius = jnp.where(valid, radius, 0.0)
    return Gaussians2D(mean2d=mean2d, conic=conic, radius=radius,
                       depth=tz, valid=valid)
