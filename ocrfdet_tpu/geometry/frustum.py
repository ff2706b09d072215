"""Frustum / voxel-grid geometry for the LSS and HT branches.

jnp pure functions, jit-safe, all static shapes.

Reference semantics reproduced here:
  * SID (log-spaced) depth bin centres: view_transformer.py:93-99
  * frustum template (pixel x, pixel y, metric depth): :100-106
  * frustum -> key-ego ("lidar") points: get_lidar_coor :108-147
  * voxel index + in-range mask: voxel_pooling_prepare_v2 :219-231
    (NOTE: the reference uses .long() truncation-toward-zero, so
    fractional coords in (-1, 0) land in cell 0 and are kept; we
    reproduce that with astype(int32) on the raw value.)
  * HT pillar reference points: view_transformer_ocrf.py:651-673
  * lidar->image projection for HT: get_projection :675-685,
    get_sampling_point :687-741
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def sid_depth_bins(depth_cfg: Tuple[float, float, float]) -> np.ndarray:
    """Spacing-increasing depth bin centres, D = len(arange(*depth_cfg)).

    d_i = exp(log(lo) + i/(D-1) * log((hi-1)/lo)), i in [0, D).
    """
    lo, hi, step = depth_cfg
    D = len(np.arange(lo, hi, step))
    i = np.arange(D, dtype=np.float64)
    return np.exp(np.log(lo) + i / (D - 1) * np.log((hi - 1.0) / lo))


def make_frustum(depth_cfg, input_size, downsample, sid=True) -> np.ndarray:
    """[D, fH, fW, 3] template of (x_pix, y_pix, depth_m) in the raw
    (augmented) input-image pixel frame."""
    H_in, W_in = input_size
    fH, fW = H_in // downsample, W_in // downsample
    if sid:
        d = sid_depth_bins(depth_cfg)
    else:
        d = np.arange(*depth_cfg, dtype=np.float64)
    D = d.shape[0]
    xs = np.linspace(0, W_in - 1, fW)
    ys = np.linspace(0, H_in - 1, fH)
    out = np.empty((D, fH, fW, 3), dtype=np.float32)
    out[..., 0] = xs[None, None, :]
    out[..., 1] = ys[None, :, None]
    out[..., 2] = d[:, None, None]
    return out


def frustum_to_ego(frustum, rots, trans, intrins, post_rots, post_trans, bda):
    """Frustum template -> points in the (BDA-augmented) key-ego frame.

    frustum [D,fH,fW,3]; rots/intrins/post_rots [B,N,3,3];
    trans/post_trans [B,N,3]; bda [B,3,3]. Returns [B,N,D,fH,fW,3].
    """
    B, N = rots.shape[:2]
    pts = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)
    pts = jnp.einsum('bnij,bndhwj->bndhwi', inv_post, pts)
    # un-project: (u*d, v*d, d)
    pts = jnp.concatenate(
        [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1)
    combine = rots @ jnp.linalg.inv(intrins)
    pts = jnp.einsum('bnij,bndhwj->bndhwi', combine, pts)
    pts = pts + trans[:, :, None, None, None, :]
    pts = jnp.einsum('bij,bndhwj->bndhwi', bda, pts)
    return pts


def voxel_indices(coor, grid_lower, grid_interval, grid_size):
    """Ego-frame points -> integer voxel indices + validity mask.

    coor [..., 3]; returns (idx [..., 3] int32 (x,y,z), valid [...]).
    Truncation toward zero replicates the reference .long() cast.
    """
    rel = (coor - jnp.asarray(grid_lower)) / jnp.asarray(grid_interval)
    idx = rel.astype(jnp.int32)
    gs = jnp.asarray(grid_size)
    valid = ((idx[..., 0] >= 0) & (idx[..., 0] < gs[0]) &
             (idx[..., 1] >= 0) & (idx[..., 1] < gs[1]) &
             (idx[..., 2] >= 0) & (idx[..., 2] < gs[2]))
    return idx, valid


def ht_reference_points(bev_h: int, bev_w: int, num_height: int = 13,
                        z_pillar: float = 8.0) -> np.ndarray:
    """Normalised [0,1]^3 sample points for the height-trick branch.

    [Z, bev_h*bev_w, 3] with the reference's non-uniform z profile
    (view_transformer_ocrf.py:664-666): 5 points linspace(3, Z-1) then
    (num_height-5) points linspace(0.5, Z-0.5), all divided by Z.
    """
    zs_l = np.linspace(3.0, z_pillar - 1.0, 5)
    zs_g = np.linspace(0.5, z_pillar - 0.5, num_height - 5)
    zs = np.concatenate([zs_l, zs_g]) / z_pillar
    xs = (np.arange(bev_w) + 0.5) / bev_w
    ys = (np.arange(bev_h) + 0.5) / bev_h
    out = np.empty((num_height, bev_h, bev_w, 3), dtype=np.float32)
    out[..., 0] = xs[None, None, :]
    out[..., 1] = ys[None, :, None]
    out[..., 2] = zs[:, None, None]
    return out.reshape(num_height, bev_h * bev_w, 3)


def ego_to_image(rots, trans, intrins, post_rots, post_trans, bda):
    """Build the (BDA-aware) ego->image projection used by HT sampling.

    Returns (lidar2img [B,N,3,4], img_aug [B,N,3,4]) such that a
    homogeneous ego point X projects as:
        p = lidar2img[..., :3] @ X + lidar2img[..., 3]
        (u, v) = img_aug applied to (p.xy / p.z, p.z, 1).
    Mirrors get_projection (view_transformer_ocrf.py:675-685).
    """
    B, N = rots.shape[:2]
    bda_bn = jnp.broadcast_to(bda[:, None], (B, N, 3, 3))
    inv_rot = jnp.linalg.inv(rots)
    R = intrins @ inv_rot @ jnp.linalg.inv(bda_bn)
    t = -(intrins @ inv_rot @ trans[..., None])
    lidar2img = jnp.concatenate([R, t], axis=-1)
    img_aug = jnp.concatenate([post_rots, post_trans[..., None]], axis=-1)
    return lidar2img, img_aug


def project_points(ref_points, pc_range, depth_range, lidar2img, img_aug,
                   image_size):
    """Project normalised grid points into every camera.

    ref_points [Z, Nq, 3] in [0,1]^3; lidar2img/img_aug [B,N,3,4].
    Returns:
      uvd   [B,N,Z,Nq,3]  (u,v normalised to [0,1] image, d normalised
                           to [0,1] over depth_range)
      valid [B,N,Z,Nq]    bool
    Mirrors get_sampling_point (view_transformer_ocrf.py:687-741).
    """
    pc = jnp.asarray(pc_range)
    p = ref_points * (pc[3:6] - pc[0:3]) + pc[0:3]          # [Z,Nq,3]
    Z, Nq = p.shape[:2]
    B, N = lidar2img.shape[:2]
    p = p.reshape(Z * Nq, 3)
    cam = jnp.einsum('bnij,kj->bnki', lidar2img[..., :3], p) \
        + lidar2img[..., None, :, 3]
    eps = 1e-5
    depth = cam[..., 2:3]
    in_front = depth > eps
    uv1 = jnp.concatenate([
        cam[..., 0:2] / jnp.maximum(depth, eps),
        depth, jnp.ones_like(depth)], axis=-1)
    uv = jnp.einsum('bnij,bnkj->bnki', img_aug, uv1)[..., 0:2]
    H, W = image_size
    u = uv[..., 0] / W
    v = uv[..., 1] / H
    d = (depth[..., 0] - depth_range[0]) / (depth_range[1] - depth_range[0])
    valid = (in_front[..., 0] & (u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0)
             & (d > 0.0) & (d < 1.0))
    uvd = jnp.stack([u, v, d], axis=-1).reshape(B, N, Z, Nq, 3)
    return uvd, valid.reshape(B, N, Z, Nq)
