"""Lift-Splat-Shoot view transformer (BEVDepth/BEVStereo style).

TPU-native redesign of the reference LSSViewTransformer family
(models/necks/view_transformer.py:15-313, 687-789): the frustum is a
static numpy template; frustum->ego projection, voxel indexing and
pooling all happen in-graph with static shapes (no host rank
precompute -- the reference's `accelerate` path is unnecessary because
XLA compiles the whole computation once).

Outputs channel-last [B, Y, X, C] BEV features.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import GridConfig, ViewTransformerConfig
from ..geometry import frustum as FR
from ..ops.bev_pool import bev_pool_lss
from .depthnet import DepthNet, stereo_cost_volume

Dtype = Any


class CameraParams(NamedTuple):
    """Per-frame camera bundle (all [B, N, ...])."""
    rots: jnp.ndarray        # [B,N,3,3] sensor->key-ego rotation
    trans: jnp.ndarray       # [B,N,3]   sensor->key-ego translation
    intrins: jnp.ndarray     # [B,N,3,3]
    post_rots: jnp.ndarray   # [B,N,3,3]
    post_trans: jnp.ndarray  # [B,N,3]
    bda: jnp.ndarray         # [B,3,3]


class StereoMetas(NamedTuple):
    prev_feat: jnp.ndarray   # [B,N,Hc,Wc,C] previous-frame stem feature
    k2s_sensor: jnp.ndarray  # [B,N,4,4] key->sweep sensor transform


class LSSViewTransformer(nn.Module):
    """DepthNet + depth-weighted splat. The OcRF transformer composes
    this with its HT/render branches."""
    grid: GridConfig
    cfg: ViewTransformerConfig
    input_size: tuple  # (H, W)
    semantic_channels: int = 2   # 0 for plain BEVDepth behaviour
    dtype: Dtype = jnp.float32
    pool_impl: str = "matmul"

    def setup(self):
        self.frustum = jnp.asarray(FR.make_frustum(
            self.grid.depth, self.input_size, self.cfg.downsample))
        # kept as NUMPY: the cost-volume kernel needs concrete depth
        # values for its static plane chunking (under jit, jnp
        # constants become tracers; np constants stay concrete)
        self.cv_frustum = np.asarray(FR.make_frustum(
            self.grid.depth, self.input_size, self.cfg.depthnet.cv_downsample))
        self.D = self.grid.num_depth_bins
        self.depth_net = DepthNet(
            mid_channels=self.cfg.in_channels,
            context_channels=self.cfg.out_channels,
            depth_channels=self.D + self.semantic_channels,
            stereo=self.cfg.depthnet.stereo,
            use_aspp=self.cfg.depthnet.use_aspp,
            aspp_mid_channels=self.cfg.depthnet.aspp_mid_channels,
            aspp_dropout=self.cfg.depthnet.aspp_dropout,
            cv_downsample=self.cfg.depthnet.cv_downsample,
            dtype=self.dtype,
            name="depth_net")

    def __call__(self, x, cams: CameraParams, mlp_input,
                 cost_volume=None, train: bool = False):
        """Returns (bev [B,Y,X,C_out], depth, semantic, context).

        `cost_volume` is the pre-computed stride-4 stereo cost volume
        ([BN, 4h, 4w, D]) or None; the caller owns cost-volume
        computation because it needs the *previous frame's* stem
        features which live outside this module
        (reference BEVStereo4D.prepare_bev_feat, detectors/bevdet.py:
        629-649).
        """
        B, N, h, w, C = x.shape
        out = self.depth_net(
            x.reshape(B * N, h, w, C), mlp_input.reshape(B * N, -1),
            cost_volume=cost_volume, train=train)
        D, S = self.D, self.semantic_channels
        depth_logit = out[..., :D].astype(jnp.float32)
        depth = jax.nn.softmax(depth_logit, axis=-1)
        semantic = None
        if S:
            semantic = jax.nn.softmax(
                out[..., D:D + S].astype(jnp.float32), axis=-1)
        context = out[..., D + S:D + S + self.cfg.out_channels]
        depth = depth.reshape(B, N, h, w, D)
        context = context.reshape(B, N, h, w, -1)
        if semantic is not None:
            semantic = semantic.reshape(B, N, h, w, S)
        return depth, semantic, context

    def splat(self, depth, context, cams: CameraParams,
              psum_axis=None):
        """Depth-weighted pooling onto the BEV grid.

        depth [B,N,h,w,D], context [B,N,h,w,C] -> bev [B,Y,X,C].
        The BEV is a SUM over cameras, so with cameras sharded over a
        mesh axis each shard pools its local block and `psum_axis`
        restores the full-camera sum over ICI.
        """
        grid = self.grid
        coor = FR.frustum_to_ego(
            self.frustum, cams.rots, cams.trans, cams.intrins,
            cams.post_rots, cams.post_trans, cams.bda)
        X, Y = grid.bev_size
        Z = 1  # the OcRF grid collapses z (z step == full range)
        vox_idx, valid = FR.voxel_indices(
            coor, (grid.x[0], grid.y[0], grid.z[0]),
            (grid.x[2], grid.y[2], grid.z[2]), (X, Y, Z))
        # depth laid out [B,N,D,h,w] for pooling
        depth_d = jnp.moveaxis(depth, -1, 2)
        bev = bev_pool_lss(depth_d, context, vox_idx, valid, (X, Y, Z),
                           impl=self.pool_impl)
        if psum_axis is not None:
            bev = jax.lax.psum(bev, psum_axis)
        return bev
