"""OcRFDet-TPU: a TPU-native multi-view 3D detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of OcRFDet
(object-centric radiance fields for multi-view 3D object detection on
nuScenes; reference implementation: Mingqj/OcRFDet, PyTorch/CUDA/mmdet3d).

Design stance (TPU-first, not a port):
  * functional core: every model is a flax.linen module used inside ONE
    jitted train step; all losses are computed in-graph; no per-sample
    Python loops.
  * static shapes everywhere (6 cams, 256x704 input, D=118 SID depth
    bins, 13x128x128 voxel grid) so XLA can tile onto the MXU.
  * hot ops (frustum pooling, Gaussian splatting) have a pure-XLA
    reference path and a Pallas TPU kernel path, selected via config.
  * distribution via jax.sharding.Mesh + shard_map: a `data` axis for
    batch parallelism (reference only has DDP) and an optional `space`
    axis that shards cameras / BEV tiles.

Package layout:
  config      typed experiment configuration (replaces mmcv Config)
  geometry    cameras, SE(3)/quaternion math, frustums, augmentations
  ops         bev_pool, grid_sample, splat renderer, NMS, SSIM
  models      backbone / necks / view transformers / heads / detectors
  losses      depth, semantic, render, mask, detection losses
  core        box structures, target generation, decode + post-process
  data        nuScenes info readers, pipelines, synthetic data
  train       optimizer, EMA, schedules, train step, checkpointing
  parallel    mesh construction and sharded train/eval steps
"""

__version__ = "0.1.0"
