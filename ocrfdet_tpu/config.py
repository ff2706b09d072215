"""Typed experiment configuration.

Replaces the reference's mmcv Config python-dict system
(/root/reference/configs/ocrfdet/ocrfdet.py) with frozen dataclasses.
Every leaf parameter of the reference experiment config is represented;
`ocrfdet_config()` reproduces configs/ocrfdet/ocrfdet.py:31-154 and
`tiny_config()` gives a CPU-runnable miniature for tests.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

CLASS_NAMES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


@dataclass(frozen=True)
class GridConfig:
    """BEV/depth grid (reference configs/ocrfdet/ocrfdet.py:31-37)."""
    x: Tuple[float, float, float] = (-51.2, 51.2, 0.8)
    y: Tuple[float, float, float] = (-51.2, 51.2, 0.8)
    z: Tuple[float, float, float] = (-5.0, 3.0, 8.0)
    # (lower, upper, step); SID spacing is applied on top of this range.
    depth: Tuple[float, float, float] = (1.0, 60.0, 0.5)

    @property
    def bev_size(self) -> Tuple[int, int]:
        nx = int(round((self.x[1] - self.x[0]) / self.x[2]))
        ny = int(round((self.y[1] - self.y[0]) / self.y[2]))
        return nx, ny

    @property
    def num_z(self) -> int:
        return int(round((self.z[1] - self.z[0]) / self.z[2]))

    @property
    def num_depth_bins(self) -> int:
        lo, hi, step = self.depth
        return int(round((hi - lo) / step))  # 118 for (1, 60, 0.5)

    @property
    def pc_range(self) -> Tuple[float, float, float, float, float, float]:
        return (self.x[0], self.y[0], self.z[0], self.x[1], self.y[1], self.z[1])


@dataclass(frozen=True)
class DataConfig:
    """Camera set + image augmentation (reference config data_config)."""
    cams: Tuple[str, ...] = (
        "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
    )
    num_cams: int = 6
    input_size: Tuple[int, int] = (256, 704)  # (H, W)
    src_size: Tuple[int, int] = (900, 1600)
    resize: Tuple[float, float] = (-0.06, 0.11)
    rot: Tuple[float, float] = (-5.4, 5.4)
    flip: bool = True
    crop_h: Tuple[float, float] = (0.0, 0.0)
    resize_test: float = 0.0
    # decode JPEGs at the nearest >= target scale inside libjpeg
    # (PIL draft mode): ~3x cheaper host decode for the 900x1600 ->
    # ~0.48x resize. The interim resample kernel differs slightly from
    # a full-res decode + bilinear resize (PARITY.md); set False for
    # bit-faithful reference augmentation.
    jpeg_draft: bool = True


@dataclass(frozen=True)
class BdaConfig:
    """BEV data augmentation (reference bda_aug_conf)."""
    rot_lim: Tuple[float, float] = (-22.5, 22.5)
    scale_lim: Tuple[float, float] = (0.95, 1.05)
    flip_dx_ratio: float = 0.5
    flip_dy_ratio: float = 0.5


@dataclass(frozen=True)
class BackboneConfig:
    """ResNet image backbone (reference config img_backbone)."""
    depth: int = 50
    # Features returned: stage indices (0-based after stem). (0, 2, 3)
    # -> stage-1 feature (stereo), stage-3 + stage-4 features (FPN).
    out_indices: Tuple[int, ...] = (0, 2, 3)
    remat: bool = True  # with_cp in the reference


@dataclass(frozen=True)
class DepthNetConfig:
    """DepthNet (reference depthnet_cfg + DepthNet ctor defaults)."""
    mid_channels: int = 256
    use_aspp: bool = True
    aspp_mid_channels: int = 96
    # reference ASPP ends with Dropout(0.5) (view_transformer.py:395);
    # active only in the sharded train step (needs a 'dropout' rng)
    aspp_dropout: float = 0.5
    stereo: bool = True
    cost_volume_bias: float = 5.0
    cost_volume_group_size: int = 4
    # Stereo cost-volume resolution. The reference computes at /4 and
    # conv-downsamples to /16 before use (view_transformer.py:614-616).
    # Reference computes the stereo cost volume at /4
    # (view_transformer.py:568-616); that is the default until an
    # accuracy run proves coarser variants harmless. Set 16 for the
    # fast opt-in (skips the 4x4 finer plane sweep whose detail the
    # stride-2 cv convs discard).
    cv_downsample: int = 4
    # warp implementation: 'mm' (Pallas MXU one-hot matmul — the TPU
    # fast path), 'scan' (depth-chunked gather), 'auto' (mm on TPU,
    # scan elsewhere). See ops/cost_volume.py.
    cv_impl: str = "auto"
    # source-column window width of the mm kernel; >= feature width
    # disables windowing (exact for any geometry, ~3.7x the matmul
    # FLOPs at flagship shapes)
    cv_win: int = 32
    cv_win_h: int = 32
    # destination pixel tile of the mm kernel. Narrower tiles need
    # narrower column windows (the per-plane x-span scales with tile
    # width): 16x8 tiles with a 32x32 window measured 12% faster than
    # 16x16/48x32 at flagship shapes with a slightly SMALLER deviation
    # vs the gather path (r4 sweep; see ops/cost_volume.py).
    cv_tile: Tuple[int, int] = (16, 8)
    # per-plane-group windows ((end_idx, win_w, win_h), ...), chosen
    # from the measured per-plane span profile at flagship geometry
    # under live augmentation (tools_tpu/cv_window_audit.py,
    # CV_AUDIT_r05.json): planes < 48 (< ~5.3 m) carry metres of
    # disparity spread and keep the wide window; planes 48-63 need
    # <= 15x32 (win 24x32 leaves margin); planes >= 64 need <= 12x27.
    # Covers the default 118-plane SID grid; None or a non-covering
    # spec falls back to the uniform (cv_win, cv_win_h) window. These
    # groups were validated clamp-equivalent to the uniform window by
    # the audit (zero extra clamps on every draw). NOTE: chosen for
    # the flagship input shapes — re-run the audit before reusing on a
    # different geometry.
    cv_plane_groups: Tuple[Tuple[int, int, int], ...] = (
        (48, 32, 32), (64, 24, 32), (9999, 16, 32))


@dataclass(frozen=True)
class ViewTransformerConfig:
    """OcRF view transformer (reference img_view_transformer + class init,
    view_transformer_ocrf.py:577-650)."""
    in_channels: int = 256
    out_channels: int = 80           # numC_Trans
    downsample: int = 16
    bev_h: int = 128
    bev_w: int = 128
    num_height: int = 13             # gaussians per pillar
    depth_threshold: float = 1.0     # divided by D at runtime
    semantic_threshold: float = 0.25
    loss_depth_weight: float = 3.0
    loss_semantic_weight: float = 25.0
    depthnet: DepthNetConfig = field(default_factory=DepthNetConfig)
    # renderer: 'dense' (exact O(G*H*W) reference compositor), 'xla'
    # (tiled, XLA scan composite) or 'pallas' (tiled, fused Pallas
    # composite kernel — the TPU fast path)
    renderer: str = "pallas"
    # HT-branch pooling: 'mm' (Pallas MXU one-hot matmul,
    # ops/ht_pool.py), 'gather' (take_along_axis formulation), or
    # 'auto' (mm on TPU)
    ht_impl: str = "auto"
    # voxel-point sampling of full-res alpha/RGB maps: 'mm' (Pallas
    # separable tent matmul, ops/point_sample.py), 'gather', 'auto'
    sample_impl: str = "auto"
    render_image_size: Tuple[int, int] = (256, 704)
    znear: float = 0.01
    zfar: float = 999.9
    # PROFILING-ONLY ablations (never set in a real run — they change
    # the math): subsets of {'nerf','hoa','sample','render'} skip the
    # corresponding OcRF sub-block so tools_tpu/step_variants.py can
    # attribute step time by difference (the tunnelled TPU trace drops
    # most device events, so differential timing is the reliable
    # attribution; see VT __call__ for each seam).
    ablate: Tuple[str, ...] = ()


@dataclass(frozen=True)
class BevEncoderConfig:
    """CustomResNet + FPN_LSS (reference img_bev_encoder_*)."""
    num_layer: Tuple[int, ...] = (2, 2, 2)
    stride: Tuple[int, ...] = (2, 2, 2)
    # channels are multiples of the (temporal-concat) input channels
    channel_mults: Tuple[int, ...] = (2, 4, 8)
    neck_out_channels: int = 256


@dataclass(frozen=True)
class TaskConfig:
    class_names: Tuple[str, ...]


@dataclass(frozen=True)
class CenterHeadConfig:
    """CenterHead (reference config pts_bbox_head + train/test_cfg)."""
    in_channels: int = 256
    share_conv_channel: int = 64
    tasks: Tuple[TaskConfig, ...] = (
        TaskConfig(("car",)),
        TaskConfig(("truck", "construction_vehicle")),
        TaskConfig(("bus", "trailer")),
        TaskConfig(("barrier",)),
        TaskConfig(("motorcycle", "bicycle")),
        TaskConfig(("pedestrian", "traffic_cone")),
    )
    common_heads: Tuple[Tuple[str, int], ...] = (
        ("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2),
    )
    head_conv_channel: int = 64
    num_head_convs: int = 2
    final_kernel: int = 3
    init_bias: float = -2.19
    norm_bbox: bool = True
    loss_bbox_weight: float = 0.25
    code_weights: Tuple[float, ...] = (1.0,) * 10
    # target assigner (train_cfg.pts)
    out_size_factor: int = 8
    voxel_size: Tuple[float, float] = (0.1, 0.1)
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    max_objs: int = 500
    # decode / NMS (test_cfg.pts)
    post_center_range: Tuple[float, ...] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    max_num: int = 500
    score_threshold: float = 0.1
    pre_max_size: int = 1000
    post_max_size: int = 83
    nms_type: Tuple[str, ...] = ("rotate", "rotate", "rotate", "circle", "rotate", "rotate")
    nms_thr: Tuple[float, ...] = (0.3, 0.1, 0.1, 0.1, 0.1, 0.5)
    nms_rescale_factor: Tuple = (1.0, (0.7, 0.7), (0.4, 0.55), 1.1, (1.0, 1.0), (4.5, 9.0))
    circle_nms_min_radius: Tuple[float, ...] = (4, 12, 10, 1, 0.85, 0.175)

    @property
    def num_classes(self) -> int:
        return sum(len(t.class_names) for t in self.tasks)


@dataclass(frozen=True)
class VGGTTeacherConfig:
    """Frozen VGGT Aggregator teacher for GeoEnhDet (reference
    detectors/bevdet_vggt.py:81-98; flagship = VGGT-1B)."""
    image_size: Tuple[int, int] = (294, 518)   # -> 21x37 patch grid
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    # patch embedder: 'dinov2' = full DINOv2 ViT-L/14 with register
    # tokens (the released VGGT-1B layout, aggregator.py:143-182);
    # 'conv' = single conv (miniature tests only)
    patch_embed: str = "dinov2"
    vit_depth: int = 24                        # DINOv2 block count
    vit_native_grid: int = 37                  # pos-embed grid (518/14)
    ckpt_path: Optional[str] = None            # torch model.pt if present


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + schedule + EMA (reference config:256-337)."""
    lr: float = 2e-4
    weight_decay: float = 1e-2
    grad_clip_norm: float = 5.0
    warmup_iters: int = 400
    warmup_ratio: float = 1e-3
    max_epochs: int = 20
    lr_mult_render: float = 2.0     # 2x lr for render MLPs
    # CustomLrUpdaterHook: render-MLP lr scaled by 1/2^epoch each epoch
    render_lr_decay_per_epoch: float = 0.5
    ema_decay: float = 0.999
    ema_init_updates: int = 10560   # MEGVIIEMAHook init_updates
    # SequentialControlHook: temporal fusion off for epochs < this
    temporal_start_epoch: int = 2


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh layout. data axis = batch DP; space axis shards
    cameras / BEV spatial tiles (TPU-native extension; reference has
    only DDP, apis/train.py:227-231)."""
    data_axis: int = -1   # -1 = all devices
    space_axis: int = 1
    # shard the per-camera image backbone over `space` (requires the
    # model to run under shard_map with a 'space' mesh axis whose size
    # divides the camera count); FPN/stem features are all-gathered
    # before the BEV stage.
    shard_cameras: bool = False
    # phase-2 spatial sharding: keep the camera shard through the view
    # transformer interior (DepthNet, stereo cost volume, LSS pooling,
    # HT gathers, NeRF alpha maps) — the cross-camera SUMS (bev pool,
    # ht pool, voxel alpha/rgb means) psum over `space` and only the
    # small per-camera outputs (depth/semantic maps for losses, FPN +
    # alphas for the render branch) are all-gathered. Removes the bulk
    # of the replicated post-encoder work SURVEY §2.7 flags.
    shard_vt: bool = True
    # phase-3 spatial sharding: after the view transformer, split the
    # BEV grid into per-device ROW blocks through pre-process, the BEV
    # encoder and the CenterHead (1-row halo ppermutes before each 3x3
    # conv, BN stats psum'd over `space` — exact; parallel/halo.py),
    # and split the splat render into image row bands. Predictions are
    # invariant-gathered before the loss layer. Requires bev_h and the
    # render height % (space * tile) == 0.
    shard_bev: bool = True
    shard_render: bool = True


@dataclass(frozen=True)
class OcRFDetConfig:
    """Top-level experiment config (mirrors configs/ocrfdet/ocrfdet.py)."""
    grid: GridConfig = field(default_factory=GridConfig)
    data: DataConfig = field(default_factory=DataConfig)
    bda: BdaConfig = field(default_factory=BdaConfig)
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    vt: ViewTransformerConfig = field(default_factory=ViewTransformerConfig)
    bev_encoder: BevEncoderConfig = field(default_factory=BevEncoderConfig)
    head: CenterHeadConfig = field(default_factory=CenterHeadConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    class_names: Tuple[str, ...] = CLASS_NAMES
    # temporal: number of adjacent frames fused (reference
    # multi_adj_frame_id_cfg=(1,2,1) -> num_adj=1) + 1 extra stereo-ref
    num_adj: int = 1
    use_stereo: bool = True
    # OcRF auxiliary rendering branch on/off (off = BEVDepth-style slice)
    with_ocrf: bool = True
    # VGGT distillation teacher (GeoEnhDet); None = plain OcRFDet
    vggt_teacher: Optional[VGGTTeacherConfig] = None
    batch_size: int = 8
    seed: int = 0
    # compute dtype for conv towers ('bfloat16' or 'float32'); render &
    # losses always run fp32 (reference force_fp32 decorators).
    compute_dtype: str = "bfloat16"

    @property
    def num_frames(self) -> int:
        """Temporal frames incl. key frame (without the stereo extra)."""
        return self.num_adj + 1

    @property
    def total_frames(self) -> int:
        """Frames in img_inputs: key + adj + 1 stereo ref when stereo."""
        return self.num_frames + (1 if self.use_stereo else 0)


def ocrfdet_config(**overrides) -> OcRFDetConfig:
    """The flagship 2-frame r50 256x704 config (ocrfdet.py)."""
    return dataclasses.replace(OcRFDetConfig(), **overrides)


def geoenh_config(**overrides) -> OcRFDetConfig:
    """GeoEnhDet flagship (configs/ocrfdet/ocrfdet_vggt.py deltas vs
    the base: FPN out 512 ch, max_objs 1000, post_max_size 400,
    warmup 1000 iters, batch 4/device, frozen VGGT-1B teacher)."""
    base = OcRFDetConfig()
    cfg = dataclasses.replace(
        base,
        vt=dataclasses.replace(base.vt, in_channels=512),
        head=dataclasses.replace(base.head, max_objs=1000,
                                 post_max_size=400),
        optim=dataclasses.replace(base.optim, warmup_iters=1000),
        vggt_teacher=VGGTTeacherConfig(),
        batch_size=4,
    )
    return dataclasses.replace(cfg, **overrides)


def ocrfdet_8f_config(**overrides) -> OcRFDetConfig:
    """The 8-frame test-set variant (README.md:46-47):
    multi_adj_frame_id_cfg=(1,8,1) -> 7 adjacent frames + key + stereo
    ref. Everything else matches the flagship 2-frame config."""
    return dataclasses.replace(OcRFDetConfig(), num_adj=7, **overrides)


def tiny_config(**overrides) -> OcRFDetConfig:
    """CPU-runnable miniature: 2 cams, 64x176 images, 16x16 BEV.

    Keeps every architectural feature live (stereo, OcRF, HOA) at toy
    sizes so the full graph compiles in seconds on CPU for tests.
    """
    cfg = OcRFDetConfig(
        grid=GridConfig(
            x=(-51.2, 51.2, 6.4), y=(-51.2, 51.2, 6.4),
            z=(-5.0, 3.0, 8.0), depth=(1.0, 33.0, 2.0),
        ),
        data=DataConfig(
            cams=("CAM_FRONT", "CAM_BACK"), num_cams=2,
            input_size=(64, 176), src_size=(900, 1600),
        ),
        backbone=BackboneConfig(depth=18, remat=False),
        vt=ViewTransformerConfig(
            in_channels=64, out_channels=16, downsample=16,
            bev_h=16, bev_w=16, num_height=5,
            depthnet=DepthNetConfig(mid_channels=32, aspp_mid_channels=16,
                                    aspp_dropout=0.0),
            render_image_size=(64, 176),
            renderer="xla",
        ),
        bev_encoder=BevEncoderConfig(neck_out_channels=64),
        head=CenterHeadConfig(
            in_channels=64, share_conv_channel=32, head_conv_channel=32,
            max_objs=32, pre_max_size=64, post_max_size=16, max_num=32,
            # voxel * out_size_factor must equal the BEV cell (6.4m)
            voxel_size=(0.8, 0.8),
        ),
        batch_size=2,
        compute_dtype="float32",
    )
    return dataclasses.replace(cfg, **overrides)
