"""OcRFDet detector assembly (single jitted graph).

Composes: ResNet backbone -> CustomFPN (per camera) -> view transformer
(LSS or OcRF) -> per-frame BEV pre-process -> temporal concat ->
CustomResNet + FPN_LSS BEV encoder -> CenterHead.

Redesign of the reference class tower BEVDet -> ... -> OcRFDet4D
(detectors/bevdet.py:15-723, detectors/ocrfdet.py:17-386). Differences
by design:
  * the temporal frame loop is unrolled statically inside ONE jitted
    step (3 frames: key, prev, stereo-ref) instead of Python-level
    iteration with .cpu() round trips;
  * non-key frames run under stop_gradient (the reference's no_grad);
  * the SequentialControlHook 'with_prev' gate is a traced scalar that
    zeroes the previous-frame BEV features, keeping one compiled graph
    for both phases (reference toggles a module flag across epochs).

Batch layout (all channel-last):
  imgs          [B, F, N, H, W, 3]   F = num_frames (+1 stereo ref)
  rots/intrins/post_rots [B, F, N, 3, 3]; trans/post_trans [B, F, N, 3]
  bda           [B, 3, 3]
  k2s_sensor    [B, F, N, 4, 4]  key->sweep sensor transforms
  with_prev     []  scalar {0., 1.}
plus OcRF-only entries (imgs_wo_norm, render cam index, masks...).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import OcRFDetConfig
from ..geometry.transforms import camera_mlp_input
from ..parallel.collectives import all_gather_invariant
from .centerhead import CenterHead
from .depthnet import stereo_cost_volume
from .fpn import CustomFPN, FPN_LSS
from .resnet import CustomResNet, ResNet
from .view_transformer import CameraParams, LSSViewTransformer

Dtype = Any


class OcRFDet(nn.Module):
    cfg: OcRFDetConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        self.dtype = dtype
        self.backbone = ResNet(
            depth=cfg.backbone.depth, out_indices=cfg.backbone.out_indices,
            remat=cfg.backbone.remat, dtype=dtype, name="img_backbone")
        self.neck = CustomFPN(out_channels=cfg.vt.in_channels, dtype=dtype,
                              name="img_neck")
        if cfg.with_ocrf:
            from .ocrf.view_transformer_ocrf import OcRFViewTransformer
            self.vt = OcRFViewTransformer(
                grid=cfg.grid, cfg=cfg.vt, input_size=cfg.data.input_size,
                dtype=dtype, name="img_view_transformer")
        else:
            self.vt = LSSViewTransformer(
                grid=cfg.grid, cfg=cfg.vt, input_size=cfg.data.input_size,
                semantic_channels=2, dtype=dtype,
                name="img_view_transformer")
        c = cfg.vt.out_channels
        self.pre_process_net = CustomResNet(
            num_channels=(c,), num_layer=(2,), stride=(1,),
            backbone_output_ids=(0,), dtype=dtype, name="pre_process")
        cin = c * cfg.num_frames
        self.bev_backbone = CustomResNet(
            num_channels=tuple(cin * m // 2 for m in
                               cfg.bev_encoder.channel_mults),
            num_layer=cfg.bev_encoder.num_layer,
            stride=cfg.bev_encoder.stride,
            dtype=dtype, name="img_bev_encoder_backbone")
        self.bev_neck = FPN_LSS(
            out_channels=cfg.bev_encoder.neck_out_channels, dtype=dtype,
            name="img_bev_encoder_neck")
        self.head = CenterHead(cfg.head, dtype=dtype, name="pts_bbox_head")

    def _space_shard(self):
        """(active, S): camera sharding over the `space` mesh axis is
        active only under shard_map (axis_index would throw at plain
        trace time, e.g. flax init)."""
        if not (self.cfg.parallel.shard_cameras
                and self.cfg.parallel.space_axis > 1):
            return False, 1
        try:
            jax.lax.axis_index("space")
        except NameError:
            return False, 1
        return True, self.cfg.parallel.space_axis

    def _bev_halo(self):
        """Phase-3 BEV row-block sharding spec ('space', S) or None.
        Independent of camera sharding — the BEV stack can shard rows
        even when the VT ran replicated."""
        cfg = self.cfg
        if not (cfg.parallel.shard_bev and cfg.parallel.space_axis > 1):
            return None
        try:
            jax.lax.axis_index("space")
        except NameError:
            return None
        S = cfg.parallel.space_axis
        # stride-2 halo exactness needs even row offsets at each
        # stride-2 BEV encoder stage (parallel/halo.py), i.e. block
        # size divisible by 2^(#stride-2 stages); fall back to
        # replicated rows if the grid doesn't divide cleanly.
        div = 2 ** sum(s == 2 for s in cfg.bev_encoder.stride)
        if cfg.vt.bev_h % S or (cfg.vt.bev_h // S) % div:
            return None
        return ("space", S)

    def _slice_cams(self, t, N: int, axis: int = 1):
        """Take this space member's camera block along `axis`."""
        S = self.cfg.parallel.space_axis
        assert N % S == 0, (N, S)
        nl = N // S
        return jax.lax.dynamic_slice_in_dim(
            t, jax.lax.axis_index("space") * nl, nl, axis=axis)

    def image_encoder(self, imgs, train: bool, stem_only: bool = False,
                      gather: bool = True):
        """imgs [B, N, H, W, 3] -> (fpn_feat [B,N,h,w,C], stem feat).

        With cfg.parallel.shard_cameras (under shard_map with a
        'space' axis), each device runs the backbone on N/space
        cameras — the camera axis is this model's analogue of sequence
        parallelism. With gather=True the features are all-gathered
        over ICI; gather=False keeps the local camera block (phase-2
        sharding: the view transformer consumes local cameras and
        psums its cross-camera reductions instead).
        """
        B, N, H, W, C = imgs.shape
        shard, S = self._space_shard()
        if shard:
            imgs = self._slice_cams(imgs, N)
            N = N // S
        x = imgs.reshape(B * N, H, W, C).astype(self.dtype)
        if stem_only:
            stem = self.backbone(x, train=train, stem_only=True)
            stem = stem.reshape(B, N, *stem.shape[1:])
            if shard and gather:
                # invariant gather: everything downstream feeds losses
                # (see parallel/collectives.py — a varying-typed loss
                # double-counts its gradient per space shard)
                stem = all_gather_invariant(stem, "space", axis=1)
            return None, stem
        feats = self.backbone(x, train=train)
        stem = feats[0]
        fpn = self.neck(feats[1:])
        fpn = fpn.reshape(B, N, *fpn.shape[1:])
        stem = stem.reshape(B, N, *stem.shape[1:])
        if shard and gather:
            fpn = all_gather_invariant(fpn, "space", axis=1)
            stem = all_gather_invariant(stem, "space", axis=1)
        return fpn, stem

    def bev_encoder(self, bev, train: bool, halo=None):
        feats = self.bev_backbone(bev, train=train, halo=halo)
        return self.bev_neck(feats[0], feats[2], train=train, halo=halo)

    def _frame_cams(self, batch, f) -> CameraParams:
        return CameraParams(
            rots=batch["rots"][:, f], trans=batch["trans"][:, f],
            intrins=batch["intrins"][:, f],
            post_rots=batch["post_rots"][:, f],
            post_trans=batch["post_trans"][:, f], bda=batch["bda"])

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        cfg = self.cfg
        F_total = batch["imgs"].shape[1]
        n_temporal = cfg.num_frames
        key_cams = self._frame_cams(batch, 0)
        N_total = batch["imgs"].shape[2]

        # phase-2 camera sharding: the VT interior runs on this space
        # member's cameras; cross-camera sums psum over `space` inside
        # the VT and the small per-camera outputs are gathered below
        shard, S = self._space_shard()
        deep = shard and cfg.parallel.shard_vt
        slice_n = (lambda t, ax=1: self._slice_cams(t, N_total, ax)) \
            if deep else (lambda t, ax=1: t)

        def local_cams(c: CameraParams) -> CameraParams:
            if not deep:
                return c
            return CameraParams(
                rots=slice_n(c.rots), trans=slice_n(c.trans),
                intrins=slice_n(c.intrins),
                post_rots=slice_n(c.post_rots),
                post_trans=slice_n(c.post_trans), bda=c.bda)

        # ---- frame loop, oldest first (stereo ref -> prev -> key) ----
        stem_prev = None
        bev_feats = []         # temporal frames only, oldest first
        key_aux: Dict[str, jnp.ndarray] = {}
        for f in range(F_total - 1, -1, -1):
            is_key = f == 0
            is_stereo_ref = cfg.use_stereo and f == F_total - 1
            imgs_f = batch["imgs"][:, f]
            if is_stereo_ref:
                _, stem_prev = self.image_encoder(imgs_f, train,
                                                  stem_only=True,
                                                  gather=not deep)
                stem_prev = jax.lax.stop_gradient(stem_prev)
                continue
            fpn, stem = self.image_encoder(imgs_f, train,
                                           gather=not deep)
            cams_full = self._frame_cams(batch, f)
            cams = local_cams(cams_full)
            mlp_input = camera_mlp_input(
                slice_n(key_cams.rots), slice_n(key_cams.trans),
                cams.intrins, cams.post_rots,
                cams.post_trans, batch["bda"]).astype(jnp.float32)
            cv = None
            if cfg.use_stereo and stem_prev is not None:
                # stem features are stride 4; pool to the cost-volume
                # resolution (see DepthNetConfig.cv_downsample)
                pool = cfg.vt.depthnet.cv_downsample // 4
                def _pool(t):
                    if pool == 1:
                        return t
                    B_, N_ = t.shape[:2]
                    tt = t.reshape((B_ * N_,) + t.shape[2:])
                    tt = nn.avg_pool(tt, (pool, pool),
                                     strides=(pool, pool))
                    return tt.reshape((B_, N_) + tt.shape[1:])
                cv = stereo_cost_volume(
                    _pool(stem).astype(jnp.float32),
                    _pool(stem_prev).astype(jnp.float32),
                    self.vt.cv_frustum,
                    slice_n(batch["k2s_sensor"][:, f]),
                    cams.intrins, cams.post_rots, cams.post_trans,
                    cfg.data.input_size,
                    cfg.vt.depthnet.cost_volume_bias,
                    impl=cfg.vt.depthnet.cv_impl,
                    win_w=cfg.vt.depthnet.cv_win,
                    win_h=cfg.vt.depthnet.cv_win_h,
                    tile=cfg.vt.depthnet.cv_tile,
                    plane_groups=cfg.vt.depthnet.cv_plane_groups)
                cv = jax.lax.stop_gradient(cv)
                B, N = cv.shape[:2]
                cv = jnp.moveaxis(cv, 2, -1)  # [B,N,Hc,Wc,D]
                cv = cv.reshape((B * N,) + cv.shape[2:]).astype(self.dtype)
            if cfg.with_ocrf:
                bev, aux = self.vt(fpn, cams, mlp_input, batch,
                                   cost_volume=cv, is_key=is_key,
                                   train=train,
                                   space_axis="space" if deep else None,
                                   cams_full=cams_full,
                                   render_band=(
                                       ("space", S)
                                       if deep and cfg.parallel.shard_render
                                       else None))
            else:
                depth, semantic, context = self.vt(
                    fpn, cams, mlp_input, cost_volume=cv, train=train)
                bev = self.vt.splat(depth, context, cams,
                                    psum_axis="space" if deep else None)
                aux = dict(depth=depth, semantic=semantic)
            # phase-3: the VT output is full-grid on every space
            # member; from here the BEV stack runs on per-member row
            # blocks (parallel/halo.py)
            halo = self._bev_halo()
            if halo is not None:
                from ..parallel.halo import slice_rows
                bev = slice_rows(bev, halo)
            bev = self.pre_process_net(bev, train=train, halo=halo)[0]
            if is_key:
                key_aux = aux
                if deep:
                    # per-camera maps back to the full camera set for
                    # the loss layer / distillation heads — INVARIANT
                    # gathers, because the depth/semantic/KD losses
                    # differentiate through these tensors
                    for k in ("depth", "semantic"):
                        if key_aux.get(k) is not None:
                            key_aux[k] = all_gather_invariant(
                                key_aux[k], "space", axis=1)
                    fpn = all_gather_invariant(fpn, "space", axis=1)
                # stashed for subclass heads (GeoEnhDet distillation)
                key_aux["fpn_key"] = fpn
            else:
                bev = jax.lax.stop_gradient(bev)
                bev = bev * batch["with_prev"].astype(bev.dtype)
            bev_feats.append(bev)
            stem_prev = jax.lax.stop_gradient(stem)

        # channel concat, oldest..key ordering as in the reference
        # (BEVStereo4D appends fid descending, bevdet.py:668-693;
        # concat order matches). Sown so tests can pin the temporal
        # slot layout against prepare_inputs semantics.
        bev_cat = jnp.concatenate(bev_feats, axis=-1)
        self.sow("intermediates", "bev_cat", bev_cat)
        halo = self._bev_halo()
        x = self.bev_encoder(bev_cat, train=train, halo=halo)
        preds = self.head(x, train=train, halo=halo)
        if halo is not None:
            # row blocks back to full maps for the loss/decode layer —
            # INVARIANT gathers: every CenterHead loss differentiates
            # through these (parallel/collectives.py)
            preds = [
                {k: all_gather_invariant(v, halo[0], axis=1)
                 for k, v in task.items()} for task in preds]
        return preds, key_aux
