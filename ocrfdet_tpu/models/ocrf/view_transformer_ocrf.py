"""OcRF view transformer: dual-branch BEV + radiance-field rendering +
height-aware opacity attention.

TPU-native redesign of `OcRFViewTransformerFull`
(models/necks/view_transformer_ocrf.py:576-1417). The reference runs a
per-sample Python loop with host camera math and one CUDA rasterizer
call per sample (:1086-1174); here the whole branch is one batched XLA
computation: HT sampling is a dense gather-reduce, the splat renderer
is the tiled XLA compositor (or Pallas kernel), and camera matrices are
built in-graph.

Documented intentional deviations from reference behaviour (we train
from scratch; geometric consistency beats bug parity):
  * Gaussian means are METRIC voxel centres in the (BDA-augmented)
    key-ego frame and the render camera is the true W2C of the chosen
    camera with augmentation folded into K — the reference feeds
    normalised-[0,1] means to a metric camera whose translation is
    taken from c2w (view_transformer_ocrf.py:1135-1153).
  * The per-camera NeRF alpha maps are sampled at the correct
    projected pixel positions; the reference's view() reinterprets the
    [6,H,W] alpha stack with H/W swapped (:1123-1126).
  * Voxel colours come from the full unnormalised image rather than
    the 255-filled "retain_valid_pixels" scatter (:1004-1024) — strictly
    more signal, no O(B*N*Z) host loop.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import GridConfig, ViewTransformerConfig
from ...geometry import frustum as FR
from ...geometry.cameras import splat_camera
from ...ops.ht_pool import ht_pool_mm, ht_pool_ref
from ...ops.point_sample import point_sample_mm, point_sample_ref
from ...ops.splat import (preprocess_gaussians, quat_scale_to_cov3d,
                          render_gaussians_dense, render_gaussians_tiled)
from ..fpn import resize_bilinear
from ..view_transformer import CameraParams, LSSViewTransformer
from .deform_attn import DeformableAttention2D
from .fusion import (BEVGeomAttention, DualFeatFusion,
                     LearnedPositionalEncoding, OpacityMask, ProbNet)
from .heads import (ColorMLP, LearnedBlend, MLP2, OpacityMLP, ResizeNetwork,
                    RotationMLP, ScaleMLP, SigmaMLP)
from .hoa import OpacityVoxelToBEV

Dtype = Any


class OcRFViewTransformer(nn.Module):
    grid: GridConfig
    cfg: ViewTransformerConfig
    input_size: tuple
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.lss = LSSViewTransformer(
            grid=self.grid, cfg=cfg, input_size=self.input_size,
            semantic_channels=2, dtype=self.dtype, name="lss")
        # numpy on purpose — see LSSViewTransformer.setup
        self.cv_frustum = np.asarray(FR.make_frustum(
            self.grid.depth, self.input_size, cfg.depthnet.cv_downsample))
        c = cfg.out_channels
        # HT reference grid (normalised [0,1]^3), z extent from grid.z
        z_extent = self.grid.z[1] - self.grid.z[0]
        self.ref_points = jnp.asarray(FR.ht_reference_points(
            cfg.bev_h, cfg.bev_w, cfg.num_height, z_pillar=z_extent))
        # fusion / mask stack
        self.fuser = DualFeatFusion(c, dtype=self.dtype, name="fuser")
        self.prob = ProbNet(c, dtype=self.dtype, name="prob")
        self.geom_att = BEVGeomAttention(dtype=self.dtype, name="geom_att")
        self.opacity_gate = OpacityMask(dtype=self.dtype,
                                        name="opacity_gate")
        self.pos_enc = LearnedPositionalEncoding(
            c // 2, cfg.bev_h, cfg.bev_w, dtype=self.dtype, name="pos_enc")
        self.pos_enc_hoa = LearnedPositionalEncoding(
            2, cfg.bev_h, cfg.bev_w, dtype=self.dtype, name="pos_enc_hoa")
        # voxel lift: per-height scalar affine + BN (the reference's
        # Conv3d(1->13, k=1) + BN3d + ReLU, :520-531)
        self.height_w = self.param(
            "height_w", nn.initializers.normal(1.0), (cfg.num_height,))
        self.height_b = self.param(
            "height_b", nn.initializers.zeros_init(), (cfg.num_height,))
        # BN over the height axis (the reference's BatchNorm3d treats
        # the 13 lifted heights as channels)
        self.height_bn = nn.BatchNorm(momentum=0.9, axis=1,
                                      dtype=self.dtype, name="height_bn")
        # gaussian parameter heads
        self.s_mlp = ScaleMLP(dtype=self.dtype, name="S_MLP")
        self.r_mlp = RotationMLP(dtype=self.dtype, name="R_MLP")
        self.a_mlp = OpacityMLP(dtype=self.dtype, name="A_MLP")
        self.c_mlp = ColorMLP(dtype=self.dtype, name="C_MLP")
        # nerf branch
        self.image_feat_resize = ResizeNetwork(c, dtype=self.dtype,
                                               name="image_feat_resize")
        # reference sigma head stacks two Linears WITHOUT an inner
        # activation (view_transformer_ocrf.py:605)
        self.sigma_mlp = SigmaMLP(4, dtype=self.dtype, name="sigma")
        self.c_mlp_nerf = MLP2(4, 3, dtype=self.dtype, name="C_MLP_nerf")
        self.d_mlp_nerf = MLP2(4, 1, dtype=self.dtype, name="D_MLP_nerf")
        self.feat_resize1 = MLP2(4, 3, dtype=self.dtype,
                                 name="img_feat_resize1")
        self.feat_resize2 = MLP2(4, 1, dtype=self.dtype,
                                 name="img_feat_resize2")
        self.blend_img = LearnedBlend(dtype=self.dtype, name="blend_img")
        self.blend_depth = LearnedBlend(dtype=self.dtype,
                                        name="blend_depth")
        # HOA
        self.deform_attn = DeformableAttention2D(
            dim=cfg.num_height, dim_head=8, heads=1, downsample_factor=4,
            offset_scale=4.0, offset_kernel_size=6, dtype=self.dtype,
            name="defor_cross_attention")
        self.opacity_to_bev = OpacityVoxelToBEV(dtype=self.dtype,
                                                name="OpacityVoxelToBEV")
        # metric voxel centres (gaussian means), [Zh*Nq, 3]
        pc = np.asarray(self.grid.pc_range)
        ref = np.asarray(FR.ht_reference_points(
            cfg.bev_h, cfg.bev_w, cfg.num_height, z_pillar=z_extent))
        self.gauss_means = jnp.asarray(
            (ref * (pc[3:6] - pc[0:3]) + pc[0:3]).reshape(-1, 3))

    # ------------------------------------------------------------------
    def ht_pool(self, depth, context, cams: CameraParams,
                psum_axis=None):
        """Height-trick branch: project 13 points per BEV pillar into
        all cameras, pool depth-weighted context at the nearest
        feature pixel/bin, sum over (camera, height).

        depth [B,N,h,w,D]; context [B,N,h,w,C].
        Returns (ht_feat [B,Y,X,C], uvd [B,N,Z,Nq,3], valid).
        With cameras sharded over `psum_axis` the camera sum is
        restored over ICI; uvd/valid stay LOCAL to the shard.

        Two implementations (cfg.ht_impl): the Pallas MXU one-hot
        matmul kernel (TPU default — zero gather descriptors) and the
        round-3 per-camera batched gather (off-TPU mirror); see
        ops/ht_pool.py.
        """
        cfg = self.cfg
        B = depth.shape[0]
        C = context.shape[-1]
        l2i, aug = FR.ego_to_image(
            cams.rots, cams.trans, cams.intrins, cams.post_rots,
            cams.post_trans, cams.bda)
        uvd, valid = FR.project_points(
            self.ref_points, self.grid.pc_range,
            (self.grid.depth[0], self.grid.depth[1]), l2i, aug,
            self.input_size)
        impl = cfg.ht_impl
        if impl == "auto":
            impl = "mm" if jax.default_backend() == "tpu" else "gather"
        if impl == "mm":
            acc = ht_pool_mm(depth, context, uvd, valid)
        else:
            acc = ht_pool_ref(depth, context, uvd, valid)
        if psum_axis is not None:
            acc = jax.lax.psum(acc, psum_axis)
        ht = acc.reshape(B, cfg.bev_h, cfg.bev_w, C)
        return ht, uvd, valid

    # ------------------------------------------------------------------
    def sample_at_voxels(self, images, uvd, valid, psum_axis=None):
        """Sample per-camera full-res maps at projected voxel points and
        average over visible cameras.

        images [B, N, H, W, C]; uvd/valid from ht_pool.
        Returns [B, Z, Nq, C] masked mean over cameras; with cameras
        sharded over `psum_axis` the numerator and visibility count
        are both psum'd so the mean spans every camera.

        On TPU the bilinear sampling runs as the separable tent-weight
        MXU kernel (ops/point_sample.py — the backward would otherwise
        be a 2.6M-row scatter); off-TPU the packed-gather mirror.
        """
        B, N, H, W, C = images.shape
        Zh, Nq = uvd.shape[2], uvd.shape[3]
        px = (uvd[..., 0] * W).reshape(B, N, Zh * Nq)
        py = (uvd[..., 1] * H).reshape(B, N, Zh * Nq)
        impl = self.cfg.sample_impl
        if impl == "auto":
            impl = "mm" if jax.default_backend() == "tpu" else "gather"
        if impl == "mm":
            vals = point_sample_mm(images, px, py)
        else:
            vals = point_sample_ref(images, px, py)
        vals = vals.reshape(B, N, Zh, Nq, C)
        vmask = valid[..., None].astype(vals.dtype)
        s = jnp.sum(vals * vmask, axis=1)
        cnt = jnp.sum(vmask, axis=1)
        if psum_axis is not None:
            s = jax.lax.psum(s, psum_axis)
            cnt = jax.lax.psum(cnt, psum_axis)
        return s / jnp.maximum(cnt, 1.0)

    # ------------------------------------------------------------------
    def nerf_full_feat(self, fpn_feat):
        """ResizeNetwork to full image resolution: [B, h, w, Cin] ->
        [B, H, W, out_channels]."""
        return self.image_feat_resize(fpn_feat)

    def nerf_alpha(self, full_feat):
        sigma = self.sigma_mlp(full_feat)        # softplus inside
        return 1.0 - jnp.exp(-sigma)

    # ------------------------------------------------------------------
    def __call__(self, x, cams: CameraParams, mlp_input, batch,
                 cost_volume=None, is_key: bool = False,
                 train: bool = False, space_axis=None,
                 cams_full: Optional[CameraParams] = None,
                 render_band=None):
        """With `space_axis` the camera axis of x/cams/mlp_input/
        cost_volume is this space member's LOCAL block: every
        cross-camera reduction (LSS pool, HT pool, voxel alpha/rgb
        mean) psums over the axis, and the render branch — which picks
        one arbitrary camera per sample — all-gathers the (small) FPN
        and alpha maps and uses `cams_full`."""
        cfg = self.cfg
        B, N = x.shape[:2]
        Zh = cfg.num_height
        Nq = cfg.bev_h * cfg.bev_w
        depth, semantic, context = self.lss(
            x, cams, mlp_input, cost_volume=cost_volume, train=train)
        # thresholds (reference forward :1325-1331)
        thr = cfg.depth_threshold / self.lss.D
        f_depth = jnp.where(depth < thr, 0.0, depth).astype(context.dtype)
        img_mask = (semantic[..., 1:2] >= cfg.semantic_threshold)
        f_context = context * img_mask.astype(context.dtype)

        lss_feat = self.lss.splat(f_depth, f_context, cams,
                                  psum_axis=space_axis)
        ht_feat, uvd, valid = self.ht_pool(f_depth, f_context, cams,
                                           psum_axis=space_axis)

        # voxel lift: [B, Y, X, C] -> per-height features [B,Zh,Nq,C]
        vf = (ht_feat.reshape(B, 1, Nq, -1)
              * self.height_w[None, :, None, None]
              + self.height_b[None, :, None, None])
        vf = self.height_bn(vf, use_running_average=not train)
        voxel_feat = nn.relu(vf)                       # [B, Zh, Nq, C]

        opacity = self.a_mlp(voxel_feat)[..., 0]       # [B, Zh, Nq]

        # per-camera NeRF alphas. Static Python loop (NOT lax.scan: flax
        # params may not be created inside control-flow bodies);
        # cameras are processed in groups sized so the transient
        # [B*group, H, W, C] full-res feature stays ~<400 MB.
        Hf, Wf = cfg.render_image_size
        if "nerf" in cfg.ablate:               # profiling-only seam
            alphas = jnp.zeros((B, N, Hf, Wf), jnp.float32)
        else:
            group = max(1, min(N, 8 // max(B, 1)))
            alpha_parts = []
            for n0 in range(0, N, group):
                xs = x[:, n0:n0 + group]
                gN = xs.shape[1]
                full = self.nerf_full_feat(
                    xs.reshape((B * gN,) + xs.shape[2:]))
                a = self.nerf_alpha(full)[..., 0]
                alpha_parts.append(a.reshape(B, gN, *a.shape[1:]))
            alphas = jnp.concatenate(alpha_parts, axis=1)  # [B,N,H,W]

        # alpha back-projected to voxels (correct sampling; see header).
        # In training the render branch also needs per-voxel RGB from
        # the unnormalised images; sampling [alpha, rgb] as one C=4 map
        # shares the gather descriptors (the dominant cost of this op)
        # instead of running two full-resolution gather sets.
        render_on = is_key and train and "render" not in cfg.ablate
        maps = alphas[..., None].astype(jnp.float32)
        if render_on:
            imgs_rgb = batch["imgs_wo_norm"].astype(jnp.float32) / 255.0
            if space_axis is not None:
                # batch tensors carry the FULL camera set (replicated
                # over `space`); take this shard's block
                nl = N
                imgs_rgb_l = jax.lax.dynamic_slice_in_dim(
                    imgs_rgb, jax.lax.axis_index(space_axis) * nl, nl,
                    axis=1)
            else:
                imgs_rgb_l = imgs_rgb
            maps = jnp.concatenate([maps, imgs_rgb_l], axis=-1)
        if "sample" in cfg.ablate:             # profiling-only seam
            sampled = jnp.zeros((B, Zh, Nq, maps.shape[-1]),
                                jnp.float32)
        else:
            sampled = self.sample_at_voxels(maps, uvd, valid,
                                            psum_axis=space_axis)
        alpha_lidar = sampled[..., 0]
        vox_rgb = sampled[..., 1:4] if render_on else None
        alpha_vox = alpha_lidar.reshape(B, Zh, cfg.bev_h, cfg.bev_w)
        opac_vox = opacity.reshape(B, Zh, cfg.bev_h, cfg.bev_w)

        # HOA: deformable cross-attention at 1/6 scale, residual add
        # (floor 8 keeps the stride-4 offset conv valid on tiny grids)
        ds_hw = (max(cfg.bev_h // 6, 8), max(cfg.bev_w // 6, 8))
        op_ch = jnp.moveaxis(opac_vox, 1, -1)          # [B, Y, X, Zh]
        al_ch = jnp.moveaxis(alpha_vox, 1, -1)
        if "hoa" in cfg.ablate:                # profiling-only seam
            opacity_alpha = op_ch
        else:
            op_ds = resize_bilinear(op_ch, ds_hw, align_corners=True)
            al_ds = resize_bilinear(al_ch, ds_hw, align_corners=True)
            att = self.deform_attn(op_ds.astype(self.dtype),
                                   al_ds.astype(self.dtype),
                                   train=train)
            att_up = resize_bilinear(att, (cfg.bev_h, cfg.bev_w),
                                     align_corners=True)
            opacity_alpha = att_up + op_ch             # [B, Y, X, Zh]

        pos_hoa = self.pos_enc_hoa(B)
        opacity_bev_logit = self.opacity_to_bev(
            opacity_alpha.astype(self.dtype), pos_hoa, train)  # [B,Y,X,1]

        # fusion + mask + gates (reference :1183-1199)
        channel_feat = self.fuser(lss_feat, ht_feat, train)
        bev_pos = self.pos_enc(B)
        bev_mask_logit = self.prob(bev_pos + channel_feat, train)
        geom_feat = self.geom_att(channel_feat, bev_mask_logit) \
            * channel_feat
        op_mask = self.opacity_gate(geom_feat, opacity_bev_logit)
        geom_feat = geom_feat * op_mask

        aux: Dict[str, jnp.ndarray] = dict(
            depth=depth, semantic=semantic,
            bev_mask_logit=bev_mask_logit,
            opacity_bev_logit=opacity_bev_logit,
        )

        if render_on:
            if space_axis is not None:
                # the render camera is an arbitrary index into the FULL
                # set: gather the small per-camera maps once over ICI.
                # invariant gathers — the render losses differentiate
                # through these (parallel/collectives.py)
                from ...parallel.collectives import all_gather_invariant
                x_r = all_gather_invariant(x, space_axis, axis=1)
                alphas_r = all_gather_invariant(alphas, space_axis,
                                                axis=1)
                cams_r = cams_full if cams_full is not None else cams
            else:
                x_r, alphas_r, cams_r = x, alphas, cams
            aux.update(self.render_branch(
                x_r, cams_r, batch, voxel_feat, opacity, vox_rgb,
                alphas_r, band=render_band))
        return geom_feat, aux

    # ------------------------------------------------------------------
    def render_branch(self, x, cams: CameraParams, batch, voxel_feat,
                      opacity, vox_rgb, alphas, band=None):
        """Training-only rendering of one random camera per sample.

        vox_rgb [B, Z, Nq, 3]: voxel colours from the unnormalised
        images, sampled jointly with the alpha back-projection in
        __call__ (shared gathers).

        With `band` = ('space', S) (phase-3, ParallelConfig.
        shard_render) each space member rasterises only its image ROW
        BAND: tile compositing is per-tile independent, so shifting
        the projected 2D means by the band offset and rendering an
        H/S-row image reproduces exactly those rows of the full
        render (the Grendel-GS workload split, gaussian_renderer/
        __init__.py:170-516, recast as a static band split over ICI).
        The small rendered bands are invariant-gathered for the loss.
        """
        cfg = self.cfg
        B, N = x.shape[:2]
        Zh = cfg.num_height
        Nq = cfg.bev_h * cfg.bev_w
        H, W = cfg.render_image_size
        cam_idx = batch["render_cam"]                   # [B]
        imgs_rgb = batch["imgs_wo_norm"].astype(jnp.float32) / 255.0

        # gaussian parameters
        g_in = voxel_feat.reshape(B, Zh * Nq, -1)
        scaling = self.s_mlp(g_in)
        rotation = self.r_mlp(g_in)
        color = self.c_mlp(jnp.concatenate(
            [g_in, vox_rgb.reshape(B, Zh * Nq, 3).astype(g_in.dtype)], -1))
        opac = opacity.reshape(B, Zh * Nq)

        # chosen camera per sample
        def take_cam(arr):
            return jnp.take_along_axis(
                arr, cam_idx.reshape(B, *([1] * (arr.ndim - 1))), axis=1
            )[:, 0]
        rot_c = take_cam(cams.rots)                    # [B,3,3]
        tran_c = take_cam(cams.trans)
        K_c = take_cam(cams.intrins)
        pr_c = take_cam(cams.post_rots)
        pt_c = take_cam(cams.post_trans)
        gt_img = take_cam(imgs_rgb)                    # [B,H,W,3]

        # camera pose in the BDA ego frame; aug folded into K
        c2e = jnp.zeros((B, 4, 4))
        c2e = c2e.at[:, :3, :3].set(
            jnp.einsum('bij,bjk->bik', cams.bda, rot_c))
        c2e = c2e.at[:, :3, 3].set(
            jnp.einsum('bij,bj->bi', cams.bda, tran_c))
        c2e = c2e.at[:, 3, 3].set(1.0)
        P = jnp.concatenate([pr_c[:, :2, :2], pt_c[:, :2, None]], -1)
        P3 = jnp.concatenate(
            [P, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]]),
                                 (B, 1, 3))], axis=1)
        K_aug = jnp.einsum('bij,bjk->bik', P3, K_c)
        sc = splat_camera(c2e, K_aug, (H, W), znear=cfg.znear,
                          zfar=cfg.zfar)

        cov3d = quat_scale_to_cov3d(
            rotation.astype(jnp.float32), scaling.astype(jnp.float32))

        if band is not None and H % (band[1] * 16):
            band = None                      # tile rows must divide
        Hr = H // band[1] if band is not None else H

        def render_one(cam_one, color_b, opac_b, cov_b):
            g = preprocess_gaussians(self.gauss_means, cov_b, cam_one)
            if band is not None:
                y0 = (jax.lax.axis_index(band[0]) * Hr).astype(
                    g.mean2d.dtype)
                g = g._replace(mean2d=g.mean2d
                               - jnp.stack([jnp.zeros_like(y0), y0]))
                # the band shift makes mean2d space-varying while the
                # other render inputs are invariant (they come from
                # psum'd BEV features); unify the vma so the tiled
                # compositor's scan carries type-check
                def vary(t):
                    vma = getattr(jax.typeof(t), "vma", frozenset())
                    return (t if band[0] in vma
                            else jax.lax.pvary(t, (band[0],)))
                g = jax.tree.map(vary, g)
                color_b, opac_b = vary(color_b), vary(opac_b)
            if cfg.renderer == "dense":
                img, dep = render_gaussians_dense(
                    g, color_b.astype(jnp.float32),
                    opac_b.astype(jnp.float32), Hr, W)
                return img, dep
            img, dep, _ = render_gaussians_tiled(
                g, color_b.astype(jnp.float32),
                opac_b.astype(jnp.float32), Hr, W,
                backend=("pallas" if cfg.renderer == "pallas"
                         else "xla"))
            return img, dep

        cam_axes = type(sc)(w2c=0, proj=0, cam_center=0, tan_fovx=0,
                            tan_fovy=0, height=None, width=None)
        if "splat" in cfg.ablate:              # profiling-only seam
            img_g = jnp.sum(color).astype(jnp.float32) * jnp.zeros(
                (B, Hr, W, 3), jnp.float32)
            dep_g = jnp.sum(opac).astype(jnp.float32) * jnp.zeros(
                (B, Hr, W), jnp.float32)
        else:
            img_g, dep_g = jax.vmap(render_one,
                                    in_axes=(cam_axes, 0, 0, 0))(
                sc, color, opac, cov3d)
        if band is not None:
            # bands back to the full image — invariant: the photometric
            # and depth render losses differentiate through these
            from ...parallel.collectives import all_gather_invariant
            img_g = all_gather_invariant(img_g, band[0], axis=1)
            dep_g = all_gather_invariant(dep_g, band[0], axis=1)

        # NeRF render of the chosen camera
        if "nerfcomp" in cfg.ablate:           # profiling-only seam
            img_n = jnp.zeros((B, H, W, 3), jnp.float32)
            dep_n = jnp.zeros((B, H, W), jnp.float32)
            img_ng = self.blend_img(img_g, img_n)
            dep_ng = self.blend_depth(dep_g, dep_n)
            gt_depth_c = take_cam(batch["gt_depth"])
            return dict(
                render_img=img_ng, render_img_g=img_g,
                render_img_n=img_n, render_depth=dep_ng,
                render_depth_g=dep_g, render_depth_n=dep_n,
                render_gt_img=gt_img, render_gt_depth=gt_depth_c,
            )
        fpn_c = take_cam(x)                            # [B,h,w,Cin]
        full = self.nerf_full_feat(fpn_c)              # [B,H,W,c]
        alpha_c = take_cam(alphas)[..., None].astype(full.dtype)
        fc_in = jnp.concatenate([full, gt_img.astype(full.dtype)], -1)
        # terminal activations inside the factor MLPs, applied BEFORE
        # the external softmax: ColorFactorMLPNerf ends in a sigmoid,
        # DepthFactorMLPNerf in a relu (view_transformer_ocrf.py:
        # 321-342, used at :1107-1110)
        cw = jax.nn.softmax(jax.nn.sigmoid(self.c_mlp_nerf(fc_in)),
                            axis=-1)
        radiance = nn.relu(self.feat_resize1(fc_in)) * cw
        dw = jax.nn.softmax(nn.relu(self.d_mlp_nerf(fc_in)), axis=-1)
        radiance_d = nn.relu(self.feat_resize2(fc_in)) * dw
        img_n = (alpha_c * radiance).astype(jnp.float32)
        dep_n = (alpha_c * radiance_d)[..., 0].astype(jnp.float32)

        img_ng = self.blend_img(img_g, img_n)
        dep_ng = self.blend_depth(dep_g, dep_n)

        gt_depth_c = take_cam(batch["gt_depth"])       # [B,H,W]
        return dict(
            render_img=img_ng, render_img_g=img_g, render_img_n=img_n,
            render_depth=dep_ng, render_depth_g=dep_g, render_depth_n=dep_n,
            render_gt_img=gt_img, render_gt_depth=gt_depth_c,
        )
