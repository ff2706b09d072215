"""Stereo plane-sweep cost volume (reference calculate_cost_volumn,
/root/reference/mmdet3d/models/necks/view_transformer.py:568-596).

Warps the previous frame's stem features along D candidate depth planes
through the key->sweep sensor homography and scores |curr - warp| summed
over channels; candidates outside the previous view get a +bias before
the softmax over depth. The homography is LINEAR in depth (the image aug
is 2-D, so post_rot is block-diag and unprojection factors as
pts = d*q + t), so every per-pixel sample location is

    pix(u, v, d) = (d * a2(u, v) + b2) / (d * az(u, v) + bz)

with [B,N,H,W]-sized coefficient maps computed ONCE (homography_coeffs).
The reference's invalid flag is a quirk worth preserving exactly: after
its channel-group loop, `wrap_prev[:, 0] == 0` tests group-local channel
0 of the LAST group, i.e. stem channel C-4 (view_transformer.py:590-592).

Two TPU execution strategies for the warp itself:

  * cost_volume_scan — depth-chunked gather of packed 2x2 neighborhood
    rows (ops/grid_sample.py). TPU gathers are descriptor-bound: the
    flagship shapes (BN=12, D=118, 64x176, C=256) issue ~16M row
    descriptors per volume and the warp dominated the round-2 profile
    at ~1 s/step. Kept as the off-TPU mirror and as a fallback.

  * cost_volume_mm — Pallas kernel that reformulates the bilinear warp
    as a dense one-hot matmul on the MXU. For each (camera, 16x16 pixel
    tile, depth plane) the kernel slices a [win_w, H] column window of
    the VMEM-resident previous image (strip layout [W, H, C], so the
    dynamic window start lands on the cheap outermost axis), builds the
    separable bilinear "tent" weights  w[p, k] =
    relu(1-|px[p]-x(k)|) * relu(1-|py[p]-y(k)|)  on the VPU, and
    contracts [P, win_w*H] @ [win_w*H, C] on the MXU. Burns ~40 TFLOP/
    step of matmul to avoid the 16M gather descriptors — a large net
    win on TPU where bf16 matmul peak is ~200 TFLOP/s but gather
    throughput is ~10M rows/s. Cost output in f32; no backward pass is
    needed (the detector wraps the volume in stop_gradient, mirroring
    the reference's torch.no_grad, view_transformer.py:618-619).

    Window-clamp semantics: the window start is the floor of the
    smallest in-view sample x of the tile; any sample that is in-view
    but whose bilinear support is not fully inside the window gets all-
    zero tent weights and is therefore scored as invalid (+bias)
    rather than with its true cost. win_w >= W disables windowing and
    is exact for every geometry. MEASURED at flagship geometry by
    ops/cv_audit.py + tools_tpu/cv_window_audit.py (CV_AUDIT_r05.json):
    the required window span is strongly depth-plane-dependent (near
    planes see metres of stereo disparity spread; planes >= ~5 m need
    <= 15x32), so windows are configured PER PLANE GROUP
    (DepthNetConfig.cv_plane_groups): wide for near planes, narrow for
    far — cutting the burned matmul FLOPs ~28% with a clamp fraction
    identical to the old uniform 32x32 window (1.6e-3 of valid samples
    under live-aug geometry, all on planes < 5 m; 2e-5 on the
    no-aug benchmark rig). NOTE the FLOP cut is an accounting
    improvement, not a wall-clock one: honest device-loop timing shows
    the kernel time tracks plane count, not window area, in the
    512-1024-sample range (47-52 ms for every grouping tried at
    [6 cams, 118 planes]); the kernel runs at ~46% MXU utilization
    and the window shrink moves it further from FLOP-bound.
    Documented in PARITY.md item 5.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import bilinear_sample_packed, pack_neighborhood
from ..utils.vma import union_vma


def _invalid_channel(C: int) -> int:
    """Stem channel whose ==0 test flags out-of-view samples: group-
    local channel 0 of the reference's LAST 4-channel group
    (view_transformer.py:578-592), i.e. C-4 (0 when C < 8)."""
    return 4 * (C // 4 - 1) if C >= 8 else 0


def homography_coeffs(cv_frustum, k2s_sensor, intrins, post_rots,
                      post_trans, input_size, feat_hw: Tuple[int, int]):
    """Per-pixel depth-linear sample-coordinate coefficients.

    The sweep-camera sample location, already scaled to FEATURE-map
    pixels (the reference normalises full-res pixels by the input size
    and grid_samples the stride-cv_downsample map with
    align_corners=True, view_transformer.py:592-596), is
        x = (d*a2[...,0] + b2[...,0]) / (d*az + bz)
        y = (d*a2[...,1] + b2[...,1]) / (d*az + bz)
    and a candidate is behind the sweep camera iff d*az + bz < 1e-3
    (the intrinsics' last row is (0,0,1), so the projective depth IS
    the sensor-frame z used by the reference's neg_mask,
    view_transformer.py:555-563).

    Returns az [B,N,H,W], bz [B,N], a2 [B,N,H,W,2], b2 [B,N,2], all f32.
    """
    Hc, Wc = feat_hw
    Hi, Wi = input_size
    uv = cv_frustum[0, :, :, :2]                         # [Hc,Wc,2]
    pr2 = post_rots[..., :2, :2]
    inv_pr2 = jnp.linalg.inv(pr2)
    uv_c = uv[None, None] - post_trans[:, :, None, None, :2]
    xy = jnp.einsum('bnij,bnhwj->bnhwi', inv_pr2, uv_c)  # [B,N,H,W,2]
    q = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
    rots = k2s_sensor[..., :3, :3]
    trans = k2s_sensor[..., :3, 3]
    combine = rots @ jnp.linalg.inv(intrins)
    q = jnp.einsum('bnij,bnhwj->bnhwi', combine, q)      # [B,N,H,W,3]
    A = jnp.einsum('bnij,bnhwj->bnhwi', intrins, q)      # [B,N,H,W,3]
    Bv = jnp.einsum('bnij,bnj->bni', intrins, trans)     # [B,N,3]
    a2 = (jnp.einsum('bnij,bnhwj->bnhwi', pr2, A[..., :2])
          + post_trans[:, :, None, None, :2] * A[..., 2:3])
    b2 = (jnp.einsum('bnij,bnj->bni', pr2, Bv[..., :2])
          + post_trans[..., :2] * Bv[..., 2:3])          # [B,N,2]
    # full-res pixel -> feature coords (align_corners scaling), folded
    # into the numerator coefficients
    scale = jnp.asarray([(Wc - 1.0) / (Wi - 1.0),
                         (Hc - 1.0) / (Hi - 1.0)], a2.dtype)
    return (A[..., 2].astype(jnp.float32),
            Bv[..., 2].astype(jnp.float32),
            (a2 * scale).astype(jnp.float32),
            (b2 * scale).astype(jnp.float32))


# --------------------------------------------------------------------
# scan/gather implementation (round-2 path; off-TPU mirror)
# --------------------------------------------------------------------

def cost_volume_scan(curr_feat, prev_feat, depths, az, bz, a2, b2,
                     bias: float):
    """Depth-chunked packed-gather warp. curr/prev [B,N,H,W,C]; returns
    raw cost [B,N,D,H,W] f32 (bias applied, NO softmax).

    Design notes from v5e profiling: a scan over single depth planes
    serialises 118 small gathers; python-unrolling lets XLA overlap all
    of them but peaks at 35 GB. The sweet spot is a scan over chunks of
    8 planes with the full channel width on the lane dim, one packed
    [4C]-row gather per point (ops/grid_sample.py pack_neighborhood).
    """
    B, N, Hc, Wc, C = curr_feat.shape
    D = depths.shape[0]
    BN = B * N
    HW = Hc * Wc

    az_f = az.reshape(BN, 1, HW)
    bz_f = bz.reshape(BN, 1, 1)
    a2f = a2.reshape(BN, 1, HW, 2)
    b2f = b2.reshape(BN, 1, 1, 2)

    DCH = 8
    Dp = -(-D // DCH) * DCH
    depths = jnp.asarray(depths, jnp.float32)
    d_pad = jnp.concatenate(
        [depths, jnp.full((Dp - D,), -1e9, depths.dtype)]) \
        if Dp != D else depths
    d_chunks = d_pad.reshape(Dp // DCH, 1, DCH, 1)       # [nc,1,DCH,1]
    prev_packed = jax.vmap(pack_neighborhood)(
        prev_feat.reshape(BN, Hc, Wc, C).astype(jnp.bfloat16))
    curr_flat = curr_feat.reshape(BN, 1, HW, C).astype(jnp.float32)
    inv_ch = _invalid_channel(C)

    def one_chunk(_, d_c):
        den = d_c * az_f + bz_f                          # [BN,DCH,HW]
        behind = den < 1e-3
        safe = jnp.where(behind, 1.0, den)
        pix = (d_c[..., None] * a2f + b2f) / safe[..., None]
        px = jnp.where(behind, -2.0 * Wc, pix[..., 0])
        py = jnp.where(behind, -2.0 * Hc, pix[..., 1])
        warped = jax.vmap(
            lambda fl, xx, yy: bilinear_sample_packed(fl, Hc, Wc, xx, yy)
        )(prev_packed, px, py)                           # [BN,DCH,HW,C]
        cost_c = jnp.sum(
            jnp.abs(curr_flat - warped.astype(jnp.float32)), axis=-1)
        invalid_c = warped[..., inv_ch] == 0.0
        cost_c = jnp.where(invalid_c, cost_c + bias, cost_c)
        return None, cost_c                              # [BN,DCH,HW]

    _, cost = jax.lax.scan(one_chunk, None, d_chunks)
    cost = jnp.moveaxis(cost, 0, 1).reshape(BN, Dp, Hc, Wc)[:, :D]
    return cost.reshape(B, N, D, Hc, Wc)


# --------------------------------------------------------------------
# Pallas MXU one-hot matmul implementation
# --------------------------------------------------------------------

DCH = 8   # depth planes per grid step (out block sublane alignment)


def _mm_kernel(dep_ref, cam_ref, prev_ref, coef_ref, curr_ref, out_ref,
               *, win_w: int, win_h: int, H: int, W: int, C: int,
               bias: float, inv_ch: int):
    b = pl.program_id(0)
    dc = pl.program_id(2)
    bz = cam_ref[b, 0]
    b2x = cam_ref[b, 1]
    b2y = cam_ref[b, 2]
    az = coef_ref[0, 0, :, 0:1]                     # [P,1] f32
    a2x = coef_ref[0, 0, :, 1:2]
    a2y = coef_ref[0, 0, :, 2:3]
    curr = curr_ref[0, 0].astype(jnp.float32)       # [P,C]

    for i in range(DCH):
        dv = dep_ref[dc * DCH + i]
        den = dv * az + bz
        front = den >= 1e-3
        safe = jnp.where(front, den, 1.0)
        # behind-camera candidates park far outside so every tent
        # weight is zero -> warped == 0 -> invalid(+bias), as in the
        # scan path
        px = jnp.where(front, (dv * a2x + b2x) / safe, -2.0 * W)
        py = jnp.where(front, (dv * a2y + b2y) / safe, -2.0 * H)

        def window(p, n, win_n, align):
            """Per-plane window start along one axis + all-or-nothing
            clamp: a sample whose in-image support is not entirely
            inside the window is parked outside so BOTH taps zero ->
            invalid(+bias); never a partial half-tap warp. Taps outside
            the IMAGE may stay outside the window (exactly the
            zero-padding semantics of the gather path). `align` rounds
            the start DOWN (Mosaic requires sublane-dim dynamic slices
            8-aligned), costing up to align-1 rows of guaranteed
            coverage."""
            pin = jnp.where((p > -1.0) & (p < n), p, jnp.inf)
            s0f = jnp.min(pin)
            s0i = jnp.where(jnp.isfinite(s0f), jnp.floor(s0f), 0.0)
            s0 = jnp.clip(s0i.astype(jnp.int32), 0, n - win_n)
            if align > 1:
                # floor-align LAST (a later clip would erase the
                # Mosaic multiple_of hint that makes the sublane-dim
                # dynamic slice provably aligned)
                s0 = pl.multiple_of((s0 // align) * align, align)
            f = jnp.floor(p)
            sf = s0.astype(jnp.float32)
            ovf = (((f < sf) & (f >= 0.0))
                   | ((f + 1.0 > sf + (win_n - 1)) & (f + 1.0 <= n - 1)))
            return s0, jnp.where(ovf, -2.0 * n, p)

        if win_w < W:
            x0, px = window(px, W, win_w, 1)
        else:
            x0 = 0
        if win_h < H:
            y0, py = window(py, H, win_h, 8)
        else:
            y0 = 0
        win = prev_ref[0, pl.ds(x0, win_w), pl.ds(y0, win_h), :]
        win2 = win.reshape(win_w * win_h, C)        # [win_w*win_h, C]

        S = win_w * win_h
        k = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        xk = ((k // win_h) + x0).astype(jnp.float32)  # absolute column
        yk = ((k % win_h) + y0).astype(jnp.float32)   # absolute row
        # separable bilinear "tent": exactly the 4-tap zero-padding
        # weights (pixels outside the image are never in the window).
        # NOTE: a repeat/tile-expanded two-factor build measured ~9%
        # faster but pltpu.repeat's lane semantics differ from
        # np.repeat on hardware (wrong results; interpret mode hides
        # it) — keep the direct evaluation.
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(px - xk))
             * jnp.maximum(0.0, 1.0 - jnp.abs(py - yk)))
        warped = jnp.dot(w.astype(jnp.bfloat16), win2,
                         preferred_element_type=jnp.float32)   # [P,C]
        cost = jnp.sum(jnp.abs(curr - warped), axis=1, keepdims=True)
        invalid = warped[:, inv_ch:inv_ch + 1] == 0.0
        cost = jnp.where(invalid, cost + bias, cost)
        out_ref[0, 0, i, :] = cost[:, 0]


def _mm_chunk_kernel(dep_ref, cam_ref, prev_ref, coef_ref, curr_ref,
                     out_ref, *, win_w: int, win_h: int, H: int, W: int,
                     C: int, bias: float, inv_ch: int, dch: int):
    """Chunk-shared-window variant of _mm_kernel: ONE dynamic window
    slice and ONE [dch*P, S] @ [S, C] matmul per dch-plane chunk.

    Hypothesis was that the per-plane kernel pays a fixed ~0.35 us per
    plane in dynamic-slice setup + cross-lane min-reductions that one
    shared window would amortize 8x (consecutive SID planes map a tile
    to nearly the same source region: chunk-union spans exceed
    per-plane spans by <= ~8 columns beyond plane 16). MEASURED r5
    result on v5e, honest device-loop timing with the full output
    consumed: all-chunk 32x32 = 51.6 ms vs per-plane 32x32 = 47.2 ms
    at [6 cams, 118 planes, 64x176, C=256] — the shared window does
    NOT win; the per-plane kernel already runs at ~46% MXU utilization
    with the VPU tent build mostly overlapped, and the bigger [8P, S]
    matmul gains less than the wider-window FLOPs cost. Kept (tested,
    config-gated via plane-group mode 'chunk') because the trade-off
    is hardware-generation-dependent, but the shipped default uses
    per-plane windows. Clamp semantics: same all-or-nothing rule with
    the window start from the chunk-wide minimum in-view coordinate
    (audited by ops/cv_audit.py chunk_shared=True)."""
    b = pl.program_id(0)
    dc = pl.program_id(2)
    bz = cam_ref[b, 0]
    b2x = cam_ref[b, 1]
    b2y = cam_ref[b, 2]
    az = coef_ref[0, 0, :, 0:1]
    a2x = coef_ref[0, 0, :, 1:2]
    a2y = coef_ref[0, 0, :, 2:3]
    curr = curr_ref[0, 0].astype(jnp.float32)       # [P, C]

    pxs, pys = [], []
    for i in range(dch):
        dv = dep_ref[dc * dch + i]
        den = dv * az + bz
        front = den >= 1e-3
        safe = jnp.where(front, den, 1.0)
        pxs.append(jnp.where(front, (dv * a2x + b2x) / safe, -2.0 * W))
        pys.append(jnp.where(front, (dv * a2y + b2y) / safe, -2.0 * H))
    px = jnp.concatenate(pxs, axis=0)               # [dch*P, 1]
    py = jnp.concatenate(pys, axis=0)

    def window(p, n, win_n, align):
        pin = jnp.where((p > -1.0) & (p < n), p, jnp.inf)
        s0f = jnp.min(pin)
        s0i = jnp.where(jnp.isfinite(s0f), jnp.floor(s0f), 0.0)
        s0 = jnp.clip(s0i.astype(jnp.int32), 0, n - win_n)
        if align > 1:
            s0 = pl.multiple_of((s0 // align) * align, align)
        f = jnp.floor(p)
        sf = s0.astype(jnp.float32)
        ovf = (((f < sf) & (f >= 0.0))
               | ((f + 1.0 > sf + (win_n - 1)) & (f + 1.0 <= n - 1)))
        return s0, jnp.where(ovf, -2.0 * n, p)

    if win_w < W:
        x0, px = window(px, W, win_w, 1)
    else:
        x0 = 0
    if win_h < H:
        y0, py = window(py, H, win_h, 8)
    else:
        y0 = 0
    win = prev_ref[0, pl.ds(x0, win_w), pl.ds(y0, win_h), :]
    win2 = win.reshape(win_w * win_h, C)
    S = win_w * win_h
    k = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    xk = ((k // win_h) + x0).astype(jnp.float32)
    yk = ((k % win_h) + y0).astype(jnp.float32)
    w = (jnp.maximum(0.0, 1.0 - jnp.abs(px - xk))
         * jnp.maximum(0.0, 1.0 - jnp.abs(py - yk)))     # [dch*P, S]
    warped = jnp.dot(w.astype(jnp.bfloat16), win2,
                     preferred_element_type=jnp.float32)  # [dch*P, C]
    curr_t = jnp.concatenate([curr] * dch, axis=0)
    cost = jnp.sum(jnp.abs(curr_t - warped), axis=1, keepdims=True)
    invalid = warped[:, inv_ch:inv_ch + 1] == 0.0
    cost = jnp.where(invalid, cost + bias, cost)
    P = curr.shape[0]
    for i in range(dch):                 # plane-major rows -> planes
        out_ref[0, 0, i, :] = cost[i * P:(i + 1) * P, 0]


def _tile_pixels(x, th, tw, pad_value=0.0):
    """[BN, H, W, F] -> [BN, nT, th*tw, F] with edge padding."""
    BN, H, W, F = x.shape
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)),
                    constant_values=pad_value)
    x = x.reshape(BN, Hp // th, th, Wp // tw, tw, F)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(BN, (Hp // th) * (Wp // tw), th * tw, F)


def _untile_pixels(x, H, W, th, tw):
    """[BN, nT, D, th*tw] -> [BN, D, H, W] (crops padding)."""
    BN, nT, D, P = x.shape
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    x = x.reshape(BN, Hp // th, Wp // tw, D, th, tw)
    x = x.transpose(0, 3, 1, 4, 2, 5).reshape(BN, D, Hp, Wp)
    return x[:, :, :H, :W]


def cost_volume_mm(curr_feat, prev_feat, depths, az, bz, a2, b2,
                   bias: float, win_w: int = 32, win_h: int = 32,
                   tile: Tuple[int, int] = (16, 8),
                   plane_groups=None, chunk_mode: bool = False,
                   interpret: bool | None = None):
    """MXU windowed one-hot matmul warp. Same contract as
    cost_volume_scan (raw cost [B,N,D,H,W] f32); see module docstring
    for the window-clamp semantics (the window is 2-D since round 4:
    one fixed depth plane maps a destination tile — (16, 8) rows x
    cols by default — to a compact region in BOTH axes, so rows
    outside a win_h-tall band are as wasted as columns).
    `depths` must be concrete.

    plane_groups: optional ((end_idx, win_w, win_h[, mode]), ...) — the
    required window span shrinks sharply with plane depth
    (CV_AUDIT_r05.json: near planes carry metres of disparity spread,
    planes beyond ~5 m fit 15x32), so each contiguous plane group
    [prev_end, end_idx) runs its own pallas_call with its own window
    and the raw costs are concatenated along D. mode 'chunk' selects
    the chunk-shared-window kernel (_mm_chunk_kernel: one slice + one
    [DCH*P, S] matmul per 8-plane chunk — amortizes the measured
    ~0.35 us/plane scalar fixed cost; needs the slightly wider
    chunk-union window from the audit). None = one per-plane group
    with (win_w, win_h)."""
    B, N, Hc, Wc, C = curr_feat.shape
    depths = np.asarray(depths, np.float32)
    D = depths.shape[0]
    if plane_groups:
        start = 0
        parts = []
        for grp in plane_groups:
            end, ww, wh = grp[:3]
            mode = grp[3] if len(grp) > 3 else "plane"
            end = min(int(end), D)
            if end <= start:
                continue
            parts.append(cost_volume_mm(
                curr_feat, prev_feat, depths[start:end], az, bz, a2,
                b2, bias, win_w=ww, win_h=wh, tile=tile,
                chunk_mode=(mode == "chunk"), interpret=interpret))
            start = end
        assert start == D, ("plane_groups must cover every depth "
                            "plane", start, D)
        return jnp.concatenate(parts, axis=2)
    BN = B * N
    th, tw = tile
    win_w = min(win_w, Wc)
    win_h = min(win_h, Hc)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    prev_strip = jnp.transpose(
        prev_feat.reshape(BN, Hc, Wc, C), (0, 2, 1, 3)
    ).astype(jnp.bfloat16)                               # [BN, W, H, C]
    curr_t = _tile_pixels(curr_feat.reshape(BN, Hc, Wc, C)
                          .astype(jnp.float32), th, tw)   # [BN,nT,P,C]
    # per-pixel coefficient maps; padding gets az=-inf -> behind ->
    # invalid (the padded rows/cols are cropped from the output anyway)
    coef = jnp.stack([az.reshape(BN, Hc, Wc),
                      a2[..., 0].reshape(BN, Hc, Wc),
                      a2[..., 1].reshape(BN, Hc, Wc)], axis=-1)
    coef = jnp.pad(coef, ((0, 0), (0, 0), (0, 0), (0, 1)))
    coef_t = _tile_pixels(coef.astype(jnp.float32), th, tw,
                          pad_value=-1e30)               # [BN,nT,P,4]
    cam = jnp.stack([bz.reshape(BN), b2[..., 0].reshape(BN),
                     b2[..., 1].reshape(BN),
                     jnp.zeros((BN,), jnp.float32)], axis=-1)
    nT, P = curr_t.shape[1], th * tw

    # pad depth planes to the DCH-chunked grid; padded planes compute
    # garbage that is cropped below
    Dp = -(-D // DCH) * DCH
    depths_p = np.pad(depths, (0, Dp - D), constant_values=-1e9)

    S = win_w * win_h
    in_specs = [
        pl.BlockSpec((Dp,), lambda b, t, d: (0,),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((BN, 4), lambda b, t, d: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Wc, Hc, C), lambda b, t, d: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P, 4), lambda b, t, d: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P, C), lambda b, t, d: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    common = dict(
        grid=(BN, nT, Dp // DCH),
        in_specs=in_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BN * nT * Dp * P * S * C,
            bytes_accessed=BN * (2 * Hc * Wc * C * 2 + nT * P * Dp * 4),
            transcendentals=0),
        interpret=interpret,
    )
    vma = union_vma(curr_feat, prev_feat, az, bz, a2, b2)
    args = (jnp.asarray(depths_p), cam, prev_strip, coef_t, curr_t)
    if chunk_mode:
        kernel = functools.partial(
            _mm_chunk_kernel, win_w=win_w, win_h=win_h, H=Hc, W=Wc,
            C=C, bias=float(bias), inv_ch=_invalid_channel(C), dch=DCH)
    else:
        kernel = functools.partial(
            _mm_kernel, win_w=win_w, win_h=win_h, H=Hc, W=Wc, C=C,
            bias=float(bias), inv_ch=_invalid_channel(C))
    out = pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec((1, 1, DCH, P),
                               lambda b, t, d: (b, t, d, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (BN, nT, Dp, P), jnp.float32, vma=vma),
        **common)(*args)
    return _untile_pixels(out[:, :, :D], Hc, Wc, th, tw).reshape(
        B, N, D, Hc, Wc)


# --------------------------------------------------------------------
# public wrapper
# --------------------------------------------------------------------

def stereo_cost_volume(curr_feat, prev_feat, cv_frustum, k2s_sensor,
                       intrins, post_rots, post_trans, input_size,
                       bias: float, impl: str = "auto",
                       win_w: int = 32, win_h: int = 32,
                       tile: Tuple[int, int] = (16, 8),
                       plane_groups=None):
    """Plane-sweep cost volume against the previous frame.

    Args:
      curr_feat / prev_feat: [B, N, Hc, Wc, C] stem features.
      cv_frustum: [D, Hc, Wc, 3] template (pixel x, pixel y, depth);
        must be concrete (it is a config-derived constant).
      k2s_sensor: [B, N, 4, 4] key-sensor -> sweep-sensor transform.
      intrins/post_rots: [B, N, 3, 3]; post_trans: [B, N, 3].
      input_size: (H_in, W_in) raw input size for normalisation.
      bias: additive penalty for out-of-view candidates.
      impl: 'mm' (Pallas MXU), 'scan' (gather), or 'auto' (mm on TPU).
    Returns cost [B, N, D, Hc, Wc] softmaxed over D
    (reference view_transformer.py:593-595).
    """
    B, N, Hc, Wc, C = curr_feat.shape
    # the whole volume runs under no-grad in the reference
    # (view_transformer.py:618-619); cutting the tangents HERE (not
    # just on the output) also keeps jax.value_and_grad from trying to
    # JVP through the forward-only Pallas kernel
    curr_feat = jax.lax.stop_gradient(curr_feat)
    prev_feat = jax.lax.stop_gradient(prev_feat)
    az, bz, a2, b2 = homography_coeffs(
        cv_frustum, k2s_sensor, jax.lax.stop_gradient(intrins),
        jax.lax.stop_gradient(post_rots),
        jax.lax.stop_gradient(post_trans), input_size, (Hc, Wc))
    depths = cv_frustum[:, 0, 0, 2]
    if impl == "auto":
        impl = "mm" if jax.default_backend() == "tpu" else "scan"
    if impl == "mm" and isinstance(depths, jax.core.Tracer):
        # the mm kernel needs concrete depth values (static plane
        # chunking); under a traced frustum (e.g. a jitted flax init
        # where jnp constants become tracers) fall back to the gather
        # path — both produce the identical (param-free) result
        impl = "scan"
    if impl == "mm":
        cost = cost_volume_mm(curr_feat, prev_feat, np.asarray(depths),
                              az, bz, a2, b2, bias, win_w=win_w,
                              win_h=win_h, tile=tile,
                              plane_groups=plane_groups)
    else:
        cost = cost_volume_scan(curr_feat, prev_feat, depths, az, bz,
                                a2, b2, bias)
    return jax.nn.softmax(-cost, axis=2)
