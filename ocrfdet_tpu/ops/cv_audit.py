"""Window-clamp audit for the MXU cost volume (ops/cost_volume.py).

The Pallas kernel scores any sample whose in-image bilinear support is
not fully inside the per-(tile, plane) column/row window as out-of-view
(+bias) instead of warping it — an accuracy-affecting deviation from the
reference's exact warp (view_transformer.py:568-596) documented in
PARITY.md. This module replicates the kernel's window arithmetic
(`_mm_kernel.window`, including the floor/clip order and the 8-row
sublane alignment of the row-window start) in vectorized numpy so the
deviation can be MEASURED at real geometry instead of argued about:

  * `window_clamp_counts` — for one geometry draw, count samples that
    the exact gather path warps (>= one in-image tap, in front of the
    sweep camera) but the windowed kernel parks (clamps) — plus the
    per-(tile, plane) window spans actually required, so window sizes
    can be chosen from data.
  * `audit_geometry` — run the counter over a batch of homography
    coefficient maps for a given (tile, win) and return a summary.

Used by tools_tpu/cv_window_audit.py (writes CV_AUDIT_r05.json) and
tests/test_cost_volume_mm.py::test_flagship_geometry_no_clamp.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _tile_maps(x: np.ndarray, th: int, tw: int, pad: float) -> np.ndarray:
    """[BN, H, W] -> [BN, nT, th*tw] with edge padding (mirrors
    cost_volume._tile_pixels for a single feature channel)."""
    BN, H, W = x.shape
    Hp = -(-H // th) * th
    Wp = -(-W // tw) * tw
    if (Hp, Wp) != (H, W):
        x = np.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)),
                   constant_values=pad)
    x = x.reshape(BN, Hp // th, th, Wp // tw, tw)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(BN, (Hp // th) * (Wp // tw), th * tw)


def _window_start(p: np.ndarray, n: int, win_n: int,
                  align: int) -> Tuple[np.ndarray, np.ndarray]:
    """Kernel window-start + all-or-nothing overflow mask, vectorized
    over the leading axes of p [..., P]. Returns (s0 [...], ovf [...,P])."""
    pin = np.where((p > -1.0) & (p < n), p, np.inf)
    s0f = np.min(pin, axis=-1)
    s0i = np.where(np.isfinite(s0f), np.floor(s0f), 0.0)
    s0 = np.clip(s0i.astype(np.int64), 0, n - win_n)
    if align > 1:
        s0 = (s0 // align) * align
    f = np.floor(p)
    sf = s0[..., None].astype(np.float64)
    ovf = (((f < sf) & (f >= 0.0))
           | ((f + 1.0 > sf + (win_n - 1)) & (f + 1.0 <= n - 1)))
    return s0, ovf


def window_clamp_counts(az: np.ndarray, bz: np.ndarray, a2: np.ndarray,
                        b2: np.ndarray, depths: np.ndarray,
                        feat_hw: Tuple[int, int],
                        tile: Tuple[int, int], win_w: int, win_h: int,
                        y_align: int = 8,
                        plane_chunk: int = 8,
                        chunk_shared: bool = False) -> Dict[str, float]:
    """Count exact-path-valid samples the windowed kernel clamps.

    Args mirror homography_coeffs output flattened over cameras:
    az [BN,H,W], bz [BN], a2 [BN,H,W,2], b2 [BN,2]; depths [D].
    Returns counts plus the required per-(tile, plane) window spans
    (the smallest win_w / win_h — including the y alignment loss —
    that would have covered every in-image tap of valid samples).
    """
    H, W = feat_hw
    th, tw = tile
    win_w = min(win_w, W)
    win_h = min(win_h, H)
    BN = az.shape[0]
    az_t = _tile_maps(az.astype(np.float64), th, tw, -1e30)
    a2x_t = _tile_maps(a2[..., 0].astype(np.float64), th, tw, -1e30)
    a2y_t = _tile_maps(a2[..., 1].astype(np.float64), th, tw, -1e30)
    bz_c = bz.astype(np.float64)[:, None, None]
    b2x_c = b2[..., 0].astype(np.float64)[:, None, None]
    b2y_c = b2[..., 1].astype(np.float64)[:, None, None]

    n_front = 0
    n_valid = 0
    n_clamped = 0
    req_w_all = []
    req_h_all = []
    D = depths.shape[0]
    per_plane_w = np.zeros(D)
    per_plane_h = np.zeros(D)
    per_plane_w999 = np.zeros(D)
    per_plane_h999 = np.zeros(D)
    per_plane_clamp = np.zeros(D, np.int64)
    for d0 in range(0, D, plane_chunk):
        d = depths[d0:d0 + plane_chunk].astype(np.float64)
        dv = d[:, None, None, None]                     # [dc,1,1,1]
        den = dv * az_t[None] + bz_c[None]              # [dc,BN,nT,P]
        front = den >= 1e-3
        safe = np.where(front, den, 1.0)
        px = np.where(front, (dv * a2x_t[None] + b2x_c[None]) / safe,
                      -2.0 * W)
        py = np.where(front, (dv * a2y_t[None] + b2y_c[None]) / safe,
                      -2.0 * H)
        # a sample the exact path warps non-trivially: in front, with at
        # least one in-image tap on BOTH axes
        valid = front & (px > -1.0) & (px < W) & (py > -1.0) & (py < H)
        if chunk_shared:
            # kernel _mm_chunk_kernel: ONE window per (tile, chunk),
            # start from the chunk-wide min — merge the plane axis
            # into the sample axis for the window computation
            dc = px.shape[0]
            pxs = np.moveaxis(px, 0, 2).reshape(
                px.shape[1], px.shape[2], dc * px.shape[3])
            pys = np.moveaxis(py, 0, 2).reshape(*pxs.shape)
            if win_w < W:
                _, ox = _window_start(pxs, W, win_w, 1)
            else:
                ox = np.zeros_like(pxs, bool)
            if win_h < H:
                _, oy = _window_start(pys, H, win_h, y_align)
            else:
                oy = np.zeros_like(pys, bool)
            ovf_x = np.moveaxis(
                ox.reshape(px.shape[1], px.shape[2], dc, px.shape[3]),
                2, 0)
            ovf_y = np.moveaxis(
                oy.reshape(px.shape[1], px.shape[2], dc, px.shape[3]),
                2, 0)
        elif win_w < W:
            _, ovf_x = _window_start(px, W, win_w, 1)
        else:
            ovf_x = np.zeros_like(valid)
        if not chunk_shared:
            if win_h < H:
                _, ovf_y = _window_start(py, H, win_h, y_align)
            else:
                ovf_y = np.zeros_like(valid)
        n_front += int(front.sum())
        n_valid += int(valid.sum())
        clamped = valid & (ovf_x | ovf_y)
        n_clamped += int(clamped.sum())
        per_plane_clamp[d0:d0 + d.shape[0]] += clamped.sum(
            axis=(1, 2, 3))

        # required spans: smallest window that would have covered every
        # valid sample of this (tile, plane), given the kernel's
        # floor(min in-image x) start rule (and 8-aligned row starts)
        pxv = np.where(valid, px, np.inf)
        pyv = np.where(valid, py, np.inf)
        x_lo = np.floor(np.min(np.where((pxv > -1.0) & (pxv < W),
                                        pxv, np.inf), axis=-1))
        y_lo = np.floor(np.min(np.where((pyv > -1.0) & (pyv < H),
                                        pyv, np.inf), axis=-1))
        y_lo_fin = np.where(np.isfinite(y_lo), y_lo, 0.0)
        y_lo = np.where(np.isfinite(y_lo),
                        (y_lo_fin // y_align) * y_align, y_lo)
        x_hi = np.max(np.where(valid, np.minimum(np.floor(px) + 1,
                                                 W - 1), -np.inf),
                      axis=-1)
        y_hi = np.max(np.where(valid, np.minimum(np.floor(py) + 1,
                                                 H - 1), -np.inf),
                      axis=-1)
        any_v = valid.any(axis=-1)
        req_w = np.where(any_v & np.isfinite(x_lo), x_hi - x_lo + 1, 0)
        req_h = np.where(any_v & np.isfinite(y_lo), y_hi - y_lo + 1, 0)
        req_w_all.append(req_w[any_v])
        req_h_all.append(req_h[any_v])
        for j in range(d.shape[0]):
            di = d0 + j
            if any_v[j].any():
                w_j = req_w[j][any_v[j]]
                h_j = req_h[j][any_v[j]]
                per_plane_w[di] = max(per_plane_w[di], w_j.max())
                per_plane_h[di] = max(per_plane_h[di], h_j.max())
                per_plane_w999[di] = max(per_plane_w999[di],
                                         np.percentile(w_j, 99.9))
                per_plane_h999[di] = max(per_plane_h999[di],
                                         np.percentile(h_j, 99.9))

    req_w = (np.concatenate(req_w_all) if req_w_all
             else np.zeros(0))
    req_h = (np.concatenate(req_h_all) if req_h_all
             else np.zeros(0))
    out: Dict[str, float] = dict(
        n_front=n_front, n_valid=n_valid, n_clamped=n_clamped,
        clamp_frac=(n_clamped / n_valid) if n_valid else 0.0)
    for name, arr in (("req_w", req_w), ("req_h", req_h)):
        if arr.size:
            out[f"{name}_max"] = float(arr.max())
            out[f"{name}_p999"] = float(np.percentile(arr, 99.9))
            out[f"{name}_p99"] = float(np.percentile(arr, 99))
        else:
            out[f"{name}_max"] = 0.0
    out["per_plane"] = dict(
        req_w_max=per_plane_w.tolist(), req_h_max=per_plane_h.tolist(),
        req_w_p999=per_plane_w999.tolist(),
        req_h_p999=per_plane_h999.tolist(),
        n_clamped=per_plane_clamp.tolist())
    return out


def audit_batch(batch: Dict[str, np.ndarray], cfg, frames,
                tile: Tuple[int, int], win_w: int,
                win_h: int) -> Dict[str, float]:
    """Run the clamp counter on a pipeline/synthetic batch for the given
    stereo frames (the detector builds a CV for every non-stereo-ref
    frame f with k2s_sensor[:, f]; models/detector.py:221-244)."""
    import jax.numpy as jnp
    from .cost_volume import homography_coeffs
    from ..geometry.frustum import make_frustum

    Hc = cfg.data.input_size[0] // cfg.vt.depthnet.cv_downsample
    Wc = cfg.data.input_size[1] // cfg.vt.depthnet.cv_downsample
    fr = make_frustum(cfg.grid.depth, cfg.data.input_size,
                      cfg.vt.depthnet.cv_downsample)
    depths = fr[:, 0, 0, 2]
    totals: Dict[str, float] = {}
    for f in frames:
        az, bz, a2, b2 = homography_coeffs(
            jnp.asarray(fr), jnp.asarray(batch["k2s_sensor"][:, f]),
            jnp.asarray(batch["intrins"][:, f]),
            jnp.asarray(batch["post_rots"][:, f]),
            jnp.asarray(batch["post_trans"][:, f]),
            cfg.data.input_size, (Hc, Wc))
        B, N = az.shape[:2]
        res = window_clamp_counts(
            np.asarray(az).reshape(B * N, Hc, Wc),
            np.asarray(bz).reshape(B * N),
            np.asarray(a2).reshape(B * N, Hc, Wc, 2),
            np.asarray(b2).reshape(B * N, 2),
            depths, (Hc, Wc), tile, win_w, win_h)
        merge_stats(totals, res)
    totals["clamp_frac"] = (totals["n_clamped"] / totals["n_valid"]
                            if totals.get("n_valid") else 0.0)
    return totals


def audit_groups(batch: Dict[str, np.ndarray], cfg, frames,
                 tile: Tuple[int, int], plane_groups) -> Dict:
    """Clamp audit of a full plane_groups spec (incl. 'chunk' groups,
    which use the chunk-shared window rule of _mm_chunk_kernel).
    Returns {n_valid, n_clamped, per_group:[...]}. Group boundaries
    must align to the 8-plane chunk grid."""
    import jax.numpy as jnp
    from .cost_volume import homography_coeffs
    from ..geometry.frustum import make_frustum

    Hc = cfg.data.input_size[0] // cfg.vt.depthnet.cv_downsample
    Wc = cfg.data.input_size[1] // cfg.vt.depthnet.cv_downsample
    fr = make_frustum(cfg.grid.depth, cfg.data.input_size,
                      cfg.vt.depthnet.cv_downsample)
    depths = fr[:, 0, 0, 2]
    D = depths.shape[0]
    out = {"n_valid": 0, "n_clamped": 0, "per_group": []}
    for f in frames:
        az, bz, a2, b2 = homography_coeffs(
            jnp.asarray(fr), jnp.asarray(batch["k2s_sensor"][:, f]),
            jnp.asarray(batch["intrins"][:, f]),
            jnp.asarray(batch["post_rots"][:, f]),
            jnp.asarray(batch["post_trans"][:, f]),
            cfg.data.input_size, (Hc, Wc))
        B, N = az.shape[:2]
        a = (np.asarray(az).reshape(B * N, Hc, Wc),
             np.asarray(bz).reshape(B * N),
             np.asarray(a2).reshape(B * N, Hc, Wc, 2),
             np.asarray(b2).reshape(B * N, 2))
        start = 0
        for gi, grp in enumerate(plane_groups):
            end, ww, wh = grp[:3]
            mode = grp[3] if len(grp) > 3 else "plane"
            end = min(int(end), D)
            if end <= start:
                continue
            assert start % 8 == 0, start
            r = window_clamp_counts(
                *a, depths[start:end], (Hc, Wc), tile, ww, wh,
                chunk_shared=(mode == "chunk"))
            out["n_valid"] += r["n_valid"]
            out["n_clamped"] += r["n_clamped"]
            if f == frames[0] and len(out["per_group"]) <= gi:
                out["per_group"].append(
                    {"range": [start, end], "win": [ww, wh],
                     "mode": mode, "n_clamped": 0})
            for g in out["per_group"]:
                if g["range"] == [start, end]:
                    g["n_clamped"] += r["n_clamped"]
            start = end
    out["clamp_frac"] = (out["n_clamped"] / out["n_valid"]
                         if out["n_valid"] else 0.0)
    return out


def merge_stats(totals: Dict, res: Dict) -> Dict:
    """Accumulate window_clamp_counts outputs: counts add, spans max,
    per-plane vectors merge elementwise."""
    for k, v in res.items():
        if k == "per_plane":
            pp = totals.setdefault("per_plane", {})
            for pk, vec in v.items():
                prev = pp.get(pk)
                if prev is None:
                    pp[pk] = list(vec)
                elif pk.startswith("n_"):
                    pp[pk] = [a + b for a, b in zip(prev, vec)]
                else:
                    pp[pk] = [max(a, b) for a, b in zip(prev, vec)]
        elif k.startswith("n_"):
            totals[k] = totals.get(k, 0) + v
        elif k == "clamp_frac":
            pass
        else:
            totals[k] = max(totals.get(k, 0.0), v)
    return totals
