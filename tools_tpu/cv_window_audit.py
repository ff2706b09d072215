"""Measure the cost-volume window-clamp deviation at real geometry.

VERDICT r4 item 3: the MXU cost volume's window clamp
(ops/cost_volume.py module docstring) is an accuracy-affecting
approximation of the reference's exact warp
(view_transformer.py:568-596) that had never been QUANTIFIED. This tool
runs the kernel-exact window arithmetic (ops/cv_audit.py) over

  * the synthetic benchmark rig (data/synthetic.py make_batch) — the
    geometry bench.py and the overfit proofs actually run, and
  * the fake-nuScenes pipeline with LIVE augmentation (random
    resize/crop/flip/rotate draws), flagship input size — the geometry
    training actually sees,

for a grid of (tile, win_w, win_h) choices, and reports (a) how many
exact-path-valid samples each window clamps and (b) the per-(tile,
plane) window spans actually required, so the shipped defaults are
picked from data. Writes CV_AUDIT_r05.json.

Usage: python tools_tpu/cv_window_audit.py [--pipeline-draws 24]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_batches(cfg, n_seeds: int):
    from ocrfdet_tpu.data.synthetic import make_batch
    for s in range(n_seeds):
        yield make_batch(cfg, batch_size=2, seed=s, with_targets=False)


def pipeline_batches(cfg, n_draws: int):
    """Fake-nuScenes samples through the REAL train pipeline with live
    aug; each draw re-samples the augmentation."""
    from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes
    from ocrfdet_tpu.data.infos import load_infos
    from ocrfdet_tpu.data.pipeline import collate, prepare_sample
    with tempfile.TemporaryDirectory() as root:
        pkl = build_fake_nuscenes(root, cfg, n_samples=8,
                                  img_hw=(450, 800), seed=0)
        infos = load_infos(pkl)
        rng = np.random.default_rng(123)
        for d in range(n_draws):
            s = prepare_sample(cfg, infos, d % len(infos), rng,
                               is_train=True, data_root=root)
            yield collate([s])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-draws", type=int, default=24)
    ap.add_argument("--synthetic-seeds", type=int, default=4)
    ap.add_argument("--out", default="CV_AUDIT_r05.json")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ocrfdet_tpu.config import ocrfdet_config
    from ocrfdet_tpu.ops.cv_audit import audit_batch, merge_stats

    cfg = ocrfdet_config()
    frames = list(range(cfg.total_frames - 1))   # every CV frame
    grid = [
        # (tile, win_w, win_h) — current default first
        ((16, 8), 32, 32),
        ((16, 8), 24, 32),
        ((16, 8), 16, 32),
        ((8, 16), 32, 16),
        ((8, 16), 24, 16),
        ((8, 16), 32, 24),
        ((8, 8), 16, 16),
    ]
    report = {"config": "flagship ocrfdet_config()",
              "frames_audited": frames, "rigs": {}}
    for rig, batches in (
            ("synthetic", list(synthetic_batches(cfg,
                                                 args.synthetic_seeds))),
            ("pipeline_live_aug", list(pipeline_batches(
                cfg, args.pipeline_draws)))):
        rows = []
        for (tile, ww, wh) in grid:
            tot = {}
            for batch in batches:
                merge_stats(tot, audit_batch(batch, cfg, frames,
                                             tile, ww, wh))
            tot["clamp_frac"] = (tot["n_clamped"] / tot["n_valid"]
                                 if tot.get("n_valid") else 0.0)
            rows.append({"tile": list(tile), "win_w": ww, "win_h": wh,
                         **{k: round(v, 6) if isinstance(v, float) else v
                            for k, v in tot.items()}})
            print(f"[{rig}] tile={tile} win={ww}x{wh}: "
                  f"clamped {tot['n_clamped']}/{tot['n_valid']} "
                  f"(req_w max {tot['req_w_max']:.0f} "
                  f"p99.9 {tot.get('req_w_p999', 0):.0f}; "
                  f"req_h max {tot['req_h_max']:.0f} "
                  f"p99.9 {tot.get('req_h_p999', 0):.0f})",
                  flush=True)
        report["rigs"][rig] = rows

    with open(os.path.join(os.path.dirname(__file__), "..", args.out),
              "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
