"""Overfit-to-convergence proof: train on a fixed fake-nuScenes set.

The reference's de-facto correctness test is `tools/test.py --eval mAP`
through the nuScenes devkit (reference
mmdet3d/datasets/nuscenes_dataset.py:432-491). This tool is the
environment-scale analog (SURVEY.md §4 item 4): train the full OcRFDet
graph on a FIXED set of fake-nuScenes samples (pinned augmentation, so
the mapping image->boxes is deterministic) until the loss collapses,
then run the complete decode -> Scale-NMS -> native-mAP evaluation path
on the same samples. If the assembled system (losses, optimizer,
EMA/LR schedule, decode, NMS, evaluator) optimizes and localizes, mAP
on the memorized set approaches 1; any wiring bug (sign errors, dead
gradients, decode offsets) keeps it near 0.

  python tools_tpu/overfit.py --samples 16 --epochs 150 --lr 1e-3 \
      --work-dir /tmp/overfit

Writes <work-dir>/overfit_result.json and prints one JSON summary line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class FixedEpochDataset:
    """Pins the augmentation RNG to epoch 0 so every epoch sees the
    exact same (augmented) samples — the overfit target set."""

    def __init__(self, inner):
        self.inner = inner
        self.cfg = inner.cfg

    def __len__(self):
        return len(self.inner)

    def sample(self, i: int, epoch: int = 0):
        return self.inner.sample(i, epoch=0)


def heatmap_loss_of(rec: dict) -> float:
    return sum(v for k, v in rec.items()
               if k.endswith("loss_heatmap"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--work-dir", default="/tmp/ocrfdet_overfit")
    ap.add_argument("--flagship", action="store_true",
                    help="use the flagship config (slow) instead of tiny")
    ap.add_argument("--min-map", type=float, default=0.8)
    ap.add_argument("--bev", type=int, default=0,
                    help="override BEV grid size (e.g. 32 -> 32x32 at "
                         "3.2 m cells; tiny default is 16x16, whose "
                         "coarse cells cap localisation AP)")
    args = ap.parse_args()

    from ocrfdet_tpu.config import ocrfdet_config, tiny_config
    from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
    from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes
    from ocrfdet_tpu.train.evaluate import run_eval
    from ocrfdet_tpu.train.trainer import Trainer

    base = ocrfdet_config() if args.flagship else tiny_config()
    if args.bev:
        from ocrfdet_tpu.config import GridConfig
        n = args.bev
        cell = 102.4 / n
        base = dataclasses.replace(
            base,
            grid=dataclasses.replace(base.grid, x=(-51.2, 51.2, cell),
                                     y=(-51.2, 51.2, cell)),
            vt=dataclasses.replace(base.vt, bev_h=n, bev_w=n),
            # keep out_size_factor: voxel * 8 == BEV cell
            head=dataclasses.replace(base.head,
                                     voxel_size=(cell / 8, cell / 8)),
        )
    cfg = dataclasses.replace(
        base,
        batch_size=args.batch_size,
        optim=dataclasses.replace(
            base.optim, lr=args.lr, warmup_iters=args.warmup,
            max_epochs=args.epochs,
            # temporal fusion on from the start: the schedule gate is
            # tested elsewhere; here every step must exercise the full
            # graph that eval runs
            temporal_start_epoch=0),
    )

    os.makedirs(args.work_dir, exist_ok=True)
    data_root = os.path.join(args.work_dir, "fake_nuscenes")
    H, W = cfg.data.input_size
    pkl = build_fake_nuscenes(data_root, cfg, n_samples=args.samples,
                              img_hw=(2 * H, 2 * W), seed=0)

    ds = FixedEpochDataset(
        NuScenesDataset(cfg, pkl, is_train=True, cbgs=False))
    loader = Loader(ds, cfg.batch_size, shuffle=True, drop_last=True)
    eval_loader = Loader(ds, cfg.batch_size, shuffle=False,
                         drop_last=False)

    trainer = Trainer(cfg, args.work_dir, steps_per_epoch=len(loader))
    trainer.init_state()
    start = trainer.resume()   # continue a killed run from its ckpt

    log_path = os.path.join(args.work_dir, "metrics.jsonl")
    if start == 0 and os.path.exists(log_path):
        os.remove(log_path)
    if start:
        print(f"resuming at epoch {start}", flush=True)
    for epoch in range(start, args.epochs):
        trainer.run_epoch(loader, epoch, log_every=max(len(loader), 1))
        if (epoch + 1) % 10 == 0 or epoch == args.epochs - 1:
            trainer.save(epoch)

    # ---- loss curve summary from the metrics log
    recs = [json.loads(l) for l in open(log_path)]
    first, last = recs[0], recs[-1]
    curve = dict(
        steps=args.epochs * len(loader),
        loss_total_first=first["loss_total"],
        loss_total_last=last["loss_total"],
        loss_heatmap_first=heatmap_loss_of(first),
        loss_heatmap_last=heatmap_loss_of(last),
    )

    # ---- full decode -> NMS -> native-metrics eval on the same set,
    # from the RAW params (EMA ramps too slowly for a short overfit)
    state = trainer.state
    metrics = run_eval(cfg, trainer.model, state.params,
                       state.batch_stats, eval_loader)

    result = dict(curve, mAP=metrics["mAP"], NDS=metrics["NDS"],
                  mATE=metrics["mATE"], mASE=metrics["mASE"],
                  mAOE=metrics["mAOE"],
                  per_class_ap=metrics["per_class_ap"],
                  samples=args.samples,
                  config="flagship" if args.flagship else "tiny",
                  lr=args.lr)
    with open(os.path.join(args.work_dir, "overfit_result.json"),
              "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))

    ok = (result["loss_total_last"] < 0.5 * result["loss_total_first"]
          and result["mAP"] >= args.min_map)
    print(f"overfit: {'PASS' if ok else 'FAIL'} "
          f"(loss {result['loss_total_first']:.2f} -> "
          f"{result['loss_total_last']:.2f}, mAP {result['mAP']:.3f})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
