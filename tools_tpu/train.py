"""Train OcRFDet-TPU.

Replaces the reference's tools/train.py + dist_train.sh: there is no
process-per-GPU launch — one process drives the whole mesh via
jax.distributed (multi-host) or locally over all chips.

  python tools_tpu/train.py --infos data/bevdetv2-nuscenes_infos_train.pkl \
      --work-dir work/ocrfdet [--tiny] [--multihost]
"""
from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--infos", required=True)
    ap.add_argument("--work-dir", default="work/ocrfdet")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (debug)")
    ap.add_argument("--no-ocrf", action="store_true")
    ap.add_argument("--geoenh", action="store_true",
                    help="GeoEnhDet (VGGT distillation) flagship config")
    ap.add_argument("--vggt-ckpt", default="",
                    help="path to the released VGGT-1B torch checkpoint")
    ap.add_argument("--frames8", action="store_true",
                    help="8-frame test-set variant")
    ap.add_argument("--batch-size", type=int, default=0)
    ap.add_argument("--max-steps-per-epoch", type=int, default=0)
    ap.add_argument("--multihost", action="store_true",
                    help="initialise jax.distributed for multi-host")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    if args.multihost:
        import jax
        jax.distributed.initialize()

    from ocrfdet_tpu.config import (geoenh_config, ocrfdet_8f_config,
                                    ocrfdet_config, tiny_config)
    from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
    from ocrfdet_tpu.train.trainer import Trainer

    if args.tiny:
        cfg = tiny_config()
    elif args.geoenh:
        import dataclasses as dc
        cfg = geoenh_config()
        if args.vggt_ckpt:
            cfg = dc.replace(cfg, vggt_teacher=dc.replace(
                cfg.vggt_teacher, ckpt_path=args.vggt_ckpt))
    elif args.frames8:
        cfg = ocrfdet_8f_config()
    else:
        cfg = ocrfdet_config()
    if args.no_ocrf:
        import dataclasses
        cfg = dataclasses.replace(cfg, with_ocrf=False)
    if args.batch_size:
        import dataclasses
        cfg = dataclasses.replace(cfg, batch_size=args.batch_size)

    import jax
    dataset = NuScenesDataset(cfg, args.infos, is_train=True)
    loader = Loader(dataset, cfg.batch_size,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    trainer = Trainer(cfg, args.work_dir, steps_per_epoch=len(loader))
    example = next(loader.epoch(0))
    trainer.init_state(example)
    start = trainer.resume() if args.resume else 0
    trainer.fit(loader, start_epoch=start,
                max_steps_per_epoch=args.max_steps_per_epoch or None)


if __name__ == "__main__":
    main()
