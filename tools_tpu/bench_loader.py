"""Host input-pipeline throughput at flagship sample cost.

Builds a fake nuScenes shard with REAL-dataset image sizes (900x1600
JPEGs — the decode cost that matters), then measures the Loader's
end-to-end samples/s (PIL decode of 18 images/sample for 2 temporal
frames + stereo ref, resize/crop/flip/rotate aug, point-label
rasterisation, BEV mask, collate) across worker counts.

The number to beat is the post-optimization device throughput
(BENCH_r03: ~1.6 frames/s/chip): the loader must exceed it per host or
the input pipeline bounds the step. Reference analog: workers_per_gpu=8
(apis/train.py:208-220) with torch DataLoader processes.

Usage: python tools_tpu/bench_loader.py [--samples 16] [--batches 8]
       [--workers 1,4,8,16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--workers", default="1,4,8,16")
    ap.add_argument("--img-hw", default="900,1600")
    args = ap.parse_args()

    from ocrfdet_tpu.config import ocrfdet_config
    from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
    from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes

    H, W = (int(x) for x in args.img_hw.split(","))
    cfg = ocrfdet_config(batch_size=args.batch_size)
    root = tempfile.mkdtemp(prefix="ocrf_loaderbench_")
    t0 = time.perf_counter()
    pkl = build_fake_nuscenes(root, cfg, n_samples=args.samples,
                              img_hw=(H, W))
    print(f"fixture: {args.samples} samples @ {H}x{W} "
          f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
    ds = NuScenesDataset(cfg, pkl, is_train=True)

    results = {}
    for nw in (int(x) for x in args.workers.split(",")):
        loader = Loader(ds, batch_size=args.batch_size, shuffle=True,
                        num_workers=nw, drop_last=False, prefetch=4)
        it = loader.epoch(0)
        next(it)                       # warm the pool / page cache
        t0 = time.perf_counter()
        n = 0
        for bi, batch in enumerate(it):
            n += batch["imgs"].shape[0]
            if bi + 1 >= args.batches:
                break
        dt = time.perf_counter() - t0
        results[nw] = n / dt
        print(f"workers={nw:3d}: {n / dt:6.2f} samples/s "
              f"({dt / max(n, 1) * 1e3:.0f} ms/sample)", file=sys.stderr)
    best = max(results.values())
    print(json.dumps({
        "metric": "loader_samples_per_s",
        "value": round(best, 3), "unit": "samples/s",
        "img_hw": [H, W],
        "per_workers": {str(k): round(v, 3) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
