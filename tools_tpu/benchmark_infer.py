"""Inference throughput benchmark (analog of the reference's
tools/analysis_tools/benchmark.py: warmup + timed fps, data time
excluded; here the decode also runs in-graph).

  python tools_tpu/benchmark_infer.py [--batch-size 1] [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from ocrfdet_tpu.config import ocrfdet_config, tiny_config
    from ocrfdet_tpu.core.coder import decode_all_tasks
    from ocrfdet_tpu.data.synthetic import make_batch
    from ocrfdet_tpu.models.detector import OcRFDet
    from ocrfdet_tpu.utils.fast_init import fast_init

    cfg = tiny_config() if args.tiny else ocrfdet_config()
    variables, model = fast_init(cfg, OcRFDet, train=False)
    batch = make_batch(cfg, batch_size=args.batch_size, seed=0,
                       with_targets=False)
    batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in batch.items()}

    @jax.jit
    def infer(batch):
        preds, _ = model.apply(variables, batch, train=False)
        return [d._asdict()
                for d in decode_all_tasks(preds, cfg.head, cfg.grid)]

    out = infer(batch)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        out = infer(batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer(batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.batch_size * args.iters / dt
    print(f"inference: {fps:.2f} frames/s "
          f"({dt / args.iters * 1e3:.1f} ms/batch, "
          f"batch={args.batch_size}, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
