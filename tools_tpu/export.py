"""AOT-export the inference graph (deployment-path analog).

The reference ships a TensorRT conversion path with static precomputed
bev-pool ranks (tools/convert_bevdet_to_TRT.py, detectors/bevdet.py
BEVDetTRT:242-276). The TPU-native equivalent is a serialised
jax.export StableHLO artifact of the jitted inference function —
static shapes, host-free — loadable from any JAX (or IFRT) runtime.

  python tools_tpu/export.py --out ocrfdet_infer.stablehlo [--tiny]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ocrfdet_infer.stablehlo")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch-size", type=int, default=1)
    args = ap.parse_args()

    from jax import export as jexport
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

    def infer(batch):
        preds, _ = model.apply(variables, batch, train=False)
        decoded = decode_all_tasks(preds, cfg.head, cfg.grid)
        return [d._asdict() for d in decoded]

    exported = jexport.export(jax.jit(infer))(batch)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB StableHLO -> {args.out}")
    print("in_avals:", len(exported.in_avals))


if __name__ == "__main__":
    main()
