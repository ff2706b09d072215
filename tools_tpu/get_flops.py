"""Model FLOPs / parameter counting (analog of tools/analysis_tools/
get_flops.py) via XLA's compiled cost analysis.

  python tools_tpu/get_flops.py [--tiny] [--train]
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
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="cost of the training forward (incl. renders)")
    ap.add_argument("--batch-size", type=int, default=1)
    args = ap.parse_args()

    from ocrfdet_tpu.config import ocrfdet_config, tiny_config
    from ocrfdet_tpu.data.synthetic import make_batch
    from ocrfdet_tpu.models.detector import OcRFDet
    from ocrfdet_tpu.utils.fast_init import fast_init

    cfg = tiny_config() if args.tiny else ocrfdet_config()
    variables, model = fast_init(cfg, OcRFDet, train=args.train)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    batch = make_batch(cfg, batch_size=args.batch_size, seed=0)
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                 else ([jnp.asarray(x) for x in v]
                       if isinstance(v, list) else v))
             for k, v in batch.items()}

    def fwd(b):
        if args.train:
            out, _ = model.apply(variables, b, train=True,
                                 mutable=["batch_stats"])
            return out[0]
        preds, _ = model.apply(variables, b, train=False)
        return preds

    lowered = jax.jit(fwd).lower(batch)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops: {flops / 1e9:.2f} GFLOP "
          f"(batch={args.batch_size}, train={args.train})")
    for k in ("bytes accessed", "transcendentals"):
        if k in cost:
            print(f"{k}: {cost[k] / 1e9:.2f} G")


if __name__ == "__main__":
    main()
