"""Flagship-scale per-device cost deltas for the spatial sharding
phases (VERDICT r3 Weak #6: commit the flagship cost-analysis delta,
not just the tiny-scale 2% guard).

Compiles the FULL flagship train step (256x704 r50, 128x128 BEV, /4
stereo CV, render branch) on a d1xs2 virtual-CPU mesh for each
parallel-config variant and records XLA's per-device compiled cost
analysis (flops + bytes accessed). The compiled module is the SPMD
per-device program, so these numbers are what one chip of a space=2
pod would execute.

Variants:
  replicated   space axis exists but every phase off (cameras, VT
               interior, BEV rows, render bands replicated)
  phase2       cameras + VT interior sharded (round-3 state)
  phase3       phase2 + BEV row blocks + render bands (parallel/halo)

Usage: python tools_tpu/parallel_cost.py --out PHASE3_r04.json
(~7 CPU-minutes per variant on this host; cached on re-runs).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--variants", type=str,
                    default="replicated,phase2,phase3")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from ocrfdet_tpu.config import ocrfdet_config
    from ocrfdet_tpu.data.synthetic import make_batch
    from ocrfdet_tpu.models.detector import OcRFDet
    from ocrfdet_tpu.parallel.mesh import make_mesh
    from ocrfdet_tpu.parallel.step import build_train_step
    from ocrfdet_tpu.train.optim import create_train_state, make_optimizer
    from ocrfdet_tpu.utils.fast_init import fast_init
    from ocrfdet_tpu.utils.runtime import (enable_compilation_cache,
                                           shard_batch, shard_state)

    enable_compilation_cache()
    mesh = make_mesh(data=1, space=2, devices=jax.devices()[:2])

    def variant_cfg(name):
        cfg = ocrfdet_config(batch_size=1)
        p2 = name in ("phase2", "phase3")
        p3 = name == "phase3"
        return dataclasses.replace(
            cfg, parallel=dataclasses.replace(
                cfg.parallel, space_axis=2,
                shard_cameras=p2, shard_vt=p2,
                shard_bev=p3, shard_render=p3))

    results = {}
    for name in args.variants.split(","):
        cfg = variant_cfg(name)
        model = OcRFDet(cfg)
        variables, model = fast_init(cfg, OcRFDet, train=True)
        tx = make_optimizer(cfg.optim, variables["params"],
                            steps_per_epoch=1000)
        state = shard_state(mesh, create_train_state(variables, tx))
        batch = shard_batch(mesh, make_batch(cfg, batch_size=1, seed=0))
        step = build_train_step(cfg, model, tx, mesh)
        t0 = time.perf_counter()
        compiled = step.lower(state, batch).compile()
        cost = compiled.cost_analysis()
        results[name] = {
            "flops_per_device_t": round(float(cost["flops"]) / 1e12, 4),
            "bytes_accessed_gb": round(
                float(cost.get("bytes accessed", float("nan"))) / 2**30,
                3),
            "t_compile_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps({name: results[name]}), flush=True)

    if len(results) > 1 and "phase3" in results:
        base = results.get("phase2") or results.get("replicated")
        results["phase3_vs_prev_flop_ratio"] = round(
            results["phase3"]["flops_per_device_t"]
            / base["flops_per_device_t"], 4)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"mesh": "d1xs2 (flagship shapes, batch 1)",
                       "variants": results}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
