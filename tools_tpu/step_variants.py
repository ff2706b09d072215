"""Step-time attribution by compiled variants (the round-3 method).

The tunnelled TPU trace drops most device events (profile_step.py
captured 75-350 ms of a ~680 ms step in rounds 4-5), so the reliable
attribution is differential: AOT-compile the flagship train step with a
component disabled and subtract. Variants:

  full        the shipped flagship step
  no_stereo   use_stereo=False  -> removes both cost volumes + stereo
              stem reuse (delta = stereo chain)
  no_ocrf     with_ocrf=False   -> removes the OcRF transformer branch
              (HT pool, voxel MLPs, renderers, HOA, render losses)
  no_temporal num_adj=0         -> single-frame graph (delta = the
              extra temporal frame's backbone+VT)

Usage: python tools_tpu/step_variants.py [--steps 10] [--batch-size 2]
Writes STEP_VARIANTS_r05.json at the repo root.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def time_variant(name: str, cfg, steps: int):
    import jax
    from ocrfdet_tpu.data.synthetic import make_batch
    from ocrfdet_tpu.models.detector import OcRFDet
    from ocrfdet_tpu.parallel.mesh import make_mesh
    from ocrfdet_tpu.parallel.step import build_train_step
    from ocrfdet_tpu.train.optim import create_train_state, make_optimizer
    from ocrfdet_tpu.utils.fast_init import fast_init
    from ocrfdet_tpu.utils.runtime import shard_batch, shard_state

    t_init = time.perf_counter()
    variables, model = fast_init(cfg, OcRFDet, train=True)
    tx = make_optimizer(cfg.optim, variables["params"],
                        steps_per_epoch=1000)
    mesh = make_mesh(data=jax.device_count(), space=1)
    state = shard_state(mesh, create_train_state(variables, tx))
    batch = shard_batch(mesh, make_batch(cfg, batch_size=cfg.batch_size,
                                         seed=0))
    step_fn = build_train_step(cfg, model, tx, mesh)
    compiled = step_fn.lower(state, batch).compile()
    state, metrics = compiled(state, batch)
    jax.block_until_ready(metrics["loss_total"])
    sync = os.environ.get("OCRF_SYNC_STEPS") == "1"
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, batch)
        if sync:
            # force a host readback every step: the tunnelled runtime
            # has been seen reporting buffers ready before execution
            # finishes, which lets a chained loop under-measure
            float(metrics["loss_total"])
    if not sync:
        jax.block_until_ready(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / steps
    flops = float("nan")
    try:
        flops = float(compiled.cost_analysis().get("flops", float("nan")))
    except Exception:  # noqa: BLE001
        pass
    print(f"[{name}] {dt * 1e3:.1f} ms/step "
          f"({flops / 1e12:.2f} TFLOP, setup "
          f"{time.perf_counter() - t_init - dt * steps:.0f}s)",
          flush=True)
    return dict(ms_per_step=round(dt * 1e3, 1),
                tflops=round(flops / 1e12, 3),
                loss=float(metrics["loss_total"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--variants", default="full,no_stereo,no_ocrf")
    ap.add_argument("--out", default="STEP_VARIANTS_r05.json")
    args = ap.parse_args()

    from ocrfdet_tpu.config import ocrfdet_config
    from ocrfdet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    results = {}
    for name in args.variants.split(","):
        cfg = ocrfdet_config(batch_size=args.batch_size)
        if name == "no_stereo":
            cfg = dataclasses.replace(cfg, use_stereo=False)
        elif name == "no_ocrf":
            cfg = ocrfdet_config(batch_size=args.batch_size,
                                 with_ocrf=False)
        elif name == "no_temporal":
            cfg = dataclasses.replace(cfg, num_adj=0)
        elif name.startswith("ablate_"):
            # profiling-only sub-block ablations inside the OcRF VT
            # (config.py ViewTransformerConfig.ablate)
            cfg = dataclasses.replace(
                cfg, vt=dataclasses.replace(
                    cfg.vt, ablate=tuple(name[len("ablate_"):]
                                         .split("+"))))
        results[name] = time_variant(name, cfg, args.steps)

    if "full" in results:
        base = results["full"]["ms_per_step"]
        for k, v in results.items():
            if k != "full":
                v["delta_ms_vs_full"] = round(base - v["ms_per_step"], 1)
    out_path = os.path.join(os.path.dirname(__file__), "..", args.out)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
