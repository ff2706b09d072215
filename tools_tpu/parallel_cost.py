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


def collective_bytes(compiled) -> dict:
    """Sum the output bytes of cross-device collectives in the
    compiled HLO, by op kind — the program's ICI traffic (one full
    copy per op execution; overlapping/multi-round costs are runtime
    properties this static count does not model)."""
    import re
    sizes = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0,
             "collective-permute": 0}
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8}
    try:
        txt = compiled.as_text()
    except Exception:  # noqa: BLE001
        return {}
    pat = re.compile(
        r"=\s+(?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*)\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)")
    for m in pat.finditer(txt):
        kind = m.group(4)
        shapes = []
        if m.group(1) is not None:
            for s in m.group(1).split(","):
                sm = re.match(r"\s*(\w+)\[([\d,]*)\]", s)
                if sm:
                    shapes.append((sm.group(1), sm.group(2)))
        else:
            shapes.append((m.group(2), m.group(3)))
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            sizes[kind] += n * dt_bytes.get(dt, 4)
    sizes["total_mb"] = round(sum(
        v for k, v in sizes.items() if k != "total_mb") / 2**20, 2)
    return sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--variants", type=str,
                    default="replicated,phase2,phase3")
    ap.add_argument("--data", type=int, default=1)
    ap.add_argument("--space", type=int, default=2)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.data * args.space)

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
    S = args.space
    mesh = make_mesh(data=args.data, space=S,
                     devices=jax.devices()[:args.data * S])

    def variant_cfg(name):
        cfg = ocrfdet_config(batch_size=max(1, args.data))
        p2 = name in ("phase2", "phase3")
        p3 = name in ("phase3", "phase3rows")
        # camera sharding needs the camera count to divide: at S=4 the
        # 6-camera flagship runs rows/render-only phase 3
        if cfg.data.num_cams % S:
            p2 = False
        return dataclasses.replace(
            cfg, parallel=dataclasses.replace(
                cfg.parallel, space_axis=S,
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
        batch = shard_batch(mesh, make_batch(
            cfg, batch_size=max(1, args.data), seed=0))
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
            "collective_bytes": collective_bytes(compiled),
        }
        print(json.dumps({name: results[name]}), flush=True)
        if args.out:
            # incremental dump: a killed run still leaves its partial
            # evidence on disk
            with open(args.out, "w") as f:
                json.dump({"mesh": f"d{args.data}xs{args.space} "
                                   "(flagship shapes)",
                           "variants": results}, f, indent=1)

    if len(results) > 1 and "phase3" in results:
        base = results.get("phase2") or results.get("replicated")
        results["phase3_vs_prev_flop_ratio"] = round(
            results["phase3"]["flops_per_device_t"]
            / base["flops_per_device_t"], 4)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"mesh": f"d{args.data}xs{args.space} "
                               "(flagship shapes)",
                       "variants": results}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
