"""Flagship-scale compile/memory probes on the real chip.

Evidence tools for the two graphs nothing else exercises at full
shapes (VERDICT r3 Missing #4/#5):

  --frames8   the 8-frame test-set variant (num_adj=7 -> a 9-frame
              graph; reference multi_adj_frame_id_cfg=(1,8,1),
              README.md:46-47, BEVDet4D.prepare_inputs
              bevdet.py:412-476)
  --geoenh    GeoEnhDet with the flagship ViT-L/24+24-block VGGT
              teacher at 294x518 (reference detectors/bevdet_vggt.py:
              81-98, ocrfdet_vggt.py:243-268; random weights — the
              released VGGT-1B ckpt is not available in this env)
  --teacher   the frozen Aggregator teacher forward ALONE at flagship
              shapes (what bevdet_vggt.py:92-98 runs under no_grad)

Each probe AOT-lowers + compiles the full train step (or teacher
forward), records compile time and the executable's memory analysis,
then executes one step and records its wall time and loss. Output:
one JSON object per probe, merged into the artifact file (--out).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _mem_gb(compiled):
    try:
        ma = compiled.memory_analysis()
        return {
            "argument_gb": round(ma.argument_size_in_bytes / 2**30, 3),
            "output_gb": round(ma.output_size_in_bytes / 2**30, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "code_gb": round(
                ma.generated_code_size_in_bytes / 2**30, 3),
            "total_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes
                 + ma.generated_code_size_in_bytes) / 2**30, 3),
        }
    except Exception as e:  # noqa: BLE001 - backend-dependent API
        return {"error": repr(e)}


def _probe_train_step(cfg, model_cls, batch_size, execute=True):
    import jax
    from ocrfdet_tpu.data.synthetic import make_batch
    from ocrfdet_tpu.parallel.mesh import make_mesh
    from ocrfdet_tpu.parallel.step import build_train_step
    from ocrfdet_tpu.train.optim import create_train_state, make_optimizer
    from ocrfdet_tpu.utils.fast_init import fast_init
    from ocrfdet_tpu.utils.runtime import (enable_compilation_cache,
                                           shard_batch, shard_state)

    enable_compilation_cache()
    t0 = time.perf_counter()
    variables, model = fast_init(cfg, model_cls, train=True)
    t_init = time.perf_counter() - t0
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    tx = make_optimizer(cfg.optim, variables["params"],
                        steps_per_epoch=1000)
    mesh = make_mesh(data=jax.device_count(), space=1)
    state = shard_state(mesh, create_train_state(variables, tx))
    batch = shard_batch(mesh, make_batch(cfg, batch_size=batch_size,
                                         seed=0))
    step_fn = build_train_step(cfg, model, tx, mesh)

    t0 = time.perf_counter()
    lowered = step_fn.lower(state, batch)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    out = {
        "params_m": round(n_params / 1e6, 2),
        "batch_size": batch_size,
        "t_init_s": round(t_init, 1),
        "t_lower_s": round(t_lower, 1),
        "t_compile_s": round(t_compile, 1),
        "memory": _mem_gb(compiled),
        "device": jax.devices()[0].device_kind,
    }
    if execute:
        t0 = time.perf_counter()
        state, metrics = compiled(state, batch)
        jax.block_until_ready(metrics["loss_total"])
        out["t_step1_s"] = round(time.perf_counter() - t0, 2)
        # steps are chained through `state`, so a 5-step loop executes
        # serially; the loop average is robust to the tunnel's
        # premature block_until_ready on single dispatches
        t0 = time.perf_counter()
        for _ in range(5):
            state, metrics = compiled(state, batch)
        jax.block_until_ready(metrics["loss_total"])
        out["t_step_avg5_s"] = round((time.perf_counter() - t0) / 5, 3)
        out["loss"] = round(float(metrics["loss_total"]), 4)
        out["losses"] = {k: round(float(v), 4)
                         for k, v in metrics.items() if k != "loss_total"}
    return out


def probe_frames8(batch_size: int, execute: bool):
    from ocrfdet_tpu.config import ocrfdet_8f_config
    from ocrfdet_tpu.models.detector import OcRFDet
    cfg = ocrfdet_8f_config(batch_size=batch_size)
    assert cfg.total_frames == 9
    return _probe_train_step(cfg, OcRFDet, batch_size, execute)


def probe_geoenh(batch_size: int, execute: bool):
    from ocrfdet_tpu.config import geoenh_config
    from ocrfdet_tpu.models.geoenh import GeoEnhDet
    cfg = geoenh_config(batch_size=batch_size)
    return _probe_train_step(cfg, GeoEnhDet, batch_size, execute)


def probe_teacher(batch_size: int, execute: bool):
    """Frozen flagship Aggregator forward alone: 2 views at 294x518."""
    import jax
    import jax.numpy as jnp
    from ocrfdet_tpu.config import geoenh_config
    from ocrfdet_tpu.models.vggt import Aggregator

    cfg = geoenh_config().vggt_teacher
    model = Aggregator(
        patch_size=cfg.patch_size, embed_dim=cfg.embed_dim,
        depth=cfg.depth, num_heads=cfg.num_heads,
        patch_embed=cfg.patch_embed, vit_depth=cfg.vit_depth,
        vit_native_grid=cfg.vit_native_grid, dtype=jnp.bfloat16)
    th, tw = cfg.image_size
    imgs = jnp.zeros((batch_size, 2, th, tw, 3), jnp.bfloat16)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)
    jax.block_until_ready(variables)
    t_init = time.perf_counter() - t0
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    t0 = time.perf_counter()
    lowered = fwd.lower(variables, imgs)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    out = {
        "params_m": round(n_params / 1e6, 2),
        "batch_size": batch_size,
        "image_size": list(cfg.image_size),
        "t_init_s": round(t_init, 1),
        "t_lower_s": round(t_lower, 1),
        "t_compile_s": round(t_compile, 1),
        "memory": _mem_gb(compiled),
        "device": jax.devices()[0].device_kind,
    }
    if execute:
        tokens, p0 = compiled(variables, imgs)
        jax.block_until_ready(tokens)
        # chain iterations through the input so the 10 forwards
        # serialise on device (single dispatches block prematurely
        # through the tunnel)
        x = imgs
        t0 = time.perf_counter()
        for _ in range(10):
            tokens, p0 = compiled(variables, x)
            x = x + 0.0 * tokens[0, 0, 0, 0].astype(x.dtype)
        jax.block_until_ready(tokens)
        out["t_fwd_s"] = round((time.perf_counter() - t0) / 10, 3)
        out["tokens_shape"] = list(tokens.shape)
        out["finite"] = bool(jnp.isfinite(
            tokens.astype(jnp.float32)).all())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames8", action="store_true")
    ap.add_argument("--geoenh", action="store_true")
    ap.add_argument("--teacher", action="store_true")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--no-exec", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    results = {}
    if args.teacher:
        results["teacher_294x518"] = probe_teacher(
            args.batch, not args.no_exec)
        print(json.dumps({"teacher": results["teacher_294x518"]}))
    if args.frames8:
        results["frames8"] = probe_frames8(args.batch, not args.no_exec)
        print(json.dumps({"frames8": results["frames8"]}))
    if args.geoenh:
        results["geoenh"] = probe_geoenh(args.batch, not args.no_exec)
        print(json.dumps({"geoenh": results["geoenh"]}))

    if args.out:
        try:
            with open(args.out) as f:
                prev = json.load(f)
        except Exception:  # noqa: BLE001
            prev = {}
        prev.update(results)
        with open(args.out, "w") as f:
            json.dump(prev, f, indent=1)


if __name__ == "__main__":
    main()
