"""Benchmark: flagship OcRFDet train-step throughput on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY.md §6), so
vs_baseline is reported against this framework's own committed round-1
figure (BENCH_r01.json: 2.1367 frames/s at batch 2 on one v5e chip).

Two MFU figures are reported (VERDICT r3 Weak #2):
  * mfu_executed — XLA's compiled-step FLOPs / time / peak. Counts
    every FLOP the hardware executes, including arithmetic the Pallas
    kernels deliberately burn to stay off the gather path (the one-hot
    matmul cost volume trades ~50 TFLOP of MXU work for 16M gather
    descriptors).
  * mfu_model — model-math FLOPs / time / peak, where model FLOPs are
    taken from XLA cost analysis of the SAME train step lowered with
    the gather-based cost volume (cv_impl='scan', no burned matmul) —
    the honest utilization number.

Timing uses the AOT-compiled executable handle (lower().compile()),
not jit re-dispatch: at ~1 s steps the jit call path (signature match +
sharding checks, through a tunnelled runtime) costs 15-30% — the
executable is what a real trainer loop holds, so it is what we time.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

R01_FRAMES_PER_S = 2.1367   # committed round-1 baseline (BENCH_r01.json)

# bf16 peak matmul throughput per chip, by device_kind prefix
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,     # v5p
    "TPU v6": 918e12,     # v6e/trillium
}


def _peak_flops_per_s() -> float:
    import jax
    kind = jax.devices()[0].device_kind
    for prefix in sorted(_PEAK_FLOPS, key=len, reverse=True):
        if kind.startswith(prefix):
            return _PEAK_FLOPS[prefix]
    return 197e12


def _to_jnp(batch):
    import jax.numpy as jnp
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}


def bench_train(batch_size: int, steps: int, with_ocrf: bool):
    import jax
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
    cfg = ocrfdet_config(batch_size=batch_size, with_ocrf=with_ocrf)
    variables, model = fast_init(cfg, OcRFDet, train=True)
    tx = make_optimizer(cfg.optim, variables["params"],
                        steps_per_epoch=1000)
    mesh = make_mesh(data=jax.device_count(), space=1)
    state = shard_state(mesh, create_train_state(variables, tx))
    batch = shard_batch(mesh, make_batch(cfg, batch_size=batch_size,
                                         seed=0))
    step_fn = build_train_step(cfg, model, tx, mesh)

    # AOT-compile once and time the executable handle (see module
    # docstring: jit re-dispatch costs 15-30% at ~1 s steps)
    compiled = step_fn.lower(state, batch).compile()
    state, metrics = compiled(state, batch)         # warmup
    jax.block_until_ready(metrics["loss_total"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, batch)
    jax.block_until_ready(metrics["loss_total"])
    dt = time.perf_counter() - t0
    frames_per_s = batch_size * steps / dt

    mfu_exec = mfu_model = None
    step_flops = model_flops = float("nan")
    try:
        cost = compiled.cost_analysis()
        step_flops = float(cost.get("flops", float("nan")))
        mfu_exec = step_flops / (dt / steps) / _peak_flops_per_s()
    except Exception as e:  # noqa: BLE001 - cost analysis is best-effort
        print(f"bench: cost analysis unavailable: {e!r}", file=sys.stderr)
    try:
        # model-math FLOPs: the same step lowered with the gather cost
        # volume (no burned one-hot matmuls). lower() only traces; the
        # TPU runtime implements cost_analysis only on compiled
        # executables, so the lowering runs on a 1-device CPU mesh with
        # abstract shapes (FLOP counts are backend-independent).
        import dataclasses
        cfg_s = dataclasses.replace(
            cfg, vt=dataclasses.replace(
                cfg.vt, ht_impl="gather", sample_impl="gather",
                renderer="xla",
                depthnet=dataclasses.replace(
                    cfg.vt.depthnet, cv_impl="scan")))
        from ocrfdet_tpu.models.detector import OcRFDet as _M
        cpu = jax.local_devices(backend="cpu")
        mesh_cpu = make_mesh(data=1, space=1, devices=cpu[:1])
        step_s = build_train_step(cfg_s, _M(cfg_s), tx, mesh_cpu)
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (state, batch))
        cost_m = step_s.lower(*abstract).cost_analysis()
        model_flops = float(cost_m.get("flops", float("nan")))
        mfu_model = model_flops / (dt / steps) / _peak_flops_per_s()
    except Exception as e:  # noqa: BLE001
        print(f"bench: model-flops analysis unavailable: {e!r}",
              file=sys.stderr)
    return dict(frames_per_s=frames_per_s,
                loss=float(metrics["loss_total"]),
                mfu_executed=mfu_exec, mfu_model=mfu_model,
                step_tflops=step_flops / 1e12,
                model_tflops=model_flops / 1e12)


def bench_with_loader(batch_size: int, steps: int):
    """End-to-end throughput: real Loader (fake-nuScenes at real image
    sizes, thread-pool decode+aug) feeding the sharded train step —
    the analog of the reference tools/analysis_tools/benchmark.py
    which measures through its torch DataLoader."""
    import tempfile

    import jax
    from ocrfdet_tpu.config import ocrfdet_config
    from ocrfdet_tpu.data.dataset import Loader, NuScenesDataset
    from ocrfdet_tpu.data.fake_nuscenes import build_fake_nuscenes
    from ocrfdet_tpu.models.detector import OcRFDet
    from ocrfdet_tpu.parallel.mesh import make_mesh
    from ocrfdet_tpu.parallel.step import build_train_step
    from ocrfdet_tpu.train.optim import create_train_state, make_optimizer
    from ocrfdet_tpu.utils.fast_init import fast_init
    from ocrfdet_tpu.utils.runtime import (enable_compilation_cache,
                                           shard_batch, shard_state)

    enable_compilation_cache()
    cfg = ocrfdet_config(batch_size=batch_size)
    root = tempfile.mkdtemp(prefix="ocrf_benchdata_")
    pkl = build_fake_nuscenes(root, cfg, n_samples=4 * batch_size,
                              img_hw=(900, 1600))
    ds = NuScenesDataset(cfg, pkl, is_train=True, cbgs=False)
    loader = Loader(ds, batch_size, shuffle=True, num_workers=8,
                    prefetch=4)
    variables, model = fast_init(cfg, OcRFDet, train=True)
    tx = make_optimizer(cfg.optim, variables["params"],
                        steps_per_epoch=max(len(loader), 1))
    mesh = make_mesh(data=jax.device_count(), space=1)
    state = shard_state(mesh, create_train_state(variables, tx))
    step_fn = build_train_step(cfg, model, tx, mesh)

    from ocrfdet_tpu.train.trainer import device_batch

    def batches():
        # single shared batch-prep path (host-only filter + epoch
        # gates + sharding) — train/trainer.py device_batch
        ep = 0
        while True:
            for b in loader.epoch(ep):
                yield device_batch(mesh, b, with_prev=1.0,
                                   use_box_mask=0.0)
            ep += 1

    it = batches()
    state, m = step_fn(state, next(it))
    jax.block_until_ready(m["loss_total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, next(it))
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt, float(m["loss_total"])


def main():
    import os
    # XLA:CPU AOT cache loads log a benign per-executable ERROR about
    # pseudo machine features (+prefer-no-gather is added by the AOT
    # compiler but never reported by the host probe), flooding the
    # recorded artifact tail. glog's level is fixed when the jaxlib .so
    # loads, and this environment preloads jax at interpreter start
    # (site .pth), so the only reliable suppression is re-exec with the
    # env var set.
    if os.environ.get("TF_CPP_MIN_LOG_LEVEL") != "3":
        env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3")
        os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=0,
                    help="0 = auto (try 2 then 1)")
    ap.add_argument("--no-ocrf", action="store_true")
    ap.add_argument("--with-loader", action="store_true",
                    help="end-to-end: real Loader (decode+aug) feeding "
                         "the step instead of one resident batch")
    args = ap.parse_args()

    if args.with_loader:
        bs = args.batch_size or 2
        fps, loss = bench_with_loader(bs, args.steps)
        print(json.dumps({
            "metric": "ocrfdet_train_frames_per_s_e2e",
            "value": round(fps, 4), "unit": "frames/s",
            "vs_baseline": round(fps / R01_FRAMES_PER_S, 4),
            "batch_size": bs, "final_loss": round(loss, 4),
            "mode": "with_loader"}))
        return

    candidates = ([args.batch_size] if args.batch_size
                  else [2, 1])
    last_err = None
    for bs in candidates:
        try:
            r = bench_train(bs, args.steps, with_ocrf=not args.no_ocrf)
            fps = r["frames_per_s"]
            rec = {
                "metric": "ocrfdet_train_frames_per_s_per_chip",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / R01_FRAMES_PER_S, 4),
                "batch_size": bs,
                "steps": args.steps,
                "final_loss": round(r["loss"], 4),
                # kernel-level metric: one resident synthetic batch,
                # no input pipeline (run --with-loader for end-to-end)
                "mode": "resident_batch",
            }
            if r["mfu_executed"] is not None \
                    and np.isfinite(r["mfu_executed"]):
                rec["mfu_executed"] = round(r["mfu_executed"], 4)
                rec["step_tflops"] = round(r["step_tflops"], 3)
            if r["mfu_model"] is not None \
                    and np.isfinite(r["mfu_model"]):
                rec["mfu_model"] = round(r["mfu_model"], 4)
                rec["model_tflops"] = round(r["model_tflops"], 3)
            # the r01 baseline (2.1367 f/s) was measured with the
            # non-parity /16 stereo cost volume; the default has since
            # been restored to the reference-exact /4 (VERDICT #8),
            # which is ~3x more cost-volume work per step
            from ocrfdet_tpu.config import ocrfdet_config
            rec["cv_downsample"] = \
                ocrfdet_config().vt.depthnet.cv_downsample
            print(json.dumps(rec))
            return
        except Exception as e:  # noqa: BLE001 - fall back to smaller batch
            last_err = e
            print(f"bench: batch_size={bs} failed: {e!r}", file=sys.stderr)
    print(json.dumps({
        "metric": "ocrfdet_train_frames_per_s_per_chip",
        "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
        "error": str(last_err)[:200],
    }))


if __name__ == "__main__":
    main()
