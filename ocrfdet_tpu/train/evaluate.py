"""Evaluation runner: eval forward + decode (device) -> Scale-NMS
(host) -> native metrics + devkit-compatible JSON.

Mirrors tools/test.py + CenterHead.get_bboxes + NuScenesDataset
.evaluate in the reference, with evaluation running from the EMA
weights (the reference evaluates epoch_N_ema.pth)."""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OcRFDetConfig
from ..core.coder import decode_all_tasks
from ..core.eval_metrics import DetectionEvaluator
from ..core.nusc_format import boxes_to_nusc_sample, write_results_json
from ..ops.nms import multi_task_nms


def _device_batch(batch, with_prev: float = 1.0):
    out = {}
    for k, v in batch.items():
        if k in ("gt_boxes", "gt_labels", "sample_token"):
            continue
        out[k] = ([jnp.asarray(x) for x in v] if isinstance(v, list)
                  else jnp.asarray(v))
    out["with_prev"] = jnp.asarray(with_prev, dtype=jnp.float32)
    out["use_box_mask"] = jnp.asarray(0.0, dtype=jnp.float32)
    return out


def build_eval_forward(cfg: OcRFDetConfig, model):
    @jax.jit
    def fwd(params, batch_stats, batch):
        preds, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False)
        decoded = decode_all_tasks(preds, cfg.head, cfg.grid)
        return [d._asdict() for d in decoded]
    return fwd


def run_eval(cfg: OcRFDetConfig, model, params, batch_stats, loader,
             out_json: Optional[str] = None,
             max_batches: Optional[int] = None,
             token_to_pose: Optional[dict] = None,
             mesh=None, with_prev: float = 1.0) -> Dict[str, float]:
    """token_to_pose maps sample_token -> the key CAM_FRONT info dict
    (ego2global_* fields) for global-frame JSON output; identity pose
    is used when absent (native metrics are pose-independent).

    With `mesh`, the forward+decode runs sharded over the mesh's
    `data` axis (parallel/step.py:build_eval_step) and, in a
    multi-process run, per-process evaluator shards are gathered and
    merged (tools/test.py multi_gpu_test analog)."""
    if mesh is not None:
        from ..parallel.step import build_eval_step
        from ..utils.runtime import shard_batch
        sharded = build_eval_step(cfg, model, mesh)
        fwd = lambda p, bs, b: sharded(p, bs, shard_batch(mesh, b))
    else:
        fwd = build_eval_forward(cfg, model)
    evaluator = DetectionEvaluator(cfg.class_names)
    results_json = {}
    for bi, batch in enumerate(loader.epoch(0)):
        if max_batches is not None and bi >= max_batches:
            break
        dev = _device_batch(batch, with_prev) if mesh is None else {
            k: v for k, v in batch.items()
            if k not in ("gt_boxes", "gt_labels", "sample_token")}
        if mesh is not None:
            dev["with_prev"] = np.asarray(with_prev, dtype=np.float32)
            dev["use_box_mask"] = np.asarray(0.0, dtype=np.float32)
        decoded = fwd(params, batch_stats, dev)
        # local shard of the global decode (process-addressable rows)
        if mesh is not None and jax.process_count() > 1:
            # sort shards by their global row offset: iteration order
            # of addressable_shards is not a documented contract, and
            # rows must pair with this process's host batch order
            decoded = jax.tree.map(
                lambda x: np.concatenate([
                    s.data for s in sorted(
                        x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)]), decoded)
        decoded = jax.tree.map(np.asarray, decoded)
        B = batch["imgs"].shape[0]
        for b in range(B):
            task_results = [
                {k: v[b] for k, v in d.items()} for d in decoded]
            det = multi_task_nms(task_results, cfg.head)
            gt_boxes = batch["gt_boxes"][b]
            gt_labels = batch["gt_labels"][b]
            # evaluator compares gravity-centred z; det boxes are
            # bottom-centred after multi_task_nms
            det_g = det["boxes"].copy()
            if len(det_g):
                det_g[:, 2] += det_g[:, 5] * 0.5
            evaluator.add_sample(det_g, det["scores"], det["labels"],
                                 gt_boxes, gt_labels,
                                 token=str(batch["sample_token"][b]))
            if out_json is not None:
                tok = batch["sample_token"][b]
                pose = (token_to_pose or {}).get(tok, dict(
                    ego2global_rotation=[1, 0, 0, 0],
                    ego2global_translation=[0, 0, 0]))
                results_json[tok] = [
                    dict(r, sample_token=tok) for r in
                    boxes_to_nusc_sample(
                        det["boxes"], det["scores"], det["labels"],
                        cfg.class_names, pose)]
    if jax.process_count() > 1:
        from ..parallel.multihost import merge_eval_results
        evaluator, results_json = merge_eval_results(
            evaluator, results_json)
    metrics = evaluator.evaluate()
    if out_json is not None and jax.process_index() == 0:
        write_results_json(results_json, out_json)
    return metrics
