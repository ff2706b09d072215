"""Multi-host (multi-process) helpers.

The reference's multi-process story is torch.distributed: per-rank
DistributedSampler shards the dataset (apis/train.py:208-220), DDP
all-reduces grads, and eval results are gathered to rank 0
(tools/test.py multi_gpu_test). The TPU-native equivalents here:

  * data: each process loads only its slice of every global batch
    (`Loader(process_index=, process_count=)`) and
    `utils.runtime.shard_batch` assembles the global jax.Array from
    process-local shards via `jax.make_array_from_process_local_data`.
  * eval gather: `gather_objects` ships arbitrary picklable host
    objects (per-process DetectionEvaluator state, result JSON dicts)
    across processes over the ICI/DCN collectives
    (process_allgather on padded byte arrays) — the analog of
    mmdet's collect_results_cpu.

Everything degrades to a no-op at process_count == 1 so the same code
path runs single-host (and is unit-testable without a cluster).
"""
from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def gather_objects(obj: Any) -> List[Any]:
    """All-gather one picklable host object per process; returns the
    list ordered by process index (identical on every process)."""
    n = process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils as mh

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # first round: lengths, so every process can pad to the max
    lens = mh.process_allgather(
        np.asarray([payload.size], dtype=np.int64))
    lens = np.asarray(lens).reshape(-1)
    maxlen = int(lens.max())
    padded = np.zeros((maxlen,), dtype=np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(mh.process_allgather(padded))
    gathered = gathered.reshape(n, maxlen)
    return [pickle.loads(gathered[i, :int(lens[i])].tobytes())
            for i in range(n)]


def merge_eval_results(evaluator, results_json: dict):
    """Gather per-process evaluator shards + result JSON dicts and
    merge them into process-0's view (returned on every process)."""
    parts = gather_objects((evaluator, results_json))
    merged_eval, merged_json = parts[0]
    for ev, rj in parts[1:]:
        merged_eval.merge(ev)
        merged_json.update(rj)
    return merged_eval, merged_json
