"""Profile the flagship train step on the attached TPU.

Runs the jitted OcRFDet train step under jax.profiler.trace and
aggregates device-side op durations from the resulting xplane proto,
printing the top ops and per-fusion-category totals so optimization
effort goes where the time is.

Usage: python tools_tpu/profile_step.py [--steps 2] [--batch-size 2]
                                        [--no-ocrf] [--fwd-only]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _to_jnp(batch):
    import jax.numpy as jnp
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()}


def build_step(batch_size: int, with_ocrf: bool, fwd_only: bool):
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
    variables, model = fast_init(cfg, OcRFDet, train=not fwd_only)
    if fwd_only:
        batch = _to_jnp(make_batch(cfg, batch_size=batch_size, seed=0))
        fwd = jax.jit(lambda b: model.apply(variables, b, train=False))
        return fwd, None, batch
    tx = make_optimizer(cfg.optim, variables["params"],
                        steps_per_epoch=1000)
    mesh = make_mesh(data=jax.device_count(), space=1)
    state = shard_state(mesh, create_train_state(variables, tx))
    batch = shard_batch(mesh, make_batch(cfg, batch_size=batch_size,
                                         seed=0))
    step_fn = build_train_step(cfg, model, tx, mesh)
    return step_fn, state, batch


def parse_trace(logdir: str, topn: int = 40):
    """Aggregate device op durations from the Chrome trace json."""
    import gzip
    import json

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # identify device pids/tids: process_name metadata mentions TPU
    dev_pids = set()
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm:
                dev_pids.add(ev["pid"])
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = (
                ev.get("args", {}).get("name", ""))

    per_op = collections.Counter()      # name -> us (self time)
    per_cat = collections.Counter()
    total_us = 0.0
    op_tids = {k for k, v in tid_names.items() if v == "XLA Ops"}
    by_tid = collections.defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        by_tid[(ev["pid"], ev["tid"])].append(ev)
    # shard_map/jit introduce NESTED call events (e.g. jvp_Model_ spans
    # containing the real ops); summing raw durations double-counts
    # parents. Compute SELF time per event with an interval stack.
    for evs in by_tid.values():
        evs.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0))))
        stack = []  # (end_ts, child_total_accum index into list)
        child_tot = []
        for ev in evs:
            ts = float(ev["ts"])
            dur = float(ev.get("dur", 0.0))
            while stack and ts >= stack[-1][0] - 1e-9:
                end, name_, dur_, idx = stack.pop()
                self_us = max(0.0, dur_ - child_tot[idx])
                per_op[name_] += self_us
                per_cat[categorize(name_)] += self_us
                total_us += self_us
                if stack:
                    child_tot[stack[-1][3]] += dur_
            stack.append((ts + dur, ev.get("name", "?"), dur,
                          len(child_tot)))
            child_tot.append(0.0)
        while stack:
            end, name_, dur_, idx = stack.pop()
            self_us = max(0.0, dur_ - child_tot[idx])
            per_op[name_] += self_us
            per_cat[categorize(name_)] += self_us
            total_us += self_us
            if stack:
                child_tot[stack[-1][3]] += dur_
    if not per_op:
        seen = sorted({v for v in tid_names.values()})
        print("no 'XLA Ops' thread found; thread names were:", seen[:20])
        return
    print(f"\n== total device op time: {total_us/1e3:.1f} ms ==")
    print("\n-- by category --")
    for cat, us in per_cat.most_common():
        print(f"{us/1e3:10.2f} ms  {100*us/total_us:5.1f}%  {cat}")
    print(f"\n-- top {topn} ops --")
    for name, us in per_op.most_common(topn):
        print(f"{us/1e3:10.2f} ms  {100*us/total_us:5.1f}%  {name[:110]}")


CAT_PATTERNS = [
    ("conv", r"convolution|conv_general"),
    ("matmul/dot", r"dot|einsum"),
    ("sort/top_k", r"sort|top-k|top_k|topk"),
    ("scatter", r"scatter"),
    ("gather", r"gather|dynamic-slice|dynamic_slice"),
    ("cumsum/scan/while", r"cumsum|while|scan"),
    ("pallas", r"pallas|custom-call|tpu_custom_call"),
    ("reduce", r"reduce"),
    ("copy/transpose", r"copy|transpose|reshape|bitcast"),
    ("fusion(elementwise)", r"fusion"),
]


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in CAT_PATTERNS:
        if re.search(pat, low):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--no-ocrf", action="store_true")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--logdir", default="")
    ap.add_argument("--topn", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true",
                    help="only parse an existing --logdir")
    args = ap.parse_args()

    logdir = args.logdir or tempfile.mkdtemp(prefix="ocrf_prof_")
    if not args.parse_only:
        import jax
        step_fn, state, batch = build_step(
            args.batch_size, with_ocrf=not args.no_ocrf,
            fwd_only=args.fwd_only)
        # compile + warmup outside the trace
        if args.fwd_only:
            out = step_fn(batch)
            jax.block_until_ready(out)
            with jax.profiler.trace(logdir):
                for _ in range(args.steps):
                    out = step_fn(batch)
                jax.block_until_ready(out)
        else:
            state2, m = step_fn(state, batch)
            jax.block_until_ready(m["loss_total"])
            with jax.profiler.trace(logdir):
                for _ in range(args.steps):
                    state2, m = step_fn(state2, batch)
                jax.block_until_ready(m["loss_total"])
        print("trace written to", logdir)
    parse_trace(logdir, args.topn)


if __name__ == "__main__":
    main()
