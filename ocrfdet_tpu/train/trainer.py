"""Training loop: epochs, hook-equivalents, checkpointing, logging.

Replaces mmcv's EpochBasedRunner + hook zoo (apis/train.py:252-321):
  * SequentialControlHook  -> with_prev = 0 for epochs < 2
    (core/hook/sequentialsontrol.py:9-40)
  * render-loss box masking after 2 epochs (view_transformer_ocrf.py
    get_loss iteration gate :1369-1381)
  * MEGVIIEMAHook          -> EMA inside the train step; checkpoints
    save both raw and EMA weights
  * CheckpointHook         -> orbax checkpoint per epoch with resume
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OcRFDetConfig
from ..models.detector import OcRFDet
from ..parallel.mesh import make_mesh
from ..parallel.step import build_train_step
from ..utils.runtime import (enable_compilation_cache, shard_batch,
                             shard_state)
from .optim import TrainState, create_train_state, make_optimizer


# loader outputs that never go to device (host-side decode/eval only);
# shared with bench.py so the two filters cannot drift
HOST_ONLY_KEYS = ("gt_boxes", "gt_labels", "sample_token")


def device_batch(mesh, batch: Dict[str, np.ndarray], with_prev: float,
                 use_box_mask: float):
    """Strip host-only entries, attach the epoch-gate scalars, and
    shard onto the mesh — the single batch-preparation path for the
    trainer, bench.py and the throughput probe."""
    out = {k: v for k, v in batch.items() if k not in HOST_ONLY_KEYS}
    out["with_prev"] = np.asarray(with_prev, dtype=np.float32)
    out["use_box_mask"] = np.asarray(use_box_mask, dtype=np.float32)
    return shard_batch(mesh, out)


_device_batch = device_batch  # back-compat alias


class Trainer:
    def __init__(self, cfg: OcRFDetConfig, work_dir: str,
                 steps_per_epoch: int):
        self.cfg = cfg
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        enable_compilation_cache()
        self.model_cls = OcRFDet
        if cfg.vggt_teacher is not None:
            from ..models.geoenh import GeoEnhDet
            self.model_cls = GeoEnhDet
        self.model = self.model_cls(cfg)
        space = cfg.parallel.space_axis
        data = min(jax.device_count() // space, cfg.batch_size)
        n_dev = data * space
        self.mesh = make_mesh(data=data, space=space,
                              devices=jax.devices()[:n_dev])
        self.steps_per_epoch = steps_per_epoch
        self.tx = None
        self.state: Optional[TrainState] = None
        self.step_fn = None

    def init_state(self, example_batch: Optional[Dict[str, np.ndarray]]
                   = None):
        from ..utils.fast_init import fast_init
        variables, self.model = fast_init(
            self.cfg, self.model_cls, rng_seed=self.cfg.seed, train=True)
        tcfg = self.cfg.vggt_teacher
        if tcfg is not None and tcfg.ckpt_path:
            # graft the released VGGT-1B weights onto the frozen
            # teacher (reference loads a combined r50+vggt checkpoint,
            # tools/combine_res50_vggt.py + bevdet_vggt.py:81-98)
            from ..models.vggt import load_torch_weights
            params = dict(variables["params"])
            params["aggregator"] = load_torch_weights(
                params["aggregator"], tcfg.ckpt_path)
            variables = dict(variables, params=params)
            print(f"loaded VGGT teacher weights from {tcfg.ckpt_path}")
        self.tx = make_optimizer(self.cfg.optim, variables["params"],
                                 self.steps_per_epoch)
        # commit to the mesh up front: a donated step returns state with
        # the mesh's NamedSharding, and jit keys its cache on input
        # shardings — an uncommitted first state would force a second
        # full compile on step 2.
        self.state = shard_state(self.mesh,
                                 create_train_state(variables, self.tx))
        self.step_fn = build_train_step(self.cfg, self.model, self.tx,
                                        self.mesh)
        n_params = sum(x.size for x in
                       jax.tree.leaves(variables["params"]))
        print(f"model parameters: {n_params / 1e6:.2f}M")

    # -------------------------------------------------- checkpointing
    def save(self, epoch: int):
        import orbax.checkpoint as ocp
        path = os.path.abspath(
            os.path.join(self.work_dir, f"ckpt_epoch_{epoch}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state._asdict(), force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(self.work_dir, "latest.json"), "w") as f:
            json.dump({"epoch": epoch, "path": path}, f)

    def resume(self) -> int:
        import orbax.checkpoint as ocp
        latest = os.path.join(self.work_dir, "latest.json")
        if not os.path.exists(latest):
            return 0
        with open(latest) as f:
            meta = json.load(f)
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(meta["path"], self.state._asdict())
        self.state = shard_state(self.mesh, TrainState(**restored))
        return meta["epoch"] + 1

    # -------------------------------------------------------- running
    def epoch_flags(self, epoch: int):
        with_prev = 0.0 if epoch < self.cfg.optim.temporal_start_epoch \
            else 1.0
        use_box_mask = 1.0 if epoch >= 2 else 0.0
        return with_prev, use_box_mask

    def run_epoch(self, loader, epoch: int, log_every: int = 50,
                  max_steps: Optional[int] = None):
        with_prev, use_box_mask = self.epoch_flags(epoch)
        t0 = time.time()
        n = 0
        log_path = os.path.join(self.work_dir, "metrics.jsonl")
        for i, batch in enumerate(loader.epoch(epoch)):
            if max_steps is not None and i >= max_steps:
                break
            dev_batch = _device_batch(self.mesh, batch, with_prev,
                                      use_box_mask)
            self.state, metrics = self.step_fn(self.state, dev_batch)
            n += 1
            if i % log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                fps = n * self.cfg.batch_size / max(dt, 1e-9)
                parts = " ".join(
                    f"{k}={v:.3f}" for k, v in sorted(vals.items())
                    if k.startswith("loss"))
                print(f"epoch {epoch} iter {i}: {parts} "
                      f"({fps:.2f} frames/s)", flush=True)
                with open(log_path, "a") as f:
                    f.write(json.dumps(dict(
                        epoch=epoch, iter=i, frames_per_s=fps,
                        **vals)) + "\n")
        return n

    def fit(self, loader, start_epoch: int = 0,
            max_steps_per_epoch: Optional[int] = None):
        for epoch in range(start_epoch, self.cfg.optim.max_epochs):
            self.run_epoch(loader, epoch,
                           max_steps=max_steps_per_epoch)
            self.save(epoch)
