"""Sharded train / eval steps (shard_map over the device mesh).

The train step is the whole reference iteration fused into one compiled
program: forward (all frames), every loss, backward, gradient psum over
`data` (== DDP all-reduce), AdamW update, EMA update. Cross-replica
loss normalisers use lax.pmean exactly where the reference calls
reduce_mean (centerpoint_head.py:608,636).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import OcRFDetConfig
from ..train.optim import TrainState, ema_update
from ..train.trainstep import compute_losses, total_loss


def _pmean_both(tree):
    """pmean over ('data', 'space') regardless of each leaf's current
    varying-axes state (jax's vma typing rejects reducing an axis a
    value is invariant to; pvary the missing axes first)."""
    def one(x):
        t = jax.typeof(x)
        vma = getattr(t, "vma", frozenset())
        missing = tuple(a for a in ("data", "space") if a not in vma)
        if missing:
            x = jax.lax.pvary(x, missing)
        return jax.lax.pmean(x, ("data", "space"))
    return jax.tree.map(one, tree)


def build_train_step(cfg: OcRFDetConfig, model, tx,
                     mesh: Mesh) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics); batch
    arrays are sharded on their leading axis over `data`."""

    def local_step(state: TrainState, batch):
        # per-step, per-shard dropout key (reference ASPP Dropout(0.5))
        drop_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(17), state.step),
            jax.lax.axis_index("data") * 1024
            + jax.lax.axis_index("space"))

        def loss_fn(params):
            (preds, aux), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_key})
            mean_fn = lambda x: jax.lax.pmean(x, "data")
            losses = compute_losses(cfg, preds, aux, batch,
                                    mean_fn=mean_fn)
            return total_loss(losses), (losses, mut["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # pmean over BOTH axes: with cameras sharded over `space`, the
        # all_gather transpose (psum_scatter) leaves each space shard
        # holding S x (its cameras' grad); the space-mean restores the
        # exact full-camera sum, and for replicated params it is a
        # no-op. (See models/detector.py image_encoder.)
        grads = _pmean_both(grads)
        # average BN running stats across shards (the state is
        # replicated, so per-device stats like plain DDP-BN are not
        # representable; cross-shard averaging is the consistent choice)
        new_stats = _pmean_both(new_stats)
        loss = _pmean_both(loss)
        losses = _pmean_both(losses)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        new_ema_p = ema_update(cfg.optim, state.ema_params, new_params,
                               state.step)
        new_ema_s = ema_update(cfg.optim, state.ema_batch_stats, new_stats,
                               state.step)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
            ema_params=new_ema_p, ema_batch_stats=new_ema_s)
        metrics = dict(losses, loss_total=loss)
        return new_state, metrics

    rep = P()
    dp = P("data")

    def batch_specs(batch):
        return jax.tree.map(
            lambda v: rep if getattr(v, "ndim", 0) == 0 else dp, batch)

    def train_step(state, batch):
        sharded = shard_map(
            local_step, mesh=mesh,
            in_specs=(rep, batch_specs(batch)),
            out_specs=(rep, rep))
        return sharded(state, batch)

    # donate the (large) state so the update happens in place instead
    # of copying ~GBs of params/opt/EMA every step
    return jax.jit(train_step, donate_argnums=0)


def build_eval_step(cfg: OcRFDetConfig, model, mesh: Mesh) -> Callable:
    """Eval forward (EMA weights) + in-jit decode, sharded over data."""
    from ..core.coder import decode_all_tasks

    def local_eval(params, batch_stats, batch):
        preds, _aux = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False)
        decoded = decode_all_tasks(preds, cfg.head, cfg.grid)
        return [d._asdict() for d in decoded]

    rep = P()
    dp = P("data")

    def eval_step(state: TrainState, batch):
        specs = jax.tree.map(
            lambda v: rep if getattr(v, "ndim", 0) == 0 else dp, batch)
        fn = shard_map(
            local_eval, mesh=mesh,
            in_specs=(rep, rep, specs),
            out_specs=dp)
        return fn(state.ema_params, state.ema_batch_stats, batch)

    return jax.jit(eval_step)
