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


def zero_sharding(mesh: Mesh, tree):
    """ZeRO-style NamedShardings for optimizer/EMA trees: each leaf is
    split over `data` along its first axis divisible by the axis size,
    replicated otherwise (SURVEY §2.7: optimizer state sharded via
    NamedSharding — the reference keeps full per-rank copies under
    DDP; sharding the 3x-params update state is pure HBM savings)."""
    n = mesh.shape["data"] * mesh.shape["space"]

    def spec(x):
        shape = getattr(x, "shape", ())
        for i, d in enumerate(shape):
            if d >= n and d % n == 0:
                return NamedSharding(
                    mesh, P(*([None] * i + [("data", "space")])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, tree)


def build_train_step(cfg: OcRFDetConfig, model, tx,
                     mesh: Mesh) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics); batch
    arrays are sharded on their leading axis over `data`.

    Layout: forward/backward run under shard_map (explicit psum/pmean
    exactly at the reference's DDP/reduce_mean points); the optimizer +
    EMA update runs OUTSIDE shard_map under plain GSPMD, so opt_state
    and both EMA trees can live ZeRO-sharded over the mesh
    (`zero_sharding`) — each device updates only its slice of the
    m/v/EMA tensors and the fresh params are re-gathered once."""

    def local_grads(params, batch_stats, step, batch):
        # per-step, per-shard dropout key (reference ASPP Dropout(0.5))
        drop_key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(17), step),
            jax.lax.axis_index("data") * 1024
            + jax.lax.axis_index("space"))

        def loss_fn(params):
            (preds, aux), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_key})
            mean_fn = lambda x: jax.lax.pmean(x, "data")
            losses = compute_losses(cfg, preds, aux, batch,
                                    mean_fn=mean_fn)
            return total_loss(losses), (losses, mut["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
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
        return grads, new_stats, loss, losses

    rep = P()
    dp = P("data")

    def batch_specs(batch):
        return jax.tree.map(
            lambda v: rep if getattr(v, "ndim", 0) == 0 else dp, batch)

    def train_step(state: TrainState, batch):
        grads, new_stats, loss, losses = shard_map(
            local_grads, mesh=mesh,
            in_specs=(rep, rep, rep, batch_specs(batch)),
            out_specs=(rep, rep, rep, rep))(
                state.params, state.batch_stats, state.step, batch)
        # non-finite guard (the mmcv Fp16OptimizerHook skip-step
        # analog): a degenerate sample (e.g. a near-singular projected
        # gaussian) can emit inf/nan grads; applying them poisons
        # params forever. Gate the WHOLE update — params, BN stats,
        # opt state, EMA, step — on every gradient and the loss being
        # finite, so a bad batch costs one skipped step instead of the
        # run. The gate is traced (no host sync); the skip count is
        # reported per step in the metrics.
        gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                   for g in jax.tree.leaves(grads))
        ok = jnp.isfinite(loss) & jnp.isfinite(gsum)
        okf = ok.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        # ZeRO region: inputs state.opt_state / ema trees carry their
        # sharded layout; GSPMD partitions the elementwise update ops
        # to match, and the `updates` added to the replicated params
        # are all-gathered once.
        constrain = lambda t: jax.lax.with_sharding_constraint(
            t, zero_sharding(mesh, t))
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.params)
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o),
            constrain(new_opt), state.opt_state)
        new_params = jax.tree.map(
            lambda p, u: p + jnp.where(ok, u, jnp.zeros_like(u))
            .astype(p.dtype), state.params, updates)
        new_stats = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_stats,
            state.batch_stats)
        new_ema_p = constrain(ema_update(
            cfg.optim, state.ema_params, new_params, state.step))
        new_ema_s = constrain(ema_update(
            cfg.optim, state.ema_batch_stats, new_stats, state.step))
        new_state = TrainState(
            step=state.step + okf.astype(state.step.dtype),
            params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
            ema_params=new_ema_p, ema_batch_stats=new_ema_s)
        return new_state, dict(losses, loss_total=loss,
                               skipped_nonfinite=1.0 - okf)

    # donate the (large) state so the update happens in place instead
    # of copying ~GBs of params/opt/EMA every step
    return jax.jit(train_step, donate_argnums=0)


def build_eval_step(cfg: OcRFDetConfig, model, mesh: Mesh) -> Callable:
    """Eval forward + in-jit decode, sharded over `data`: the
    multi-GPU-test analog (tools/test.py). Returned fn takes
    (params, batch_stats, batch); pass EMA trees to match the
    reference's epoch_N_ema.pth evaluation."""
    from ..core.coder import decode_all_tasks

    def local_eval(params, batch_stats, batch):
        preds, _aux = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False)
        decoded = decode_all_tasks(preds, cfg.head, cfg.grid)
        return [d._asdict() for d in decoded]

    rep = P()
    dp = P("data")

    def eval_step(params, batch_stats, batch):
        specs = jax.tree.map(
            lambda v: rep if getattr(v, "ndim", 0) == 0 else dp, batch)
        fn = shard_map(
            local_eval, mesh=mesh,
            in_specs=(rep, rep, specs),
            out_specs=dp)
        return fn(params, batch_stats, batch)

    return jax.jit(eval_step)


def eval_step_from_state(cfg: OcRFDetConfig, model, mesh: Mesh,
                         state: TrainState) -> Callable:
    from ..train.optim import resolve_ema
    fn = build_eval_step(cfg, model, mesh)
    return lambda batch: fn(
        resolve_ema(state.params, state.ema_params),
        resolve_ema(state.batch_stats, state.ema_batch_stats), batch)
