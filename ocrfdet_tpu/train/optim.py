"""Optimizer, LR schedules and EMA.

Reproduces the reference training recipe (configs/ocrfdet/ocrfdet.py:
256-337 + mmcv hooks):
  * AdamW lr 2e-4, wd 1e-2, global-norm clip 5
  * linear warmup 400 iters from ratio 1e-3; step decay at epoch 20
    (i.e. constant afterwards for the 20-epoch run)
  * 2x lr for the render MLPs (paramwise_cfg custom_keys), decayed by
    1/2 every epoch on top (CustomLrUpdaterHook with gamma=1, step=1:
    core/hook/custom_lr_hook.py:8-47)
  * MEGVII EMA: decay 0.999 * (1 - exp(-updates/2000)), update counter
    pre-warmed by init_updates=10560 (core/hook/ema.py:17-135); EMA
    covers params AND batch-norm statistics, and evaluation uses the
    EMA copy.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig

# parameter path substrings that get the render-lr treatment
RENDER_LR_KEYS = (
    "S_MLP", "R_MLP", "A_MLP", "C_MLP", "C_MLP_nerf", "D_MLP_nerf",
    "sigma", "img_feat_resize1", "img_feat_resize2",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def is_render_param(path) -> bool:
    p = _path_str(path)
    return any(k in p for k in RENDER_LR_KEYS)


def is_frozen_param(path) -> bool:
    """The VGGT teacher is frozen (reference bevdet_vggt.py:86-90
    eval()+requires_grad False); its 909M params get a stateless
    set_to_zero() partition so Adam allocates no m/v for them (~7 GB
    of HBM at ViT-L scale) and weight decay never touches them. The
    match is anchored to the TOP-LEVEL module key so a future module
    merely containing the substring (e.g. 'bev_aggregator') is never
    silently frozen."""
    return len(path) > 0 and str(getattr(path[0], "key", path[0])) == \
        "aggregator"


def lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    def fn(step):
        warm = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * jnp.minimum(
            step / jnp.maximum(cfg.warmup_iters, 1), 1.0)
        return cfg.lr * warm
    return fn


def render_mult_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """Multiplier applied to render-MLP updates: lr_mult * decay^epoch."""
    def fn(step):
        epoch = jnp.floor(step / steps_per_epoch)
        return cfg.lr_mult_render * jnp.power(
            cfg.render_lr_decay_per_epoch, epoch)
    return fn


def make_optimizer(cfg: OptimConfig, params, steps_per_epoch: int):
    base_lr = lr_schedule(cfg, steps_per_epoch)
    mult = render_mult_schedule(cfg, steps_per_epoch)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: ("frozen" if is_frozen_param(path)
                         else "render" if is_render_param(path)
                         else "other"), params)

    def scaled_adamw(extra_mult):
        def lr(step):
            return base_lr(step) * extra_mult(step)
        return optax.adamw(learning_rate=lr, b1=0.9, b2=0.999,
                           weight_decay=cfg.weight_decay)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.partition(
            {"render": scaled_adamw(mult),
             "other": scaled_adamw(lambda s: 1.0),
             "frozen": optax.set_to_zero()},
            labels),
    )
    return tx


def ema_decay(cfg: OptimConfig, updates):
    """MEGVII ramped decay with pre-warmed counter."""
    u = updates + cfg.ema_init_updates
    return cfg.ema_decay * (1.0 - jnp.exp(-u / 2000.0))


def ema_init_tree(tree):
    """EMA copy of a variable tree — except frozen subtrees (the VGGT
    teacher), whose leaves get a scalar placeholder instead of a full
    f32 copy: EMA(frozen) == frozen forever, and materializing it
    costs ~3.6 GB of HBM at ViT-L scale (the difference between
    GeoEnhDet fitting batch 4 on a 16 GB chip or not). resolve_ema()
    substitutes the raw value back at eval time."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: (jnp.zeros((), jnp.float32) if is_frozen_param(p)
                      else jnp.array(x, jnp.float32, copy=True)), tree)


def ema_update(cfg: OptimConfig, ema_tree, new_tree, updates):
    d = ema_decay(cfg, updates)
    return jax.tree_util.tree_map_with_path(
        lambda path, e, p: (e if is_frozen_param(path)
                            else e * d + p.astype(e.dtype) * (1.0 - d)),
        ema_tree, new_tree)


def resolve_ema(raw_tree, ema_tree):
    """Full EMA tree for evaluation: frozen leaves (scalar
    placeholders in the stored EMA, see ema_init_tree) read from the
    raw tree — a frozen parameter IS its own EMA."""
    return jax.tree_util.tree_map_with_path(
        lambda path, raw, e: raw if is_frozen_param(path) else e,
        raw_tree, ema_tree)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # ema_init_tree copies (jnp.array(copy=True)): astype(f32) on
        # an f32 leaf is a no-op alias, and an aliased EMA tree makes
        # the donated train step fail with "attempt to donate the same
        # buffer twice". Frozen (teacher) leaves get placeholders.
        ema_params=ema_init_tree(params),
        ema_batch_stats=ema_init_tree(batch_stats),
    )
