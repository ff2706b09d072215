"""Fast parameter initialisation at reduced spatial resolution.

flax init executes the full forward to build the variable tree, but
every parameter in OcRFDet is spatially agnostic (convs/dense/BN only —
the positional encodings depend on the BEV grid, which is unchanged).
Initialising with small input images produces the identical tree at a
fraction of the trace/compile cost (the flagship init is minutes on a
tunnelled TPU; this is seconds).
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np

from ..config import OcRFDetConfig

_SMALL = (64, 176)   # /16 -> 4x11 feature grid; /4 stem ok


def small_init_config(cfg: OcRFDetConfig) -> OcRFDetConfig:
    data = dataclasses.replace(cfg.data, input_size=_SMALL)
    # the init graph is compiled for the host CPU while the default
    # backend may still be the TPU; the Pallas cost-volume kernel must
    # not be traced for a backend it will not run on — the gather path
    # builds the identical (param-free) tree
    vt = dataclasses.replace(
        cfg.vt, render_image_size=_SMALL, ht_impl="gather",
        sample_impl="gather",
        depthnet=dataclasses.replace(cfg.vt.depthnet, cv_impl="scan"))
    return dataclasses.replace(cfg, data=data, vt=vt)


def fast_init(cfg: OcRFDetConfig, model_cls, rng_seed: int = 0,
              train: bool = True):
    """Returns (variables, model) where variables fit the FULL-size
    model of `cfg` but were initialised on the small-spatial clone."""
    from ..data.synthetic import make_batch
    import jax.numpy as jnp

    small_cfg = small_init_config(cfg)
    small_model = model_cls(small_cfg)
    batch = make_batch(small_cfg, batch_size=1, seed=0,
                       with_targets=False)
    batch = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
             for k, v in batch.items()}
    batch["with_prev"] = jnp.asarray(1.0)
    batch["use_box_mask"] = jnp.asarray(0.0)
    # Initialise on the host CPU backend: remote-TPU compilation of the
    # throwaway init graph costs minutes through the tunnel; CPU
    # compiles locally in seconds and the params transfer on first use.
    # One jit around the whole init: eager init dispatches hundreds of
    # single-op compiles (each a fresh executable), which dominates
    # start-up; a single traced+compiled init graph is ~10x faster.
    init_fn = jax.jit(lambda rng, b: small_model.init(rng, b, train=train))
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != "cpu":
        # do NOT persist this throwaway CPU executable: reloading
        # XLA:CPU AOT results in later runs logs a spurious machine-
        # feature-mismatch ERROR per executable (compiler pseudo-
        # features vs the raw host probe), and recompiling the small
        # init graph costs only seconds
        cache_on = jax.config.jax_enable_compilation_cache
        try:
            jax.config.update("jax_enable_compilation_cache", False)
            with jax.default_device(cpu):
                variables = init_fn(jax.random.PRNGKey(rng_seed),
                                    jax.device_put(batch, cpu))
        finally:
            jax.config.update("jax_enable_compilation_cache", cache_on)
    else:
        variables = init_fn(jax.random.PRNGKey(rng_seed), batch)
    return variables, model_cls(cfg)
