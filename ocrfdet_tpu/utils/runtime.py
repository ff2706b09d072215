"""Process-level runtime knobs: compilation cache, input placement.

Two host-side costs dominate wall-clock on a tunnelled TPU and are easy
to eliminate:

  * XLA compilation of the train step is minutes; the persistent
    compilation cache makes every process after the first load the
    executable in seconds (`enable_compilation_cache`).

  * jit caches executables per input *sharding*. A state created on the
    default device is SingleDeviceSharding; after one donated step the
    outputs carry the mesh's NamedSharding, so the second call re-lowers
    and recompiles the whole step (~3 min). Committing state and batch
    to their mesh shardings up front (`shard_state`, `shard_batch`)
    makes call #1 and call #2 hit the same executable.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def enable_compilation_cache(path: str | None = None) -> None:
    """Point jax at a persistent on-disk compilation cache.

    The directory is keyed by (backend, device kind, machine): XLA:CPU
    AOT executables record the COMPILE machine's feature set, so a
    cache shared across machines or backends replays "could lead to
    SIGILL" loader warnings on every run and risks real illegal
    instructions."""
    base = path or os.environ.get("OCRFDET_JAX_CACHE",
                                  "/tmp/ocrfdet_jaxcache")
    try:
        kind = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # noqa: BLE001 - no backend yet
        kind = "unknown"
    # arch alone is not enough: XLA:CPU AOT records the exact feature
    # set (avx512 variants etc.), so hash the cpuinfo flags
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
        feat = hashlib.md5(flags.encode()).hexdigest()[:8]
    except OSError:
        feat = "nofeat"
    key = f"{jax.default_backend()}-{kind}-{os.uname().machine}-{feat}"
    path = os.path.join(base, key)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def shard_state(mesh: Mesh, state):
    """Commit a train state to the mesh: params/batch_stats/step
    replicated (the forward runs them under shard_map), optimizer
    moments and both EMA trees ZeRO-sharded over the devices
    (parallel/step.py:zero_sharding) — ~3x params of pure update
    state drops to 1/n per chip."""
    from ..parallel.step import zero_sharding
    rep = NamedSharding(mesh, P())
    return type(state)(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.tree.map(
            jax.device_put, state.opt_state,
            zero_sharding(mesh, state.opt_state)),
        ema_params=jax.tree.map(
            jax.device_put, state.ema_params,
            zero_sharding(mesh, state.ema_params)),
        ema_batch_stats=jax.tree.map(
            jax.device_put, state.ema_batch_stats,
            zero_sharding(mesh, state.ema_batch_stats)),
    )


def shard_batch(mesh: Mesh, batch):
    """Commit a host batch to the mesh: leading axis over `data`,
    scalars replicated. Accepts any pytree of numpy/jax arrays.

    Multi-process: the batch is process-LOCAL (the Loader's slice of
    the global batch, see data/dataset.py); the global jax.Array is
    assembled from per-process shards with
    `jax.make_array_from_process_local_data` — each host feeds only
    its addressable devices, the torch analog being per-rank
    DistributedSampler batches under DDP."""
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    multi = jax.process_count() > 1

    def put(v):
        arr = np.asarray(v)
        if arr.ndim == 0:
            if multi:
                return jax.make_array_from_process_local_data(rep, arr)
            return jax.device_put(arr, rep)
        if multi:
            return jax.make_array_from_process_local_data(dp, arr)
        return jax.device_put(arr, dp)

    return jax.tree.map(put, batch)
