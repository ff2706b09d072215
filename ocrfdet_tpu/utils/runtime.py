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
    """Point jax at a persistent on-disk compilation cache."""
    path = path or os.environ.get("OCRFDET_JAX_CACHE",
                                  "/tmp/ocrfdet_jaxcache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def shard_state(mesh: Mesh, state):
    """Commit a (replicated) train state to the mesh."""
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, batch):
    """Commit a host batch to the mesh: leading axis over `data`,
    scalars replicated. Accepts any pytree of numpy/jax arrays."""
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))

    def put(v):
        arr = np.asarray(v)
        return jax.device_put(arr, rep if arr.ndim == 0 else dp)

    return jax.tree.map(put, batch)
