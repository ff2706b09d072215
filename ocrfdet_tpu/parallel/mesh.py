"""Device mesh construction and sharding rules.

The reference's only parallelism is NCCL DDP (apis/train.py:227-231).
TPU-natively we use a 2-axis mesh:
  * `data`  — batch data parallelism (gradient psum == DDP all-reduce)
  * `space` — optional spatial sharding of cameras / BEV tiles
Parameters are replicated; batches are sharded over `data`.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, space: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // space
    assert data * space == n, (data, space, n)
    dev_array = np.asarray(devices).reshape(data, space)
    return Mesh(dev_array, ("data", "space"))


def batch_sharding(mesh: Mesh):
    """Leading (batch) axis sharded over `data`; replicate scalars."""
    def spec(x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("data"))
    return spec


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
