"""Varying-manual-axes (vma) compatibility helper.

Inside shard_map, lax.scan requires carry input/output types to agree
including their varying-axes annotation. A literal zeros init is
"unvarying" while the body output (which mixes in sharded data) is
varying over the mesh axes, so scans fail to trace. `match_vma` makes
an init carry inherit the vma of a reference array in a way that is a
no-op outside shard_map (adds 0 * scalar-from-ref, folded by XLA).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def match_vma(x, ref):
    z = jnp.zeros((), dtype=x.dtype) * ref.ravel()[0].astype(x.dtype)
    return x + z


def union_vma(*arrs):
    """Union of the varying mesh axes of `arrs`.

    Inside shard_map (check_vma=True), pallas_call out_shapes must
    declare their varying axes explicitly; a kernel's outputs vary over
    every axis any of its inputs varies over. Returns None outside
    shard_map so plain calls keep the default."""
    vma = frozenset()
    for a in arrs:
        vma |= frozenset(getattr(jax.typeof(a), "vma", ()) or ())
    return vma or None
