"""Collective helpers for the spatial (`space`) mesh axis.

The subtle one: `all_gather_invariant`. Under shard_map with vma
typing, `jax.lax.all_gather` returns a *varying*-typed array even
though every shard holds identical values afterwards. Any LOSS computed
from such a tensor is S identical per-shard loss copies, and
differentiating a varying loss with respect to an invariant
(replicated) parameter yields the psum of the per-copy gradients —
i.e. S x the true gradient. (Verified empirically; pinned by
tests/test_parallel.py::test_deep_camera_sharding_raw_gradients_match.
Adam's scale-invariant first step hides exactly this class of bug,
which is why the raw-gradient test exists — advisor r3, medium.)

Appending a `pmean` re-types the tensor invariant at zero mathematical
cost forward (mean of identical values), and its transpose divides the
cotangent by S before the all_gather transpose re-sums the S copies —
restoring exact 1x gradients. The price is one extra all-reduce over
the gathered tensor; call sites that only need the values for
NON-differentiated outputs can use plain all_gather.
"""
from __future__ import annotations

import jax


def all_gather_invariant(x, axis_name: str, axis: int):
    """all_gather(tiled) + invariant re-typing for loss-feeding
    tensors; see module docstring for why the pmean is load-bearing."""
    g = jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)
    return jax.lax.pmean(g, axis_name)
