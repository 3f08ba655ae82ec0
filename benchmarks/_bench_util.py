"""Shared benchmark helpers.

``hard_sync`` is THE load-bearing timing fence for every benchmark in this
directory: over the axon tunnel, ``jax.block_until_ready`` is a SOFT barrier
for some result kinds (a scanned-scalar result has been observed returning
~2 µs/iter before execution finished — round-3 measurement). Fetching a few
bytes of a leaf to host is the reliable fence; the fetch is ~8 bytes, so its
d2h cost is a fixed ~0.15 s tunnel round-trip, not proportional to the array.
Keep every benchmark on this ONE implementation so a future tuning of the
barrier applies everywhere at once.
"""

from __future__ import annotations

import jax
import numpy as np


def hard_sync(tree) -> None:
    """Hard execution fence for an array or pytree (params, cache chunks…):
    fetch a few bytes of the first leaf to host, then block on the rest."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        a = leaves[0]
        np.asarray(a.ravel()[:8] if hasattr(a, "ravel") else a)
    jax.block_until_ready(tree)
