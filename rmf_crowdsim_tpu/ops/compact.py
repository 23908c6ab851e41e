"""Fixed-k mask compaction without scatters.

One idiom, used everywhere a variable number of flagged rows must land
in a fixed-size buffer (event compaction, spill extraction, migration
records): the r-th flagged row's position is found by binary search on
the inclusive prefix count — an [k]-query ``searchsorted`` over [N]
plus a [k]-row gather — instead of the scatter formulation
(``zeros(k).at[rank].set(...)``), which pays XLA's ~137 ns/update
per SOURCE row regardless of how few land (DESIGN_NOTES.md).

The reference has no analog (its Vec/HashMap collections grow
dynamically, e.g. source_sink.rs spawn lists); this is the TPU-native
replacement for "collect into a Vec".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Compaction(NamedTuple):
    idx: jax.Array     # [k] int32 — position of the r-th True (or >= n)
    valid: jax.Array   # [k] bool — rank r exists
    count: jax.Array   # [] int32 — total number of True entries
    n_over: jax.Array  # [] int32 — True entries beyond the k buffer


def compact_indices(mask: jax.Array, k: int) -> Compaction:
    """Positions of the first ``k`` True entries of ``mask``, in order.

    ``idx[r]`` is the index of the (r+1)-th True entry; ``valid[r]`` is
    False (and ``idx[r] == n``... clip before gathering) when fewer than
    r+1 entries are set.  Gather pattern::

        c = compact_indices(mask, k)
        safe = jnp.clip(c.idx, 0, n - 1)
        rows = jnp.where(c.valid[:, None], data[safe], fill)
    """
    n = mask.shape[0]
    csum = jnp.cumsum(mask.astype(jnp.int32))
    idx = jnp.searchsorted(
        csum, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    count = csum[-1]
    return Compaction(
        idx=idx,
        valid=idx < n,
        count=count,
        n_over=jnp.maximum(count - jnp.int32(k), 0),
    )
