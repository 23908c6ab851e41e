"""Neighbor-candidate generation for the local-planner pass.

The reference exposes a mutable ``SpatialIndex`` trait
(spatial_index.rs:4-14) whose radius query the step loop calls once per
agent (lib.rs:277-279).  TPU-natively, neighbor search is a *batched* pure
function over step-start state that yields a fixed-shape candidate table:

    NeighborSet.idx   [N, K] int32  — candidate slot indices
    NeighborSet.valid [N, K] bool   — candidate is alive, not self, and
                                      strictly within the agent's eyesight
                                      (the reference filters with `< radius`,
                                      location_hash_2d.rs:251)

Two backends produce this table:

- ``brute_neighbors``: masked all-pairs O(N²).  Exact; the correctness
  oracle (mirrors the reference's own test oracle,
  location_hash_2d.rs:294-306) and the right choice for small N.
- ``grid_neighbors`` (ops/grid.py): sort-by-cell binning, the scalable
  replacement for LocationHash2D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NeighborSet:
    idx: jax.Array  # [N, K] int32
    valid: jax.Array  # [N, K] bool
    max_cell_occupancy: jax.Array  # [] int32 (diagnostic; 0 for brute)
    # Count of alive agents silently dropped from candidate sets this step
    # (cells past ``max_per_cell``).  The reference's cells are unbounded
    # (location_hash_2d.rs:15), so any nonzero count is a physics
    # divergence users must see — core/simulation.py raises on it by
    # default.  Always 0 for the brute backend.
    truncated: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


def brute_neighbors(
    position: jax.Array,  # [N, 2]
    eyesight: jax.Array,  # [N]
    alive: jax.Array,  # [N] bool
) -> NeighborSet:
    """All-pairs candidate table: K == N."""
    n = position.shape[0]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    diff = position[:, None, :] - position[None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    not_self = ~jnp.eye(n, dtype=bool)
    valid = (
        alive[:, None]
        & alive[None, :]
        & not_self
        & (dist < eyesight[:, None])
    )
    return NeighborSet(
        idx=idx, valid=valid, max_cell_occupancy=jnp.zeros((), jnp.int32)
    )


def neighbors_in_radius(
    position: jax.Array,  # [N, 2] all agent positions
    alive: jax.Array,  # [N] bool
    radius: jax.Array,  # [] float
    point: jax.Array,  # [2] query point
) -> jax.Array:
    """Point-radius query: bool[N] mask of agents strictly within ``radius``
    of ``point`` — the batched equivalent of
    ``SpatialIndex::get_neighbours_in_radius`` (spatial_index.rs:10,
    location_hash_2d.rs:240-258).  Used by the spawn-clearance gate
    (lib.rs:212-214) and exposed as a public query."""
    dist = jnp.linalg.norm(position - point[None, :], axis=-1)
    return alive & (dist < radius)


def nearest_neighbors(
    position: jax.Array,  # [N, 2]
    alive: jax.Array,  # [N] bool
    k: int,
    point: jax.Array,  # [2]
) -> tuple[jax.Array, jax.Array]:
    """Exact k-nearest-neighbors: (idx[k] int32, valid[k] bool), nearest
    first.  Equivalent of ``SpatialIndex::get_nearest_neighbours``
    (spatial_index.rs:7-8).  The reference's ring-scan implementation misses
    corner cells (exclusive upper ranges, location_hash_2d.rs:177-218); this
    is exact by construction, so results can differ where the reference is
    wrong — the reference's own oracle test (location_hash_2d.rs:330-338)
    agrees with us."""
    dist = jnp.linalg.norm(position - point[None, :], axis=-1)
    dist = jnp.where(alive, dist, jnp.inf)
    neg_top, idx = jax.lax.top_k(-dist, k)
    return idx.astype(jnp.int32), jnp.isfinite(-neg_top)
