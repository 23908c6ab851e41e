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


def nearest_neighbors_grid(
    grid,            # core.config.GridConfig
    binning,         # ops.grid.GridBinning (prebuilt, reusable)
    position: jax.Array,  # [N, 2]
    alive: jax.Array,     # [N] bool
    k: int,
    point: jax.Array,     # [2]
    max_ring: int,
) -> tuple[jax.Array, jax.Array]:
    """Spatially-bounded k-nearest-neighbors over a prebuilt grid binning
    — the scalable analog of the reference's ring-expansion scan
    (location_hash_2d.rs:151-238), exact where the reference misses
    corner cells (exclusive upper ranges at :177-218).

    Candidates come from the (2*max_ring+1)^2 cell window around the
    query point (every cell's full segment, via fixed per-cell slices of
    the sorted order); validity marks the true k nearest among them.
    The result is EXACT iff the k-th neighbor lies within ``max_ring``
    cells — the caller grows ``max_ring`` (the reference expands rings
    the same way); cells are never truncated (whole segments are
    scanned up to the segment cap implied by ``max_ring`` geometry).

    Returns (idx[k] int32, valid[k] bool, overflow [] int32), nearest
    first; nonzero overflow means a window cell exceeded the per-cell
    read budget (grow it or fall back to the exact brute query).
    """
    from .grid import cell_id

    n = position.shape[0]
    side = 2 * max_ring + 1
    # Segment cap: a cell can hold at most n agents; bound per-cell reads
    # by the window's total candidate budget instead of a hard per-cell
    # cap so dense cells are never silently cut.
    per_cell = max(k, 64)

    rel = (point - jnp.asarray(grid.offset, position.dtype)) / jnp.asarray(
        grid.cell_size, position.dtype
    )
    cx = jnp.clip(jnp.floor(rel[0]).astype(jnp.int32), 0, grid.nx - 1)
    cy = jnp.clip(jnp.floor(rel[1]).astype(jnp.int32), 0, grid.ny - 1)

    off = jnp.arange(side, dtype=jnp.int32) - max_ring
    wx = cx + off[:, None]
    wy = cy + off[None, :]
    ok = (wx >= 0) & (wx < grid.nx) & (wy >= 0) & (wy < grid.ny)
    wcid = jnp.where(
        ok,
        cell_id(grid, jnp.clip(wx, 0, grid.nx - 1),
                jnp.clip(wy, 0, grid.ny - 1)),
        0,
    ).reshape(-1)
    ok = ok.reshape(-1)

    seg_start = binning.starts[wcid]
    seg_len = binning.starts[wcid + 1] - seg_start
    j = jnp.arange(per_cell, dtype=jnp.int32)
    cand_pos = jnp.clip(seg_start[:, None] + j[None, :], 0, n - 1)
    cand_ok = ok[:, None] & (j[None, :] < seg_len[:, None])
    cand = binning.order[cand_pos].reshape(-1)
    cand_ok = cand_ok.reshape(-1)
    overflow = jnp.sum(
        jnp.where(ok, jnp.maximum(seg_len - per_cell, 0), 0)
    )

    d = jnp.linalg.norm(position[cand] - point[None, :], axis=-1)
    d = jnp.where(cand_ok & alive[cand], d, jnp.inf)
    neg_top, sel = jax.lax.top_k(-d, k)
    return cand[sel].astype(jnp.int32), jnp.isfinite(-neg_top), overflow


def nearest_neighbors_tiered(
    grid,                 # core.config.GridConfig (static)
    starts: jax.Array,    # [n_cells + 1] int32 — from GridBinning
    order: jax.Array,     # [N] int32
    position: jax.Array,  # [N, 2]
    alive: jax.Array,     # [N] bool
    k: int,               # static
    point: jax.Array,     # [2]
    rings=(1, 2, 4, 8),   # static escalation ladder
):
    """Exact kNN in ONE traced computation: a ``lax.cond`` chain over a
    static ring ladder (the device analog of the reference's incremental
    ring expansion, location_hash_2d.rs:151-238), ending in the exact
    O(N) brute query.  Each tier's window result is used only when
    provably sufficient — all ``k`` hits valid, the k-th strictly inside
    the ring's guaranteed-coverage radius, and no window cell overflowed
    the per-cell read budget — otherwise the next tier runs.  Only the
    selected tier executes at runtime (lax.cond), so the common case
    costs one small window scan; there is no host round-trip and no
    retracing between tiers.

    Returns (idx[k] int32, valid[k] bool), nearest first.
    """
    from .grid import GridBinning

    binning = GridBinning(order, None, starts, None, None, None)
    cell = jnp.asarray(grid.cell_size, position.dtype)

    def brute_tier():
        idx, valid = nearest_neighbors(position, alive, k, point)
        return idx, valid

    def make_tier(i):
        if i == len(rings):
            return lambda: brute_tier()
        ring = rings[i]

        def tier():
            idx, valid, overflow = nearest_neighbors_grid(
                grid, binning, position, alive, k, point, ring
            )
            kth = jnp.linalg.norm(position[idx[-1]] - point)
            good = (
                jnp.all(valid)
                & (kth < ring * cell)
                & (overflow == 0)
            )
            return jax.lax.cond(good, lambda: (idx, valid),
                                make_tier(i + 1))

        return tier

    return make_tier(0)()
