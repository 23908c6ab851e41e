"""Uniform-grid spatial binning — TPU-native replacement for LocationHash2D.

The reference keeps a ``Vec<HashSet<AgentId>>`` of cells it mutates on every
agent move (location_hash_2d.rs:14-23, 126-149).  Mutable per-cell sets don't
map to XLA; instead we rebuild the binning each step from step-start
positions as pure ops:

1. cell id per agent (dead agents get a sentinel id that sorts last),
2. stable ``argsort`` by cell id,
3. per-cell start offsets by ``searchsorted``,
4. neighbor candidates = up to ``max_per_cell`` sorted slots from each cell
   of a static ``(2w+1)²`` window around the agent's cell, where ``w`` is
   sized from the maximum eyesight (the reference bounds its scan the same
   way per query, location_hash_2d.rs:103-122).

Rebuilding is O(N log N) but fully parallel — the classic cell-list
construction for particle codes — and makes the whole step a single fused
XLA computation.  It also fixes two reference quirks:

- the flat-index row stride uses the y-cell-count, not the width
  (reference bug for non-square grids, location_hash_2d.rs:59);
- agents leaving the grid clamp to the border cell and raise an
  ``out_of_bounds`` event flag instead of erroring the whole step
  (reference: ``Err("Index out of bounds")``, location_hash_2d.rs:61-63 →
  lib.rs:299-302).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import GridConfig
from .neighbors import NeighborSet


def cell_coords(grid: GridConfig, position: jax.Array):
    """(cx[N], cy[N], in_bounds[N]) for positions [N, 2].

    The reference floors ``(p - offset) / cell_size`` (via an unsafe `as
    usize` cast, location_hash_2d.rs:56-57, and floor() at :69-70)."""
    rel = (position - jnp.asarray(grid.offset, position.dtype)) / jnp.asarray(
        grid.cell_size, position.dtype
    )
    cx = jnp.floor(rel[..., 0]).astype(jnp.int32)
    cy = jnp.floor(rel[..., 1]).astype(jnp.int32)
    in_bounds = (cx >= 0) & (cx < grid.nx) & (cy >= 0) & (cy < grid.ny)
    return (
        jnp.clip(cx, 0, grid.nx - 1),
        jnp.clip(cy, 0, grid.ny - 1),
        in_bounds,
    )


def cell_id(grid: GridConfig, cx: jax.Array, cy: jax.Array) -> jax.Array:
    """Flat cell id with x-major layout (as the reference,
    location_hash_2d.rs:59) but the *correct* row stride ``ny``."""
    return cx * jnp.int32(grid.ny) + cy


class GridBinning:
    """Result of binning all agents into cells (plain container; all members
    are arrays so it can cross jit boundaries via its fields)."""

    def __init__(self, order, sorted_cid, starts, cx, cy, in_bounds):
        self.order = order  # [N] int32 — agent slots sorted by cell id
        self.sorted_cid = sorted_cid  # [N] int32
        self.starts = starts  # [n_cells + 1] int32 — cell segment offsets
        self.cx = cx  # [N] int32 (unsorted, clamped)
        self.cy = cy  # [N] int32
        self.in_bounds = in_bounds  # [N] bool


def bin_agents(grid: GridConfig, position: jax.Array, alive: jax.Array) -> GridBinning:
    n = position.shape[0]
    cx, cy, in_bounds = cell_coords(grid, position)
    cid = cell_id(grid, cx, cy)
    # Dead agents sort to the very end under a sentinel id so no cell
    # segment ever contains them.
    cid_key = jnp.where(alive, cid, jnp.int32(grid.n_cells))
    order = jnp.argsort(cid_key, stable=True).astype(jnp.int32)
    sorted_cid = cid_key[order]
    starts = jnp.searchsorted(
        sorted_cid, jnp.arange(grid.n_cells + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return GridBinning(order, sorted_cid, starts, cx, cy, in_bounds)


def grid_neighbors(
    grid: GridConfig,
    position: jax.Array,  # [N, 2]
    eyesight: jax.Array,  # [N]
    alive: jax.Array,  # [N] bool
    window: int,  # static: cells on each side (>= ceil(max_eyesight/cell))
    max_per_cell: int,  # static: candidate cap per cell
) -> NeighborSet:
    """Fixed-K candidate table from the cell window around each agent.

    K = (2*window+1)² * max_per_cell.  Exact versus the brute oracle as long
    as (a) window covers every agent's eyesight and (b) no queried cell holds
    more than ``max_per_cell`` agents; (b) is audited via
    ``max_cell_occupancy``.
    """
    n = position.shape[0]
    b = bin_agents(grid, position, alive)

    side = 2 * window + 1
    # Window cell offsets as the full (dx, dy) cross product: [side*side]
    off = jnp.arange(side, dtype=jnp.int32) - window
    dx = jnp.broadcast_to(off[:, None], (side, side)).reshape(-1)
    dy = jnp.broadcast_to(off[None, :], (side, side)).reshape(-1)
    # Per agent, the window cells: [N, side*side]
    wx = b.cx[:, None] + dx[None, :]
    wy = b.cy[:, None] + dy[None, :]
    cell_ok = (wx >= 0) & (wx < grid.nx) & (wy >= 0) & (wy < grid.ny)
    wcid = jnp.where(cell_ok, cell_id(grid, jnp.clip(wx, 0, grid.nx - 1),
                                      jnp.clip(wy, 0, grid.ny - 1)), 0)

    seg_start = b.starts[wcid]  # [N, side*side]
    seg_end = b.starts[wcid + 1]
    seg_len = seg_end - seg_start

    # Up to max_per_cell candidates per window cell.
    j = jnp.arange(max_per_cell, dtype=jnp.int32)  # [max_per_cell]
    cand_sorted_pos = seg_start[:, :, None] + j[None, None, :]  # [N, C, P]
    cand_ok = cell_ok[:, :, None] & (j[None, None, :] < seg_len[:, :, None])
    cand_sorted_pos = jnp.clip(cand_sorted_pos, 0, n - 1)
    cand_idx = b.order[cand_sorted_pos]  # [N, C, P] agent slots

    k = side * side * max_per_cell
    idx = cand_idx.reshape(n, k)
    ok = cand_ok.reshape(n, k)

    # Exact-distance + self + eyesight filter (strict <, as
    # location_hash_2d.rs:251).
    diff = position[:, None, :] - position[idx]
    dist = jnp.linalg.norm(diff, axis=-1)
    me = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = ok & (idx != me) & (dist < eyesight[:, None]) & alive[:, None]

    # Diagnostic: densest cell actually queried (over in-window cells).
    occ = jnp.where(cell_ok, seg_len, 0)
    max_occ = jnp.max(occ).astype(jnp.int32)
    # Enforcement counter: agents beyond ``max_per_cell`` in a cell never
    # enter a candidate set — silent physics truncation (the reference's
    # cells are unbounded, location_hash_2d.rs:15).  Two stages:
    #   1. cheap conservative screen: total overflow over all cells
    #      (runs every step, zero extra gathers);
    #   2. only when that is nonzero, an exact audit (lax.cond, so clean
    #      steps never pay for it): gather the dropped members' positions
    #      and count only those actually inside some alive querier's
    #      eyesight — a dense cluster nobody can see must NOT raise
    #      (round-2 verdict: false alarm at on_truncation="raise").
    # The audit distance-checks up to ``max(max_per_cell, 16)`` dropped
    # members per cell; deeper overflow is counted conservatively.
    cell_counts = b.starts[1:] - b.starts[:-1]  # [n_cells] (alive only)
    overflow_total = jnp.sum(
        jnp.maximum(cell_counts - jnp.int32(max_per_cell), 0)
    ).astype(jnp.int32)

    def _audit_impactful(_):
        a_cap = max(max_per_cell, 16)  # audit margin: ranks [P, P+A)
        ja = jnp.arange(a_cap, dtype=jnp.int32) + jnp.int32(max_per_cell)
        s_pos = seg_start[:, :, None] + ja[None, None, :]  # [N, C, A]
        in_seg = cell_ok[:, :, None] & (ja[None, None, :] < seg_len[:, :, None])
        s_clip = jnp.clip(s_pos, 0, n - 1)
        m_idx = b.order[s_clip]  # [N, C, A] dropped-member agent slots
        d = jnp.linalg.norm(
            position[:, None, None, :] - position[m_idx], axis=-1
        )
        me3 = jnp.arange(n, dtype=jnp.int32)[:, None, None]
        seen = (
            in_seg
            & (d < eyesight[:, None, None])
            & alive[:, None, None]
            & (m_idx != me3)
        )
        # A dropped member counts once if ANY querier sees it: OR over
        # queriers via a max-scatter onto its sorted slot.
        seen_slot = jnp.zeros((n,), jnp.bool_).at[s_clip.reshape(-1)].max(
            seen.reshape(-1), mode="drop"
        )
        audited = jnp.sum(seen_slot).astype(jnp.int32)
        # Beyond-audit remainder, counted conservatively.
        rest = jnp.sum(
            jnp.maximum(cell_counts - jnp.int32(max_per_cell + a_cap), 0)
        ).astype(jnp.int32)
        return audited + rest

    truncated = jax.lax.cond(
        overflow_total > 0, _audit_impactful,
        lambda _: jnp.zeros((), jnp.int32), None,
    )
    return NeighborSet(idx=idx, valid=valid, max_cell_occupancy=max_occ,
                       truncated=truncated)
