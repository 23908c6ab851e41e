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
from .compact import compact_indices
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
        # MEMBER-centric: enumerate the dropped members directly (rank
        # >= max_per_cell within their cell, compacted to k_aud rows)
        # and look for seers in each member's own cell window — the
        # query-centric formulation materialized [N, C, A] pair tensors
        # (multi-GB at 1M agents) the moment a single cell overflowed.
        # Window symmetry makes this exact: (a) guarantees any seer q
        # of member m has m's cell inside q's window, hence q's cell
        # inside m's window.  [k_aud, C, r_cap] is a few hundred KB.
        k_aud = min(n, 1024)
        r_cap = max_per_cell + max(max_per_cell, 16)  # seer ranks/cell
        sent_ok = b.sorted_cid < jnp.int32(grid.n_cells)
        seg0 = b.starts[jnp.clip(b.sorted_cid, 0, grid.n_cells - 1)]
        rank_sorted = jnp.arange(n, dtype=jnp.int32) - seg0
        dropped_sorted = sent_ok & (rank_sorted >= jnp.int32(max_per_cell))
        ca = compact_indices(dropped_sorted, k_aud)
        valid_m = ca.valid
        m_idx = b.order[jnp.clip(ca.idx, 0, n - 1)]    # [K] agent slots
        mx = b.cx[m_idx][:, None] + dx[None, :]        # [K, C]
        my = b.cy[m_idx][:, None] + dy[None, :]
        m_ok = (mx >= 0) & (mx < grid.nx) & (my >= 0) & (my < grid.ny)
        m_cid = jnp.where(
            m_ok, cell_id(grid, jnp.clip(mx, 0, grid.nx - 1),
                          jnp.clip(my, 0, grid.ny - 1)), 0)
        w0 = b.starts[m_cid]                           # [K, C]
        wlen = b.starts[m_cid + 1] - w0
        jr = jnp.arange(r_cap, dtype=jnp.int32)
        q_sorted = w0[:, :, None] + jr[None, None, :]  # [K, C, R]
        q_in = m_ok[:, :, None] & (jr[None, None, :] < wlen[:, :, None])
        q_idx = b.order[jnp.clip(q_sorted, 0, n - 1)]  # [K, C, R]
        d = jnp.linalg.norm(
            position[m_idx][:, None, None, :] - position[q_idx], axis=-1
        )
        seen_by = (
            q_in
            & (d < eyesight[q_idx])
            & (q_idx != m_idx[:, None, None])
        )
        # Seers past the examined ranks, and members past the audit cap:
        # counted conservatively (the raising direction, as before).
        deep = jnp.any(m_ok & (wlen > jnp.int32(r_cap)), axis=1)
        seen_m = valid_m & (jnp.any(seen_by, axis=(1, 2)) | deep)
        audited = jnp.sum(seen_m).astype(jnp.int32)
        rest = jnp.maximum(overflow_total - jnp.int32(k_aud), 0)
        return audited + rest

    truncated = jax.lax.cond(
        overflow_total > 0, _audit_impactful,
        lambda _: jnp.zeros((), jnp.int32), None,
    )
    return NeighborSet(idx=idx, valid=valid, max_cell_occupancy=max_occ,
                       truncated=truncated)
