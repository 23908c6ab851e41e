"""Static (trace-time) configuration for the TPU crowd simulator.

The reference simulator (rmf_crowdsim/src/lib.rs:69-91) stores agents in a
``HashMap<AgentId, Agent>`` and is generic over a ``SpatialIndex`` trait.  A
TPU-native design needs *static shapes*: agent state lives in fixed-capacity
structure-of-arrays selected by an alive-mask, and everything that controls
array shapes or compiled control flow lives here, in hashable frozen
dataclasses that the jitted ``step`` closes over.

Everything that changes *values* at runtime (positions, rates, waypoints,
route tables, ...) lives in :mod:`rmf_crowdsim_tpu.core.params` pytrees
instead, so runtime changes do not retrace.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp

# Neighbor backend names.
BACKEND_BRUTE = "brute"
BACKEND_GRID = "grid"
BACKEND_GRID_PALLAS = "grid_pallas"
# Dense (bucket-free) fused kernel (ops/zanlungo_dense.py): the
# tile-SORTED rows themselves are the layout — no per-tile buckets, no
# pack, no spill machinery.  Implies ``presort`` (the layout IS the
# sorted order).  Single-chip only (the multi-chip engines keep the
# bucketed layout).
BACKEND_GRID_DENSE = "grid_dense"
# User-supplied backend: the TPU-native analog of implementing the
# reference's SpatialIndex trait (spatial_index.rs:4-14).  Instead of a
# stateful add_or_update/query object, a custom backend is a pure
# function ``neighbor_fn(state) -> ops.neighbors.NeighborSet`` passed to
# build_step/build_rollout/Simulation; it runs inside the jitted step.
BACKEND_CUSTOM = "custom"


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Uniform-grid spatial index configuration.

    Mirrors the constructor of the reference's dense grid hash
    (location_hash_2d.rs:33-51): a ``width`` x ``height`` world split into
    square cells of ``cell_size``, with ``offset`` at the corner of cell
    (0, 0).  Unlike the reference — which computes its flat cell index with
    the *width* as the row stride (location_hash_2d.rs:59), correct only for
    square grids — we use the proper y-cell-count stride.
    """

    width: float
    height: float
    cell_size: float
    offset: Tuple[float, float]

    @property
    def nx(self) -> int:
        return int(self.width / self.cell_size)

    @property
    def ny(self) -> int:
        return int(self.height / self.cell_size)

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny

    def window_radius(self, max_radius: float) -> int:
        """Number of cells on each side of an agent's cell that a radius
        query of ``max_radius`` can touch (reference scans the same bound,
        location_hash_2d.rs:103-122, 240-258)."""
        return max(1, int(math.ceil(max_radius / self.cell_size)))


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Top-level static configuration of a simulation.

    ``capacity`` replaces the reference's unbounded HashMap (lib.rs:71): the
    maximum number of simultaneously-alive agents.  ``max_sources`` pads the
    SourceSink registry (lib.rs:73) to a static size.
    """

    capacity: int
    grid: Optional[GridConfig] = None
    neighbor_backend: str = BACKEND_BRUTE
    # Max candidate neighbors gathered per grid cell in the window.  Cells
    # holding more agents than this silently truncate (reported through
    # diagnostics.max_cell_occupancy); the reference's HashSet-per-cell is
    # unbounded (location_hash_2d.rs:15).
    max_per_cell: int = 8
    # Upper bound on any agent's eyesight range, used to size the static
    # cell window for the grid backend.
    max_eyesight: float = 0.0
    # Hard-coded spawn-clearance radius around a source, from lib.rs:214.
    spawn_clearance: float = 0.4
    # Compute dtype for positions/velocities.  float32 on TPU; float64 (on
    # CPU with jax_enable_x64) for reference-matching runs.
    dtype: str = "float32"
    # Whether the step commits each agent's fresh preferred velocity back to
    # state.  False replicates the reference quirk where preferred_vel is
    # written on a per-agent clone (lib.rs:271) but never committed
    # (lib.rs:354-357), so neighbors forever observe the spawn value.
    commit_preferred_vel: bool = False
    # --- grid_pallas backend tuning (ops/zanlungo_pallas.py) -------------
    # Agent slots per supertile bucket; tiles holding more agents than this
    # drop the surplus from the force pass (audited via the occupancy
    # diagnostic).
    bucket_capacity: int = 16
    # Supertiles per kernel program (column strip) and per inner query
    # sub-block.  strip_tiles must be a multiple of sub_tiles, and
    # (sub_tiles + 2) * bucket_capacity must equal 128 (Mosaic alignment;
    # see ops/zanlungo_pallas.BucketConfig).
    strip_tiles: int = 96
    sub_tiles: int = 6
    # Supertile size override for the fused kernel (0 = max_eyesight, the
    # correctness minimum; larger tiles + larger buckets cut pair work —
    # see ops/zanlungo_pallas.BucketConfig.create).
    bucket_tile_size: float = 0.0
    # Use the MXU one-hot pack kernel instead of the XLA row scatter when
    # building the bucketed layout (ops/pack_pallas.py).
    use_pack_kernel: bool = False
    # --- grid_dense backend tuning (ops/zanlungo_dense.py) ---------------
    # Static per-column row capacity = (uniform per-column mean) *
    # headroom, rounded up to 128.  Columns holding more agents drop the
    # surplus loudly (neighbor_truncated; raise-by-default) — the dense
    # engine's one capacity narrowing.  2.0 is a >=40-sigma Poisson bound
    # at 1M agents; raise it for clustered worlds.
    dense_col_headroom: float = 2.0
    # Exact repair of bucket overflow (ops/zanlungo_pallas.spill_patch):
    # per overflow agent ("spill"), its whole 3x3 tile neighborhood is
    # recomputed exactly on the XLA side against its 5x5 packed window +
    # the spill list.  spill_capacity bounds spills per step; 0 disables
    # the patch (overflow then truncates, loudly).  Overruns surface
    # through neighbor_truncated.
    spill_capacity: int = 128
    # Fused spill repair (single-chip grid_pallas path): the first
    # min(128, spill_capacity) spills ride the MAIN force kernel as a
    # fourth candidate segment on flagged sub-blocks, so affected packed
    # queries are exact in one pass and only the spills' own rows run a
    # small oracle-math pass — replacing spill_patch's per-spill window
    # recompute + scatter (~6 ms at the 1M bench).  Affected queries'
    # f32 force sums append spill addends after the window lanes (the
    # patch's recompute order differed too — same tolerance class).
    # Spill storms past the fused segment fall back to the full patch.
    # DEFAULT OFF: in the full production step the patch hides almost
    # entirely under XLA's kernel overlap, while the fused path puts
    # spill discovery on the kernel's critical path — measured 60.8 vs
    # 56.7 ms/step at 1M (DESIGN_NOTES round-5 post-mortem).  The fused
    # path wins standalone and remains available for spill-heavy
    # mid-range scenes.
    fused_spills: bool = False
    # Keep agent state tile-sorted across steps (grid_pallas backend
    # only): each step re-sorts the whole SoA state by supertile with ONE
    # lax.sort-with-payloads (~30 ms at 1M), letting bucketize skip its
    # argsort + feature gather + inverse scatter (~90 ms of XLA
    # permutation ops — the measured per-element addressing floor,
    # DESIGN_NOTES.md).  Physics is identical up to f32 summation order
    # (candidate lanes tie-break by previous-step row instead of agent
    # index); agent identity is ``uid``, slot indices are not stable
    # across steps (they never were part of the public API).
    presort: bool = False
    # Every pair's Zanlungo priority difference is an integer (0 or
    # magnitude >= 1).  True for the reference's DEFAULT priorities —
    # the agent id (zanlungo.rs:94-98, 183-184; this framework defaults
    # priority to the uid, core/simulation.py add_agents) — and lets the
    # force kernel drop the right-of-way sqrt and the slerp asin/sin
    # polynomials (ops/zanlungo_pallas._pair_force int_prio; ~2.4 ms of
    # the 1M kernel).  Tolerance-level (ULP) output differences only.
    # The host session validates set_priority calls against this flag
    # (core/simulation.py).  Leave False if agents get fractional
    # priorities.
    integer_priorities: bool = False
    # Dual-row compacted tier (grid_pallas backend): when a sub-block's
    # two tile-contiguous query half-groups each fit a 64-lane candidate
    # union, compact them into the two halves of the 128-lane plane and
    # run the force/TTC math on half the rows (two queries per row).  At
    # walking densities ~99.9% of sub-blocks qualify (perf/dualrow_ab.py).
    # Per-query force sums hold the same addends as the shared tier but
    # the reduction tree groups them differently — tolerance-level (ULP)
    # differences only, like integer_priorities.
    dual_row: bool = False
    # World-sharded engine (parallel/worldstep.py) cross-device-count
    # reproducibility contract.
    # - "bitwise" (default): every step re-establishes the canonical
    #   (tile, uid) candidate order (a uid pre-sort feeding the stable
    #   tile sort), so an 8-device run is BITWISE identical to a
    #   1-device run — at the cost of ~2 full payload sorts plus the
    #   per-row feature gathers every step.
    # - "tolerance": each shard keeps its state tile-sorted across steps
    #   (the skin-deferred presort, per shard) and re-sorts only when an
    #   agent outruns the skin margin or the shard's population changes
    #   (spawn / despawn / migration).  Neighbor sets and forces stay
    #   EXACT; only the f32 force-sum lane order depends on shard history
    #   — the same divergence class the single-chip engine already
    #   accepts for presort / dual_row / int_prio (8-vs-1 tests assert
    #   allclose instead of equality).  This removes the dominant
    #   per-step shard tax (measured in BENCH multichip_shard_proxy).
    sharding_invariance: str = "bitwise"
    # Run the Pallas kernels in interpreter mode (CPU tests).
    pallas_interpret: bool = False
    # What the host session does when a step reports neighbor truncation
    # (events.neighbor_truncated > 0 — grid cells past max_per_cell or
    # Pallas tiles past bucket_capacity).  "raise" (default) raises
    # NeighborTruncationError from Simulation.step/run; "ignore" leaves
    # auditing to the caller.  The reference's per-cell sets are unbounded
    # (location_hash_2d.rs:15), so truncation is a silent physics
    # divergence that must not pass unnoticed.
    on_truncation: str = "raise"
    # What the host session does when a step leaves an alive agent outside
    # the grid (events.out_of_bounds).  "ignore" (default) matches this
    # framework's event-mask semantics (core/step.py header); "raise"
    # reproduces the reference's strict behavior, where an out-of-grid
    # position errors the whole step (location_hash_2d.rs:61-63 →
    # lib.rs:299-302) — use it for strict-parity runs.
    on_out_of_bounds: str = "ignore"
    # Minimum capacity at which get_nearest_neighbours uses the
    # grid-bounded tiered ring search; below it the O(N) brute pass wins
    # (dispatch overhead beats the ring ladder at small N).  Exact either
    # way; this only picks the faster implementation.
    knn_grid_threshold: int = 4096
    # Per-step event-record capacity of the scanned rollout's event stream
    # (Simulation.run with listeners registered): the max spawned /
    # destroyed / waypoint-reached agents recorded per step.  A step
    # exceeding it raises (the listener contract is exact delivery,
    # lib.rs:151-153, 189-191).
    event_stream_capacity: int = 128

    @property
    def neighbor_capacity_limit(self) -> int:
        """The per-cell/tile occupancy above which truncation occurs for
        the configured backend (0 = unbounded, for brute)."""
        if self.neighbor_backend == BACKEND_GRID:
            return self.max_per_cell
        if self.neighbor_backend == BACKEND_GRID_PALLAS:
            return self.bucket_capacity
        # grid_dense has no per-tile cap; truncation there is column-
        # capacity overflow (dense_col_headroom), still surfaced through
        # neighbor_truncated.
        return 0

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def __post_init__(self):
        if self.neighbor_backend not in (
            BACKEND_BRUTE,
            BACKEND_GRID,
            BACKEND_GRID_PALLAS,
            BACKEND_GRID_DENSE,
            BACKEND_CUSTOM,
        ):
            raise ValueError(f"unknown neighbor backend {self.neighbor_backend!r}")
        if (
            self.neighbor_backend not in (BACKEND_BRUTE, BACKEND_CUSTOM)
            and self.grid is None
        ):
            raise ValueError("grid backends require a GridConfig")
        if self.on_truncation not in ("raise", "ignore"):
            raise ValueError(
                f"on_truncation must be 'raise' or 'ignore', "
                f"got {self.on_truncation!r}"
            )
        if self.on_out_of_bounds not in ("raise", "ignore"):
            raise ValueError(
                f"on_out_of_bounds must be 'raise' or 'ignore', "
                f"got {self.on_out_of_bounds!r}"
            )
        if self.sharding_invariance not in ("bitwise", "tolerance"):
            raise ValueError(
                f"sharding_invariance must be 'bitwise' or 'tolerance', "
                f"got {self.sharding_invariance!r}"
            )
