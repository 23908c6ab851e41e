"""Fused Zanlungo social-force Pallas TPU kernel.

Replaces the two hottest passes of the step — neighbor search
(lib.rs:277-279) and the Zanlungo force accumulation (zanlungo.rs:201-218)
— with ONE kernel that never materializes a candidate table in HBM.  The
jnp implementation (models/local.py + ops/grid.py) gathers ``[N, K]``
neighbor fields through HBM, which at 1M agents is gigabytes per step and
OOMs; this kernel streams agents through VMEM instead.

Layout ("cell list" in particle-code terms):

1.  The world is split into square *supertiles* of ``tile_size`` >= the
    maximum eyesight, arranged in a ``tx`` x ``ty`` grid, flat id
    ``t = tcx * ty + tcy`` (column-major, y minor).
2.  Agents are binned into per-tile *buckets* of ``bucket`` slots
    (sort-by-tile + rank; overflow agents spill to the EXACT repair pass
    — :func:`spill_patch` — when enabled, else keep their recommended
    velocity, loudly counted).
3.  All per-agent features are packed into one ``[tx*ty*bucket, F]`` f32
    array; empty slots hold sentinels (position 1e30 => distance-masked).
4.  Kernel grid = (tx, ty/strip_tiles): each program owns a *column
    strip* of ``strip_tiles`` tiles.  It DMAs its three whole-strip
    column segments (columns tcx-1, tcx, tcx+1 over tiles [py0-1,
    py0+strip+1)) HBM->VMEM ONCE, then loops over ``sub_tiles``-sized
    query sub-blocks, slicing each sub-block's three 128-slot halo
    windows out of VMEM (128-aligned read + ``pltpu.roll`` by the
    misalignment).  Per sub-block:
    - a cheap full-width pass computes the candidate masks (strict
      ``dist < eyesight``, matching location_hash_2d.rs:251, self and
      column checks);
    - the union of all queries' masked candidates (typically ~85 of the
      384 lanes) is gathered into <= 128 lanes by an EXACT one-hot MXU
      matmul, and the expensive math — the TTC quadratic + the Zanlungo
      force — runs once on the compacted lanes;
    - sub-blocks whose union overflows 128 lanes fall back to the
      full-width passes (dense hotspots; exact either way).
    Because ``tile_size >= eyesight``, every true neighbor of a query
    lies inside its windows.

Correctness notes:

- Window reads are 128-aligned (Mosaic requirement) and rolled to the
  true halo; an explicit candidate-column mask kills cross-column reads
  at world edges, so no pair is ever double-counted.
- Self-pairs are excluded by slot-id equality (slot ids are exact in f32
  up to 2^24 — capacity is asserted below that).
- Compaction matmuls use 0/1 weights with an exact 3-term bf16 split of
  the data operand (3 DEFAULT MXU passes): the gathered rows are BITWISE
  copies; the pure-0/1 rank matmul is exact in ONE DEFAULT pass.
- The force math mirrors models/local.py line for line (which itself
  carries the zanlungo.rs citations); the jnp version is the oracle in
  tests/test_zanlungo_pallas.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact import compact_indices

# Feature rows in the packed array.  Rows 0..7 are exactly the
# CANDIDATE-side features (what pair math reads about neighbors,
# zanlungo.rs:93-170): the force kernel's strip DMA, VMEM scratch and
# compaction matmuls move only this 8-row half — one (8, 128) Mosaic
# sublane tile — while queries read the full 16 from the untransposed
# array.  Keep any new candidate feature below NUM_CAND.
ROW_PX, ROW_PY = 0, 1       # position
ROW_VX, ROW_VY = 2, 3       # velocity
ROW_FX, ROW_FY = 4, 5       # committed preferred velocity (what neighbors
#                             observe — see models/local.py LocalPlanner)
ROW_PRIO = 6                # right-of-way priority
ROW_ID = 7                  # slot id (exact in f32; -1 = empty)
NUM_CAND = 8                # candidate rows: [0, NUM_CAND)
ROW_RX, ROW_RY = 8, 9       # recommended velocity (query side)
ROW_EYE = 10                # eyesight radius (query side)
ROW_SPX, ROW_SPY = 11, 12   # own fresh preferred velocity (query side)
ROW_ONE = 15                # constant 1.0 on real rows (fill counter)
# Padded to 16 rows: Mosaic requires DMA slice extents in the sublane
# dimension to align to the (8, 128) f32 tile.
NUM_F = 16

_POS_SENTINEL = 1e30


def zparams5(zp):
    """The kernel's 5-scalar prefetch vector — the ONE canonical
    stacking order (agent_scale, force_distance, agent_mass,
    agent_radius, force_cap) every caller must use; _make_kernel and
    _make_spill_kernel unpack positionally."""
    return jnp.stack([
        zp.agent_scale.astype(jnp.float32),
        zp.force_distance.astype(jnp.float32),
        zp.agent_mass.astype(jnp.float32),
        zp.agent_radius.astype(jnp.float32),
        zp.force_cap.astype(jnp.float32),
    ])


def sentinel_rows(n_rows: int):
    """[n_rows, NUM_F] empty-slot rows: far-away position sentinel, id
    -1, zeros elsewhere — what every packer/halo-exchanger must place in
    slots holding no agent (zeros would read as live agents at the
    origin)."""
    s = jnp.zeros((n_rows, NUM_F), jnp.float32)
    s = s.at[:, ROW_PX].set(_POS_SENTINEL)
    s = s.at[:, ROW_PY].set(_POS_SENTINEL)
    s = s.at[:, ROW_ID].set(-1.0)
    return s


@dataclasses.dataclass(frozen=True)
class BucketConfig:
    """Static geometry of the bucketed supertile layout."""

    tile_size: float
    offset: Tuple[float, float]
    tx: int            # supertile columns
    ty: int            # supertile rows, padded to a multiple of strip_tiles
    bucket: int        # agent slots per supertile
    strip_tiles: int   # tiles per kernel program (column strip)
    sub_tiles: int     # tiles per inner query sub-block

    @property
    def n_tiles(self) -> int:
        return self.tx * self.ty

    @property
    def slots(self) -> int:
        return self.n_tiles * self.bucket

    def __post_init__(self):
        assert self.strip_tiles % self.sub_tiles == 0
        assert self.ty % self.strip_tiles == 0
        assert self.tx >= 3 and self.ty >= 3, "world must span >= 3 tiles"
        # A candidate window spans sub_tiles + 2 tiles of one column; if
        # that exceeds the column itself, the window bleeds into
        # neighboring columns (the kernel's column mask handles overlap,
        # but coverage of the true halo would be lost).
        assert self.ty >= self.sub_tiles + 2, (
            "ty must be >= sub_tiles + 2 (window must fit in a column)"
        )
        # Mosaic alignment requirements (see _make_kernel):
        # - candidate DMA windows are lane-dim slices of the packed array;
        #   offsets/extents must be 128-aligned.  The kernel aligns the
        #   window start down to 128 and reads 2x128 lanes; full coverage
        #   of the (sub_tiles + 2)-tile halo needs its slot extent == 128.
        assert (self.sub_tiles + 2) * self.bucket == 128, (
            "(sub_tiles + 2) * bucket must equal 128"
        )
        assert self.bucket % 8 == 0, "bucket must be a multiple of 8"
        # - query/output slices ride the sublane dim (8-granular):
        assert (self.sub_tiles * self.bucket) % 8 == 0
        # - window clamping must preserve 128-alignment: a column must
        #   hold a whole number of 128-lane groups.
        assert (self.ty * self.bucket) % 128 == 0, (
            "ty * bucket must be a multiple of 128"
        )

    @classmethod
    def create(cls, width: float, height: float, offset: Tuple[float, float],
               max_eyesight: float, bucket: int = 16,
               strip_tiles: int = 96, sub_tiles: int | None = None,
               tile_size: float | None = None) -> "BucketConfig":
        """``tile_size`` defaults to the eyesight (the correctness
        minimum).  LARGER tiles with proportionally larger buckets reduce
        total pair work: pairs = slots * 384 and slots = area/tile^2 *
        bucket, so fill (= mean occupancy / bucket) is what matters —
        e.g. bucket=32 with tile ~= sqrt(17/density) keeps overflow
        < 0.1% at ~55% fill, ~1.9x fewer pairs than bucket=8 at
        tile == eyesight (31% fill).  Audit via the occupancy diagnostic:
        tiles above ``bucket`` silently drop the surplus agents."""
        if sub_tiles is None:
            sub_tiles = 128 // bucket - 2  # (sub + 2) * bucket == 128
        tile = max(float(tile_size or 0.0), float(max_eyesight), 1e-6)
        tx = max(3, int(math.ceil(width / tile)))
        ty = max(3, int(math.ceil(height / tile)))
        # Candidate windows must fit inside one column (see __post_init__);
        # padding tiles beyond the world stay empty and cost only memory.
        ty = max(ty, sub_tiles + 2)
        # ty must end up a multiple of both the strip and 128/bucket; pick
        # the strip as a multiple of lcm(sub_tiles, align) so the rounding
        # unit stays small (a naive strip choice can inflate ty several
        # fold and with it every padded bucket slot).
        align = max(1, 128 // bucket)
        base = sub_tiles * align // math.gcd(sub_tiles, align)
        strip_max = max(base, (strip_tiles // base) * base)
        ty_rounded = int(math.ceil(ty / base) * base)
        strip_max = min(strip_max, ty_rounded)
        # Among legal strips (multiples of base up to the requested size),
        # pick the one that pads ty least — every padded row costs bucket
        # slots and therefore kernel pair work (ties -> larger strip,
        # fewer programs).
        best = None
        for cand in range(base, strip_max + 1, base):
            padded = int(math.ceil(ty / cand) * cand)
            if best is None or padded < best[0] or (
                padded == best[0] and cand > best[1]
            ):
                best = (padded, cand)
        ty, strip = best
        return cls(tile_size=tile, offset=(float(offset[0]), float(offset[1])),
                   tx=tx, ty=ty, bucket=bucket, strip_tiles=strip,
                   sub_tiles=sub_tiles)


# ---------------------------------------------------------------------------
# jnp side: bucketize / unbucketize
# ---------------------------------------------------------------------------


def tile_key(cfg: BucketConfig, position, alive, col_clip=None):
    """Supertile sort key per agent: flat tile id, dead agents get the
    ``n_tiles`` sentinel so they sort last.  This is THE key the presorted
    step (core/step.py ``presort``) must order state by for
    ``bucketize(presorted=True)`` to be valid.

    ``col_clip``: optional (lo, hi) bounds for the tile COLUMN index
    (default (0, tx - 1) — the single-device edge clamp that matches
    ops/grid.py:48-52).  The world-sharded engine narrows this so
    out-of-world agents bin into the world's edge column rather than a
    shard-local halo column (parallel/worldstep.py)."""
    inv_tile = 1.0 / cfg.tile_size
    rel_x = (position[:, 0] - cfg.offset[0]) * inv_tile
    rel_y = (position[:, 1] - cfg.offset[1]) * inv_tile
    lo, hi = col_clip if col_clip is not None else (0, cfg.tx - 1)
    tcx = jnp.clip(jnp.floor(rel_x).astype(jnp.int32), lo, hi)
    tcy = jnp.clip(jnp.floor(rel_y).astype(jnp.int32), 0, cfg.ty - 1)
    tid = tcx * jnp.int32(cfg.ty) + tcy
    return jnp.where(alive, tid, jnp.int32(cfg.n_tiles))


def rank_from_sorted_key(cfg: BucketConfig, sorted_tid):
    """Rank-within-tile for a SORTED tile-key array (tile_key order) —
    the binning half of :func:`bucketize`, exposed so callers that keep
    state tile-sorted across steps (the skin-deferred presort,
    core/step.py) can reuse a carried binning instead of recomputing it.

    Returns (bpos_sorted [N] int32 — bucket slot per row, ``cfg.slots``
    for dead/overflow rows; max_occ [] int32 — saturates at bucket + 2;
    n_bucket_over [] int32 — alive rows beyond their tile's bucket).

    Rank is a WINDOWED count: the sort makes same-tile rows contiguous,
    so counting same-tid entries among the previous ``bucket + 1``
    positions equals the true rank for every in-bucket row and saturates
    (>= bucket) for overflow rows.  The bucket+1 shifted compares fuse
    into one elementwise pass; the associative-scan formulation this
    replaces cost ~26 ms at 1M (DESIGN_NOTES.md)."""
    n = sorted_tid.shape[0]
    t_sent = jnp.int32(cfg.n_tiles)
    w = cfg.bucket + 1
    padded = jnp.concatenate(
        [jnp.full((w,), -2, jnp.int32), sorted_tid]
    )
    rank = jnp.zeros((n,), jnp.int32)
    for k in range(1, w + 1):
        rank = rank + (padded[w - k:w - k + n] == sorted_tid).astype(
            jnp.int32
        )
    in_bucket = (sorted_tid < t_sent) & (rank < cfg.bucket)
    bpos_sorted = jnp.where(
        in_bucket, sorted_tid * jnp.int32(cfg.bucket) + rank,
        jnp.int32(cfg.slots),
    )
    max_occ = jnp.max(
        jnp.where(sorted_tid < t_sent, rank + 1, 0)
    ).astype(jnp.int32)
    n_bucket_over = jnp.sum(
        ((sorted_tid < t_sent) & ~in_bucket).astype(jnp.int32)
    ).astype(jnp.int32)
    return bpos_sorted, max_occ, n_bucket_over


def bucketize(cfg: BucketConfig, position, velocity, pref_committed,
              self_pref, priority, eyesight, rec_vel, alive,
              use_pack_kernel: bool = False, interpret: bool = False,
              presorted: bool = False, col_clip=None, binning=None):
    """Pack agent features into the bucketed layout.

    ``presorted``: the caller guarantees agents are already ordered by
    :func:`tile_key` (the presorted step keeps state that way with one
    sort-with-payloads per step, ~30 ms at 1M vs ~90 for this function's
    argsort + feature gather + inverse scatter — the measured XLA
    permutation-op floor, DESIGN_NOTES.md).  The sort, the feature-row
    gather AND the inverse scatter are then all skipped: ``bucket_pos``
    comes back in (sorted) agent order directly and is monotone.

    Returns (packed_t [slots, NUM_F] f32, packed_T [NUM_CAND, slots] f32
    — the candidate plane in the force kernel's strip-DMA orientation
    (emitted directly by the pack kernel; materializing it as an XLA
    transpose of packed_t costs ~9 ms at 1M), bucket_pos [N] int32 (==
    slots for dropped/dead agents), max_tile_occupancy [] int32, dropped
    [] int32 — alive agents not packed: bucket overflow (tile occupancy >
    ``cfg.bucket``) plus, on the pack-kernel path, rows whose slot-group
    window exceeded the kernel's streaming capacity.  Dropped agents keep
    their recommended velocity and vanish as force candidates — silent
    physics truncation, so callers must surface any nonzero count.)

    ``col_clip``: optional tile-column clip bounds for BINNING only (the
    packed position features keep ``position``) — see :func:`tile_key`.
    Used by the world-sharded engine to clamp out-of-world agents into
    the world's edge column exactly like the single-device tile clip
    while shard-local halo columns exist.

    ``binning``: optional (bpos_sorted [N] i32, max_occ [] i32,
    n_bucket_over [] i32) — a carried binning from
    :func:`rank_from_sorted_key`, valid only with ``presorted=True``
    while the sort order AND every agent's tile key are unchanged (the
    skin-deferred presort's contract, core/step.py).  Skips the key +
    rank computation entirely.
    """
    n = position.shape[0]
    assert n < (1 << 24), "slot ids must be exact in f32"

    if binning is not None:
        assert presorted, "binning reuse requires presorted state"
        order = None
        bpos_sorted, max_occ, n_bucket_over = binning
    else:
        key = tile_key(cfg, position, alive, col_clip=col_clip)
        if presorted:
            order = None
            sorted_tid = key
        else:
            order = jnp.argsort(key, stable=True).astype(jnp.int32)
            sorted_tid = key[order]
        bpos_sorted, max_occ, n_bucket_over = rank_from_sorted_key(
            cfg, sorted_tid
        )

    # Feature columns in agent order ([N] each).  The pack-kernel path
    # stacks them TRANSPOSED ([NUM_F, N], axis-0 stack of 1-D rows — no
    # cross-axis relayout, unlike a [N, NUM_F].T which costs ~9 ms at
    # 1M); the XLA-scatter fallback stacks row-major for its row scatter.
    f32 = jnp.float32
    px_col = position[:, 0].astype(f32)
    py_col = position[:, 1].astype(f32)
    id_col = jnp.arange(n, dtype=f32)
    if binning is not None:
        # Fresh-dead masking (carried binning only): an agent that died
        # since the carried sort (despawn, or a migration departure on
        # the world-sharded engine) still owns its carried bucket slot —
        # pack it INERT (position sentinel, id -1) so it cannot act as a
        # force candidate or a window query.  Callers may therefore keep
        # the carry across deaths (core/step skin_mode,
        # parallel/worldstep tolerance mode).  On the fresh-sort paths
        # dead agents get the tile sentinel key and are never packed.
        px_col = jnp.where(alive, px_col, _POS_SENTINEL)
        py_col = jnp.where(alive, py_col, _POS_SENTINEL)
        id_col = jnp.where(alive, id_col, -1.0)
    cols = [
        px_col,
        py_col,
        velocity[:, 0].astype(f32),
        velocity[:, 1].astype(f32),
        pref_committed[:, 0].astype(f32),
        pref_committed[:, 1].astype(f32),
        priority.astype(f32),
        id_col,
        rec_vel[:, 0].astype(f32),
        rec_vel[:, 1].astype(f32),
        eyesight.astype(f32),
        self_pref[:, 0].astype(f32),
        self_pref[:, 1].astype(f32),
        jnp.zeros((n,), f32),  # row 13: bucket slot (set post-sort)
        jnp.zeros((n,), f32),  # row 14: padding (16-row Mosaic tile)
        jnp.ones((n,), f32),   # row 15: 1.0 (pack-kernel hit counter)
    ]

    if use_pack_kernel:
        # MXU one-hot pack kernel (ops/pack_pallas.py): replaces the XLA
        # row scatter, whose ~137 ns/row overhead dominates bucketize.
        from .pack_pallas import ROW_BPOS, pack_rows_pallas

        if presorted:
            cols[ROW_BPOS] = bpos_sorted.astype(f32)
            feat_t = jnp.stack(cols, axis=0)  # [NUM_F, N], no transpose
        else:
            # Row gathers need row-major data; gather, set the slot
            # column IN SORTED ORDER, then transpose (non-production
            # path — production presorts, see step.py).
            feat = jnp.stack(cols, axis=-1)[order]
            feat = feat.at[:, ROW_BPOS].set(bpos_sorted.astype(f32))
            feat_t = feat.T
        packed_t, packed_T, pack_overflow = pack_rows_pallas(
            feat_t, bpos_sorted, cfg.slots, interpret=interpret
        )
    else:
        pack_overflow = jnp.zeros((), jnp.int32)
        feat = jnp.stack(cols, axis=-1)  # [N, NUM_F]
        feat_sorted = feat if presorted else feat[order]  # row gather
        sentinel = jnp.zeros((1, NUM_F), f32)
        sentinel = sentinel.at[0, ROW_PX].set(_POS_SENTINEL)
        sentinel = sentinel.at[0, ROW_PY].set(_POS_SENTINEL)
        sentinel = sentinel.at[0, ROW_ID].set(-1.0)
        packed_t = jnp.broadcast_to(sentinel, (cfg.slots, NUM_F))
        packed_t = packed_t.at[bpos_sorted].set(feat_sorted, mode="drop")
        packed_T = packed_t[:, :NUM_CAND].T

    if presorted:
        bucket_pos = bpos_sorted  # agent order == sorted order; monotone
    else:
        bucket_pos = (
            jnp.full((n,), cfg.slots, jnp.int32).at[order].set(bpos_sorted)
        )
    dropped = (n_bucket_over + pack_overflow).astype(jnp.int32)
    return packed_t, packed_T, bucket_pos, max_occ, dropped


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _pair_ttc(qvx, qvy, qpx, qpy, cvx, cvy, cpx, cpy, radius):
    """Pairwise time-to-collision [Q, C] (zanlungo.rs:49-74; see
    models/local.py time_to_collision for the branch semantics).

    Half-b formulation: roots = (-bh -+ sqrt(bh^2 - a c)) / a, which
    drops the 2.0* / 4.0* scalings exactly (disc scales by the exact
    factor 4), and root SIGNS are decided on the numerators (a > 0 on
    every live lane), saving one [Q, C] multiply and two compares vs
    the literal quadratic — ULP-level differences only."""
    rvx = cvx - qvx
    rvy = cvy - qvy
    rpx = cpx - qpx
    rpy = cpy - qpy
    a = rvx * rvx + rvy * rvy
    bh = rvx * rpx + rvy * rpy
    c = rpx * rpx + rpy * rpy - radius * radius
    disc4 = bh * bh - a * c
    safe_a = jnp.where(a > 0, a, 1.0)
    sq = jnp.sqrt(jnp.maximum(disc4, 0.0))
    num0 = -bh - sq   # <= num1 (sq >= 0)
    num1 = -bh + sq
    inf = jnp.float32(jnp.inf)
    res_num = jnp.where(
        (num0 < 0) & (num1 > 0), 0.0,
        jnp.where(num0 > 0, num0, jnp.where(num1 > 0, num1, inf)),
    )
    res = res_num * (1.0 / safe_a)
    res = jnp.where(disc4 < 0, inf, res)
    return jnp.where(a > 0, res, inf), (rpx * rpx + rpy * rpy)


_HALF_PI = 1.5707963267948966


def _asin01(x):
    """arcsin on [0, 1] as polynomials (Pallas TPU has no asin lowering).

    Maclaurin series x*P(x^2) for x <= 0.5; the half-angle identity
    ``asin(x) = pi/2 - 2 asin(sqrt((1-x)/2))`` maps (0.5, 1] back onto
    [0, 0.5].  Max abs error ~5e-7 — below the f32 noise of the force sum.
    """
    # asin series coefficients (2k)! / (4^k (k!)^2 (2k+1)), k = 0..6.
    def poly(z):
        u = z * z
        p = 0.0173527
        p = p * u + 0.0223721
        p = p * u + 0.0303819
        p = p * u + 0.0446429
        p = p * u + 0.075
        p = p * u + 0.16666667
        p = p * u + 1.0
        return z * p

    small = x <= 0.5
    s = jnp.sqrt(jnp.maximum((1.0 - x) * 0.5, 0.0))
    return jnp.where(small, poly(x), _HALF_PI - 2.0 * poly(s))


def _sin0hp(x):
    """sin on [0, pi/2] via a degree-11 odd Taylor polynomial (max abs
    error ~6e-9; Pallas TPU sin lowering is avoided for portability)."""
    u = x * x
    p = -2.50521084e-08
    p = p * u + 2.75573192e-06
    p = p * u - 1.98412698e-04
    p = p * u + 8.33333333e-03
    p = p * u - 1.66666667e-01
    p = p * u + 1.0
    return x * p


def _pair_force(zp, t_i, qpx, qpy, qvx, qvy, qspx, qspy, qprio,
                cpx, cpy, cvx, cvy, cfx, cfy, cprio, mask,
                int_prio: bool = False, inv_t=None):
    """Pairwise force [Q, C] given per-query min TTC ``t_i`` [Q, 1]
    (zanlungo.rs:93-198; mirrors models/local.py zanlungo_velocity).

    Divisions by per-query (t_i) and scalar (force_distance) values are
    hoisted to reciprocals outside the [Q, C] pair math — VPU divides
    are multi-op and the kernel is instruction-rate bound.

    ``int_prio`` (static): the caller guarantees every pair's priority
    difference is an INTEGER — the reference's default, where priority
    is the agent id (zanlungo.rs:94-98, 183-184).  Then ``row =
    clip(qprio - cprio, -1, 1)`` is exactly -1, 0 or +1, and the
    right-of-way math collapses: ``sqrt(|row|) == |row|``, the velocity
    mixing becomes selects (``mv == qv`` wherever the force is nonzero;
    ``ov == pref`` on full right-of-way), and the slerp's
    ``t = weight - 1`` is exactly 1, so ``sin((1-t)theta) == 0`` and the
    slerped direction IS the perp vector — the asin/sin polynomials
    (_asin01/_sin0hp, ~55 VPU ops/pair) drop out.  Tolerance-equal to
    the general path (ULP differences from the dropped no-op
    arithmetic, e.g. ``cv + 1.0*(cf - cv)`` vs ``cf``)."""
    agent_scale, force_distance, _mass, radius, force_cap = zp

    # right_of_way_vel (zanlungo.rs:173-198); sqrt(|row|) computed once
    row = jnp.clip(qprio - cprio, -1.0, 1.0)
    neg_row = row < 0
    if int_prio:
        # row in {-1, 0, 1}: sign(row)*sqrt(|row|) == row; r2p/r2n are
        # 0/1 indicators.  pos_row pairs (query outranks candidate) have
        # weight == 0 => an EXACT zero contribution on both paths, so
        # mv == qv everywhere the force survives.
        w = row
        mvx, mvy = qvx, qvy
        ovx = jnp.where(neg_row, cfx, cvx)
        ovy = jnp.where(neg_row, cfy, cvy)
    else:
        r2 = jnp.sqrt(jnp.abs(row))
        r2n = jnp.where(row < 0, r2, 0.0)
        r2p = jnp.where(row > 0, r2, 0.0)
        w = jnp.sign(row) * r2  # == the reference's three-way select
        pos_row = row > 0
        mvx = jnp.where(pos_row, qvx + r2p * (qspx - qvx), qvx)
        mvy = jnp.where(pos_row, qvy + r2p * (qspy - qvy), qvy)
        ovx = jnp.where(neg_row, cvx + r2n * (cfx - cvx), cvx)
        ovy = jnp.where(neg_row, cvy + r2n * (cfy - cvy), cvy)

    weight = 1.0 - w
    fut_x = qpx + mvx * t_i
    fut_y = qpy + mvy * t_i
    ofut_x = cpx + ovx * t_i
    ofut_y = cpy + ovy * t_i
    dx = fut_x - ofut_x
    dy = fut_y - ofut_y
    dist = jnp.sqrt(dx * dx + dy * dy)  # captured pre-slerp (zanlungo.rs:112)

    # "other has right of way" slerp branch (zanlungo.rs:113-151)
    pref_speed2 = cfx * cfx + cfy * cfy
    stationary = pref_speed2 < 1e-8  # |pref| < 1e-4 (zanlungo.rs:116)
    crx = qpx - cpx
    cry = qpy - cpy
    perp_sx = -cry
    perp_sy = crx
    flip_s = (perp_sx * qvx + perp_sy * qvy) < 0
    perp_sx = jnp.where(flip_s, -perp_sx, perp_sx)
    perp_sy = jnp.where(flip_s, -perp_sy, perp_sy)
    perp_mx = -cfy
    perp_my = cfx
    flip_m = (perp_mx * dx + perp_my * dy) < 0
    perp_mx = jnp.where(flip_m, -perp_mx, perp_mx)
    perp_my = jnp.where(flip_m, -perp_my, perp_my)
    moving_interp = (cfx * dx + cfy * dy) > 0
    # == where(stationary, True, moving_interp); bool selects hit an
    # unsupported i8->i1 truncation in Mosaic, plain logic doesn't.
    interpolate = stationary | moving_interp
    perp_x = jnp.where(stationary, perp_sx, perp_mx)
    perp_y = jnp.where(stationary, perp_sy, perp_my)

    if int_prio:
        # t = weight - 1 == 1 on live slerp lanes: sin((1-t)theta) == 0
        # exactly (the general path's _sin0hp(0) is exactly 0 too) and
        # sin(t*theta) == sin_theta > 0 — the slerped vector is
        # perp * sin_theta, consumed only as a unit direction below, so
        # the positive sin_theta factor cancels and the direction IS
        # perp.  sin_theta survives only as the degenerate-branch test.
        cross = perp_x * dy - perp_y * dx
        slerp_live = neg_row & interpolate & (jnp.abs(cross) > 0)
        dx = jnp.where(slerp_live, perp_x, dx)
        dy = jnp.where(slerp_live, perp_y, dy)
    else:
        sin_theta = jnp.minimum(jnp.abs(perp_x * dy - perp_y * dx), 1.0)
        theta = _asin01(sin_theta)
        t_s = weight - 1.0
        # (1-t)theta and t*theta both lie in [0, pi/2]: t in (0, 1]
        # whenever the slerp branch is live (weight in (1, 2],
        # zanlungo.rs:152).  The reference's 1/sin(theta) slerp
        # normalization (zanlungo.rs:27) is a POSITIVE scalar on the
        # slerped vector, and the vector is only ever consumed as a unit
        # direction below — the factor cancels, so the [Q, C] divide is
        # dropped (direction identical to f32 noise).
        s0 = _sin0hp(jnp.clip((1.0 - t_s) * theta, 0.0, _HALF_PI))
        s1 = _sin0hp(jnp.clip(t_s * theta, 0.0, _HALF_PI))
        # One fused select: slerp applies only when live AND sin > 0 (the
        # reference keeps dx on the degenerate sin == 0 branch).
        slerp_live = (weight > 1.0) & interpolate & (sin_theta > 0)
        dx = jnp.where(slerp_live, dx * s0 + perp_x * s1, dx)
        dy = jnp.where(slerp_live, dy * s0 + perp_y * s1, dy)

    d2n = dx * dx + dy * dy
    inv_d = jnp.where(d2n > 0, jax.lax.rsqrt(jnp.where(d2n > 0, d2n, 1.0)),
                      0.0)
    ux = dx * inv_d
    uy = dy * inv_d

    surface_dist = dist - 2.0 * radius
    sdx = mvx - ovx
    sdy = mvy - ovy
    speed_diff = jnp.sqrt(sdx * sdx + sdy * sdy)
    if inv_t is None:
        inv_t = 1.0 / jnp.where(t_i > 0, t_i, 1.0)  # [Q, 1]: one div/query
    magnitude = weight * agent_scale * speed_diff * inv_t
    inf = jnp.float32(jnp.inf)
    magnitude = jnp.where((t_i == 0) & (speed_diff * weight > 0), inf,
                          magnitude)
    magnitude = jnp.minimum(magnitude, force_cap)
    falloff = jnp.exp(surface_dist * (-1.0 / force_distance))  # scalar div
    scale = magnitude * falloff
    # Select AFTER the multiply: masked lanes hold sentinel-driven inf/NaN
    # garbage that must never leak through arithmetic (ux itself is NaN on
    # sentinel lanes: d2n overflows to inf, inv_d == 0, inf * 0) — folding
    # the mask into `scale` alone would leak NaN via ux * 0.
    return (jnp.where(mask, ux * scale, 0.0),
            jnp.where(mask, uy * scale, 0.0))


def _strip_shifts(cfg: BucketConfig) -> Tuple[int, ...]:
    """Trace-time enumeration of every window misalignment (``shift =
    (halo_start - strip_base) mod 128``) the kernel can encounter, over
    all (program, sub-block) pairs — both ranges are static.  Small by
    construction: interior sub-blocks cycle through ``128 /
    gcd(sub_q, 128)`` phases and the world-edge clamps add at most a
    couple more (0 at the bottom, one clipped value at the top)."""
    strip, qb, B = cfg.strip_tiles, cfg.sub_tiles, cfg.bucket
    C = 128
    col_slots = cfg.ty * B
    W_EXT = min((((strip + 2) * B + 127) // 128) * 128 + 128, col_slots)
    n_strips = cfg.ty // strip
    shifts = set()
    for ps in range(n_strips):
        py0 = ps * strip
        base = min(max(((py0 * B - B) // 128) * 128, 0),
                   col_slots - W_EXT)
        for s in range(strip // qb):
            g = min(max((py0 + s * qb - 1) * B, 0), col_slots - C)
            off = g - base
            assert 0 <= off <= W_EXT - C, (off, W_EXT)
            shifts.add(off % 128)
    return tuple(sorted(shifts))


def _make_kernel(cfg: BucketConfig,
                 compact_pass2: bool = True,
                 int_prio: bool = False,
                 dual_row: bool = False,
                 spill_lanes: int = 0,
                 unroll: int = 1):
    strip, qb, B = cfg.strip_tiles, cfg.sub_tiles, cfg.bucket
    q_len = strip * B
    sub_q = qb * B
    # Dual-row segmented compaction needs an 8-aligned half split.
    dual_row = bool(dual_row and compact_pass2 and sub_q % 16 == 0)
    sub_c = (qb + 2) * B
    nsub = strip // qb
    slots = cfg.slots
    ty, tx = cfg.ty, cfg.tx

    C = 128        # compute width: the true (sub_tiles + 2)-tile halo
    # Fused spill lanes (spill_lanes == C so every compaction segment is
    # one 128-lane window and the [C, C] tri matrix is shared): bucket-
    # overflow agents ride a FOURTH candidate segment on flagged
    # sub-blocks — see zanlungo_fused's fused-spill block.
    assert spill_lanes in (0, C), spill_lanes
    col_slots_s = ty * B
    # Strip-resident segment: tiles [py0 - 1, py0 + strip + 1) plus
    # alignment slack, clamped to the column.
    W_EXT = min((((strip + 2) * B + 127) // 128) * 128 + 128, col_slots_s)
    # Possible window misalignments (static set, usually 2-4 values):
    # each program pre-rolls one strip copy per phase so sub-blocks read
    # their 128-lane halo at a 128-ALIGNED offset of the right copy —
    # no per-sub-block pltpu.roll (a dynamic roll is a multi-stage
    # lane-shift network, ~86k instances/step at 1M) and half the slice
    # width of the old aligned-256-read-then-roll scheme.
    PHASES = _strip_shifts(cfg)

    # Pre-rolled copy table: one slot per phase, plus a DMA landing slot
    # when no phase is 0 (phase-0's copy IS the raw strip).
    if 0 in PHASES:
        N_COPIES = len(PHASES)
        LAND = PHASES.index(0)
    else:
        N_COPIES = len(PHASES) + 1
        LAND = len(PHASES)

    n_strips_k = ty // strip

    def _body(zp_ref, cnt_ref, sflag_ref, packed_any, qt_ref, sp_ref,
              out_ref, strips_r, sem):
        # cnt_ref: [n_blocks] i32 scalar-prefetch — live-query count per
        # sub-block (contiguous slot ranges; computed from the transposed
        # plane's ID row by the wrapper).  Occupancy-adaptive execution:
        # a sub-block with no live queries skips its entire pipeline, and
        # a program whose strip has none skips the DMAs and pre-rolls
        # too, so kernel work scales with OCCUPIED area, not world area
        # (zero effect on uniformly-dense scenes; large on sparse or
        # clustered worlds).  Skipped sub-blocks leave garbage in their
        # output rows — only live agents' slots are ever gathered back.
        #
        # Alignment strategy (Mosaic tiles every memref (8, 128), even in
        # HBM, and requires 128-aligned lane offsets AND extents):
        #   - candidate windows are lane-dim DMA slices of the packed
        #     array, aligned DOWN to 128 and widened to 256 lanes; the
        #     true (sub_tiles + 2)-tile halo (== 128 slots, asserted) is
        #     always covered.  After the DMA the window is ROLLED by the
        #     misalignment so pair math runs on exactly the 128 true halo
        #     lanes — half the VPU work of computing on the widened
        #     window.  Cross-column bleed at world edges is killed by an
        #     explicit candidate-column mask;
        #   - queries/outputs ride the SUBLANE dim of transposed arrays
        #     ([slots, NUM_F] / [slots, 2]) where bucket-granular offsets
        #     (multiples of 8) are legal.
        # strips_r: [3, N_COPIES, NUM_CAND, W_EXT] strip-resident column
        # segments — only the 8 candidate feature rows (one Mosaic
        # sublane tile); query-side rows never ride the candidate
        # strips.  Copy LAND is the raw DMA landing; the other slots
        # hold the segment pre-rolled left by each phase in PHASES, so a
        # sub-block with misalignment ``shift`` reads its true 128-lane
        # halo as ONE 128-aligned slice of the matching copy.
        px = pl.program_id(0)
        ps = pl.program_id(1)
        py0 = ps * strip

        zp = (zp_ref[0], zp_ref[1], zp_ref[2], zp_ref[3], zp_ref[4])
        radius = zp_ref[3]
        col_slots = ty * B

        cnt_base = (px * n_strips_k + ps) * nsub
        strip_live = jnp.int32(0)
        for _s in range(nsub):
            strip_live = strip_live + cnt_ref[cnt_base + _s]

        # ---- strip-resident candidate segments: ONE DMA set per program
        # (three whole-strip column segments), not three per sub-block —
        # per-transfer DMA latency at ~2 us dominated the kernel when
        # issued 3x per 64-query sub-block (measured ~60 of 82 ms at 1M).
        # NOTE: double-buffering these across the sequential grid (each
        # program prefetching its successor's strips) measured EXACTLY
        # cost-neutral at 1M (45.9 vs 45.9 ms) — the blocking wait is off
        # the critical path at ~720 programs; don't retry.
        # Column-local aligned base covering tiles [py0 - 1, py0 + strip
        # + 1) (clipped; W_EXT is sized for the worst misalignment).
        base_l = jnp.clip(((py0 * B - B) // 128) * 128, 0,
                          col_slots - W_EXT)
        base_l = pl.multiple_of(base_l, 128)

        def strip_dma(k):
            c = jnp.clip(px + (k - 1), 0, tx - 1)
            abs_base = pl.multiple_of(c * col_slots + base_l, 128)
            return pltpu.make_async_copy(
                packed_any.at[:, pl.ds(abs_base, W_EXT)],
                strips_r.at[k, LAND],
                sem.at[k],
            )

        @pl.when(strip_live > 0)
        def _dma_and_preroll():
            for k in range(3):
                strip_dma(k).start()
            for k in range(3):
                strip_dma(k).wait()

            # Pre-roll once per program: STATIC-shift rolls (plain
            # shifted copies, no dynamic lane-shift network).
            # ``roll(x, W_EXT - v)`` puts source lane ``i + v`` at lane
            # ``i``; sub-blocks never read past ``W_EXT - v`` lanes
            # (asserted in _strip_shifts), so the wrapped tail is never
            # consumed.
            for k in range(3):
                for p, v in enumerate(PHASES):
                    if p == LAND or v == 0:
                        continue
                    strips_r[k, p] = pltpu.roll(
                        strips_r[k, LAND], W_EXT - v, axis=1
                    )

        def win_true_start_l(s):
            # Column-local unaligned halo start: tiles [py0 + s*qb - 1,
            # +qb+2), clipped into the column.  Edge clipping shifts the
            # window onto existing tiles of the SAME column (extra tiles
            # are distance-masked; out-of-world columns are killed by the
            # candidate-column mask).
            return jnp.clip((py0 + s * qb - 1) * B, 0, col_slots - C)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        if compact_pass2:
            # Strict-lower-triangular 0/1 matrix for the exclusive prefix
            # count (built once per program, reused across sub-blocks).
            # SEGMENTED per window: a [C, C] triangle applied per 128-lane
            # window plus row-sum carry offsets is exact (integer counts
            # in f32) and runs 3 MXU tile-ops instead of the full
            # [3C, 3C] triangle's 9 (3 K-tiles x 3 N-tiles).
            # NOTE: a log-shift Hillis-Steele prefix was measured SLOWER
            # (85 vs 74 ms at 1M) — VPU lane-shift networks lose to the
            # MXU even at M=1; don't retry.
            ci = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
            rj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
            tri = (ci < rj).astype(jnp.float32)

        if spill_lanes:
            # Fused-spill candidate plane: [NUM_CAND, spill_lanes] f32,
            # read once per program (id -1 on dead lanes).  sflag_ref
            # [n_blocks] i32 marks sub-blocks with a live spill within
            # one tile (Chebyshev) of a query tile — only those pay the
            # fourth compaction segment (~1-2% of sub-blocks at bench
            # spill counts).
            sp_feat = sp_ref[...]
            sp_ok = sp_feat[ROW_ID:ROW_ID + 1, :] >= 0

        def sub_block(s, _):
            @pl.when(cnt_ref[cnt_base + s] > 0)
            def _live_sub_block():
                _sub_block_body(s)
            return 0

        def _sub_block_body(s):
            # Slice each sub-block's halo window from the pre-rolled
            # strip copy matching its misalignment: one 128-aligned
            # 128-lane read, lanes [0, C) = exactly the true halo.
            g_l = win_true_start_l(s)
            off = g_l - base_l                     # bucket-granular, >= 0
            off_al = pl.multiple_of((off // 128) * 128, 128)
            shift = off - off_al                   # in PHASES (static set)
            if len(PHASES) == 1:
                pidx = jnp.int32(PHASES.index(PHASES[0]))
            else:
                pidx = jnp.int32(0)
                for p, v in enumerate(PHASES[1:]):
                    pidx = pidx + (
                        shift >= jnp.int32(v)
                    ).astype(jnp.int32)
            g_cls = []
            rolled = []
            for k in range(3):
                w = strips_r[k, pidx, :, pl.ds(off_al, C)]
                # Absolute slot of lane 0 (for the column mask).
                g_cls.append(
                    jnp.clip(px + (k - 1), 0, tx - 1) * col_slots + g_l
                )
                rolled.append(w)

            q0 = s * sub_q

            # Query features: ONE [sub_q, NUM_F] block read, then STATIC
            # [sub_q, 1] column slices (queries in sublanes, candidates
            # in lanes: pair matrices are [Q, C]).  Measured EXACTLY
            # cost-neutral vs eleven separate dynamic-offset [sub_q, 1]
            # slices (perf/adaptive_ab.py A/B, bitwise parity) — Mosaic
            # already folded the per-slice work; kvar2 stage 3's +3.9 ms
            # is the query-broadcast relayouts, which remain either way.
            # Kept for the single-read clarity, not speed.
            qblk = qt_ref[pl.ds(q0, sub_q), :]

            def qrow(r):
                return qblk[:, r:r + 1]

            qpx_, qpy_ = qrow(ROW_PX), qrow(ROW_PY)
            qvx_, qvy_ = qrow(ROW_VX), qrow(ROW_VY)
            qprio_ = qrow(ROW_PRIO)
            qeye_ = qrow(ROW_EYE)
            qid_ = qrow(ROW_ID)
            qspx_, qspy_ = qrow(ROW_SPX), qrow(ROW_SPY)

            # Candidate features: [1, C] lane rows of the rolled windows.
            def crow(k, r):
                return rolled[k][r:r + 1, :C]

            inf = jnp.float32(jnp.inf)

            def lane_ok_k(k):
                # World-edge clipping may shift the window into a
                # neighboring column; only candidates from column
                # px+k-1 are real (also masks out-of-world columns).
                cid_ = crow(k, ROW_ID)
                cand_slot = g_cls[k] + lane_iota
                lo = (px + (k - 1)) * col_slots
                return (
                    (cand_slot >= lo) & (cand_slot < lo + col_slots)
                    & (cid_ >= 0)
                )                                    # [1, C]

            lane_oks = [lane_ok_k(k) for k in range(3)]

            # Candidate segments: the three 128-lane windows, plus (on
            # flagged sub-blocks) the fused spill plane as a FOURTH
            # 128-lane segment — bucket-overflow agents become ordinary
            # candidates absorbed by the same bbox/rank/compaction
            # machinery (each segment is C lanes, so the [C, C] tri and
            # every per-segment pass are shape-uniform).
            segs3 = [(rolled[k], lane_oks[k]) for k in range(3)]

            def srow(seg, r):
                return seg[0][r:r + 1, :]

            def window_masks(segs):
                """Full-width candidate masks per segment — FALLBACK-only
                (union overflow): the compacted tiers never pay the
                [sub_q, 3C] distance pass; their unions come from the
                [1, 3C] bbox test below and exact per-pair masks are
                recomputed on the compacted lanes."""
                masks = []
                for sg in segs:
                    cpx_, cpy_ = srow(sg, ROW_PX), srow(sg, ROW_PY)
                    cid_ = srow(sg, ROW_ID)
                    dx = cpx_ - qpx_
                    dy = cpy_ - qpy_
                    dist2 = dx * dx + dy * dy
                    masks.append(
                        (dist2 < qeye_ * qeye_)
                        & (cid_ != qid_)
                        & sg[1]
                    )
                return masks

            def bbox_union(q_sl, segs):
                """Candidate-union SUPERSET for the query rows ``q_sl``
                (a static slice) at [1, 3C] cost instead of the exact
                union's [len(q_sl), 3C] mask pass: a candidate within
                strict eyesight of SOME live query is within max-eyesight
                of the live queries' bounding box (dist(c, bbox) <=
                dist(c, q) for every q in the bbox).  The superset only
                widens the compacted plane (queries keep exact per-pair
                masks there) and can tip a near-full union into the
                full-width fallback — exact either way.  At bench
                density the dilated-bbox set ~= the exact union anyway
                (queries fill their tiles ~uniformly)."""
                live = qid_[q_sl] >= 0               # [h, 1]
                big = jnp.float32(1e30)

                def mn(v):
                    # keepdims: the [1, 1] result broadcasts into the
                    # [1, C] compares below as a vector op — a reduction
                    # to a true scalar would round-trip through an sreg.
                    return jnp.min(v, axis=0, keepdims=True)

                def mx(v):
                    return jnp.max(
                        jnp.where(live, v, -big), axis=0, keepdims=True
                    )

                # Dead query slots hold the position sentinel (+1e30),
                # which min() ignores for free; max needs the live select.
                lo_x, hi_x = mn(qpx_[q_sl]), mx(qpx_[q_sl])
                lo_y, hi_y = mn(qpy_[q_sl]), mx(qpy_[q_sl])
                # Dead slots carry eyesight 0 — max() is naturally safe.
                eye = jnp.max(qeye_[q_sl], axis=0, keepdims=True)
                eye2 = eye * eye
                parts = []
                for sg in segs:
                    cpx_, cpy_ = srow(sg, ROW_PX), srow(sg, ROW_PY)
                    dx = jnp.maximum(
                        jnp.maximum(lo_x - cpx_, cpx_ - hi_x), 0.0
                    )
                    dy = jnp.maximum(
                        jnp.maximum(lo_y - cpy_, cpy_ - hi_y), 0.0
                    )
                    parts.append(jnp.where(
                        sg[1] & (dx * dx + dy * dy < eye2),
                        1.0, 0.0,
                    ))
                return jnp.concatenate(parts, axis=1)  # [1, nseg*C] 0/1

            def write_out(t_i, fx, fy):
                # Forces apply only when some neighbor has finite TTC
                # (zanlungo.rs:211); output = rec + force / mass.
                has = jnp.isfinite(t_i)
                inv_mass = 1.0 / zp[2]
                rx = qrow(ROW_RX)
                ry = qrow(ROW_RY)
                out_x = rx + jnp.where(has, fx * inv_mass, 0.0)
                out_y = ry + jnp.where(has, fy * inv_mass, 0.0)
                out_ref[pl.ds(q0, sub_q), 0:1] = out_x
                out_ref[pl.ds(q0, sub_q), 1:2] = out_y

            def full_passes(segs):
                # ---- full-width TTC (zanlungo.rs:76-91) + force
                # accumulation (zanlungo.rs:201-218) over the segments.
                masks = window_masks(segs)
                t_i = jnp.full((sub_q, 1), inf, jnp.float32)
                for k, sg in enumerate(segs):
                    cpx_, cpy_ = srow(sg, ROW_PX), srow(sg, ROW_PY)
                    cvx_, cvy_ = srow(sg, ROW_VX), srow(sg, ROW_VY)
                    ttc, _ = _pair_ttc(qvx_, qvy_, qpx_, qpy_,
                                       cvx_, cvy_, cpx_, cpy_, radius)
                    ttc = jnp.where(masks[k], ttc, inf)
                    t_i = jnp.minimum(
                        t_i, jnp.min(ttc, axis=1, keepdims=True)
                    )
                fx = jnp.zeros((sub_q, 1), jnp.float32)
                fy = jnp.zeros((sub_q, 1), jnp.float32)
                for k, sg in enumerate(segs):
                    cpx_, cpy_ = srow(sg, ROW_PX), srow(sg, ROW_PY)
                    cvx_, cvy_ = srow(sg, ROW_VX), srow(sg, ROW_VY)
                    cfx_, cfy_ = srow(sg, ROW_FX), srow(sg, ROW_FY)
                    cprio_ = srow(sg, ROW_PRIO)
                    pfx, pfy = _pair_force(
                        zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_,
                        qprio_, cpx_, cpy_, cvx_, cvy_, cfx_, cfy_, cprio_,
                        masks[k], int_prio=int_prio,
                    )
                    fx = fx + jnp.sum(pfx, axis=1, keepdims=True)
                    fy = fy + jnp.sum(pfy, axis=1, keepdims=True)
                write_out(t_i, fx, fy)

            # ---- COMPACTED passes: the ~8 true neighbors per query are
            # a sliver of the 3*C candidate lanes, so full-width math is
            # VPU-instruction waste.  Gather the union of every query's
            # masked candidates into <= C lanes with an exact one-hot MXU
            # matmul (0/1 weights, exact 3-term bf16 split — bitwise, as
            # ops/pack_pallas.py), then run BOTH the TTC quadratic and
            # the force math once over [sub_q, C] instead of 3x.  Union
            # overflow (> C candidates, dense hotspots) falls back to the
            # full-width passes for this sub-block — exactness either way.
            #
            # ``dual_row`` adds a third, narrower tier that runs FIRST
            # when it fits: the sub-block's two query half-groups (tile-
            # contiguous, so each half's candidate union is one dilated-
            # tile footprint instead of two) are compacted into two
            # dynamically-split SEGMENTS ([0, c0) and [c0, c0 + c1)) of
            # the same C-lane plane, and the pair math runs on
            # [sub_q/2, C] rows serving TWO queries each (query features
            # selected per lane segment) — half the force/TTC width.
            # Candidates within eyesight of both halves are duplicated
            # into both segments (their pair masks need them); per-query
            # sums therefore hold the same addends, though the reduction
            # tree groups them differently (ULP-level vs the shared path
            # — tolerance-tested, like oracle parity).
            def tier_section(segs):
                nseg = len(segs)
                if not compact_pass2:
                    full_passes(segs)
                    return
                _compacted_tiers(segs, nseg)

            def _compacted_tiers(segs, nseg):
                if dual_row:
                    H = sub_q // 2
                    u0 = bbox_union(slice(0, H), segs)      # [1, nseg*C]
                    u1 = bbox_union(slice(H, sub_q), segs)
                    # Exact 0/1 union: avoids a bool select (i1 relayout).
                    u = u0 + u1 - u0 * u1                   # [1, nseg*C]
                    c0 = jnp.sum(u0)
                    c1 = jnp.sum(u1)
                else:
                    u = bbox_union(slice(0, sub_q), segs)   # [1, nseg*C]
                count = jnp.sum(u)

                def tri_rank(uv):
                    # Exclusive prefix count via triangular matmul (exact
                    # integer counts in f32): rank[r] = #union lanes
                    # before r.  DEFAULT precision is EXACT here: both
                    # operands are 0/1 (lossless in bf16) and the MXU
                    # accumulates in f32 — one pass instead of HIGHEST's
                    # multi-pass decomposition.  Applied per 128-lane
                    # window with row-sum carry offsets (see the tri
                    # build comment).
                    parts = []
                    off = None
                    for k in range(nseg):
                        seg = uv[:, k * C:(k + 1) * C]
                        r = jax.lax.dot_general(
                            seg, tri, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        parts.append(r if off is None else r + off)
                        if k < nseg - 1:
                            s = jnp.sum(seg, axis=1, keepdims=True)
                            off = s if off is None else off + s
                    return jnp.concatenate(parts, axis=1)

                def split3(wv):
                    # EXACT 3-term bf16 split: each term is EXACTLY a
                    # bf16 value (successive 8-bit significand slices of
                    # the 24-bit f32 significand), so returning them AS
                    # bf16 is lossless; (hi + mid) + lo reconstructs the
                    # f32 value bitwise when each output sums one
                    # selected column.
                    hi = wv.astype(jnp.bfloat16)
                    r1 = wv - hi.astype(jnp.float32)
                    mid = r1.astype(jnp.bfloat16)
                    lo = (r1 - mid.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    return hi, mid, lo

                def dot_d(a, b):
                    return jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )

                w_all = jnp.concatenate(
                    [sg[0] for sg in segs], axis=1
                )                                        # [NUM_CAND, nseg*C]
                # NOTE: the transposed orientation (p_t @ w_all.T ->
                # [C, NUM_F], full MXU M-utilization, then .T back)
                # measured SLOWER (80.5 vs 73.6 ms at 1M) — the [C, 16]
                # transpose outweighs the M-util gain; don't retry.
                #
                # ONE M=24 matmul instead of three M=8 passes: an M=8
                # matmul pays the full MXU pipeline fill for 8 rows of
                # work (1/16 utilization); stacking hi/mid/lo along the
                # M (feature) axis amortizes the fill 3x (measured −1.4
                # ms/step at 1M, perf/mxfuse_ab.py).  Row slices are
                # 8-aligned (NUM_CAND == 8) and the final sum keeps the
                # exact (hi + mid) + lo order — bitwise-identical.
                w3 = jnp.concatenate(split3(w_all), axis=0)  # [24, nseg*C]
                ri = jax.lax.broadcasted_iota(jnp.int32, (NUM_CAND, 1), 0)
                sent = jnp.where(
                    (ri == ROW_PX) | (ri == ROW_PY), _POS_SENTINEL,
                    jnp.where(ri == ROW_ID, -1.0, 0.0),
                )
                r_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (C, 1), 0
                ).astype(jnp.float32)

                def compact_force(p_t, unfilled):
                    """Compact via the one-hot ``p_t`` [C, nseg*C] (bf16
                    0/1 — a direct bf16 where() hits an unsupported i1
                    relayout in Mosaic, so callers build f32 and astype
                    once), blend the sentinel into ``unfilled`` [1, C]
                    lanes, and return the compacted candidate plane
                    [NUM_CAND, C]."""
                    comp3 = dot_d(w3, p_t)                   # [24, C]
                    comp = (comp3[:NUM_CAND]
                            + comp3[NUM_CAND:2 * NUM_CAND]) \
                        + comp3[2 * NUM_CAND:]           # [NUM_CAND, C]
                    # Unfilled lanes summed nothing (all-zero feature
                    # rows, position (0,0) — a real place): blend in the
                    # sentinel row so the pair mask kills them.
                    return comp + unfilled * sent

                def shared_tier():
                    # Compacted ranks are DENSE (0..count-1), so "filled" is
                    # simply lane < count.
                    rank = tri_rank(u)                       # [1, 3C]
                    # Prefold the union test into the rank row ([1, 3C]):
                    # non-union lanes get rank -1, which no output lane's
                    # r_iota (>= 0) matches — one [C, 3C] compare instead of
                    # compare + compare + AND.
                    rank_m = jnp.where(u > 0, rank, -1.0)    # [1, 3C]
                    p_t = jnp.where(
                        rank_m == r_iota, 1.0, 0.0
                    ).astype(jnp.bfloat16)                   # [C, 3C] bf16
                    unfilled = jnp.where(
                        lane_iota < count.astype(jnp.int32), 0.0, 1.0
                    )                                        # [1, C]
                    comp = compact_force(p_t, unfilled)

                    def ccrow(r):
                        return comp[r:r + 1, :]

                    cpx_, cpy_ = ccrow(ROW_PX), ccrow(ROW_PY)
                    cvx_, cvy_ = ccrow(ROW_VX), ccrow(ROW_VY)
                    cid_ = ccrow(ROW_ID)
                    d2 = (cpx_ - qpx_) ** 2 + (cpy_ - qpy_) ** 2
                    mask2 = (
                        (d2 < qeye_ * qeye_) & (cid_ != qid_) & (cid_ >= 0)
                    )
                    ttc, _ = _pair_ttc(qvx_, qvy_, qpx_, qpy_,
                                       cvx_, cvy_, cpx_, cpy_, radius)
                    ttc = jnp.where(mask2, ttc, inf)
                    t_i = jnp.min(ttc, axis=1, keepdims=True)
                    pfx, pfy = _pair_force(
                        zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_, qprio_,
                        cpx_, cpy_, cvx_, cvy_,
                        ccrow(ROW_FX), ccrow(ROW_FY), ccrow(ROW_PRIO), mask2,
                        int_prio=int_prio,
                    )
                    write_out(
                        t_i,
                        jnp.sum(pfx, axis=1, keepdims=True),
                        jnp.sum(pfy, axis=1, keepdims=True),
                    )

                if not dual_row:
                    @pl.when(count <= jnp.float32(C))
                    def _():
                        shared_tier()

                    @pl.when(count > jnp.float32(C))
                    def _():
                        full_passes(segs)
                    return

                # ---- dual-row tier (see the block comment above) ----------
                # DYNAMIC segment boundary: half A's union compacts into
                # lanes [0, c0), half B's into [c0, c0 + c1) — the tier
                # applies whenever the halves fit the plane TOGETHER
                # (c0 + c1 <= C), not per-half (c0, c1 <= C/2): boundary-
                # band candidates live in both unions (duplicated into both
                # segments, so each output lane still selects exactly one
                # window lane — a valid gather matrix), and the fixed-half
                # split wasted the slack one roomy half could lend a tight
                # one.
                H = sub_q // 2
                dual_ok = (c0 + c1) <= jnp.float32(C)

                @pl.when(dual_ok)
                def _():
                    u2 = jnp.concatenate([u0, u1], axis=0)   # [2, 3C]
                    rank2 = tri_rank(u2)                     # [2, 3C], M=2
                    rank0 = rank2[0:1]
                    rank1 = rank2[1:2]
                    # Prefolded rank rows ([1, 3C]): non-union lanes -> -1
                    # (matches no r_iota >= 0); rank0 < c0 <= the rank1 + c0
                    # offsets whenever this tier is TAKEN, so the two
                    # compares select disjoint output-lane ranges — two
                    # [C, 3C] compares + OR replace the five-op guard chain.
                    rk0 = jnp.where(u0 > 0, rank0, -1.0)     # [1, 3C]
                    rk1 = jnp.where(u1 > 0, rank1 + c0, -1.0)
                    p_t = jnp.where(
                        (rk0 == r_iota) | (rk1 == r_iota), 1.0, 0.0,
                    ).astype(jnp.bfloat16)                   # [C, 3C] bf16
                    li = lane_iota                           # [1, C] i32
                    filled = li < (c0 + c1).astype(jnp.int32)
                    comp = compact_force(
                        p_t, jnp.where(filled, 0.0, 1.0)
                    )

                    def ccrow(r):
                        return comp[r:r + 1, :]

                    lane_lo = li < c0.astype(jnp.int32)      # [1, C]

                    def qseg(r):
                        # Row r serves query G0_r on lanes [0, c0) and
                        # G1_r on [c0, C): select its features per half.
                        return jnp.where(
                            lane_lo, qblk[:H, r:r + 1], qblk[H:, r:r + 1]
                        )                                    # [H, C]

                    qpx2, qpy2 = qseg(ROW_PX), qseg(ROW_PY)
                    qvx2, qvy2 = qseg(ROW_VX), qseg(ROW_VY)
                    qprio2, qeye2 = qseg(ROW_PRIO), qseg(ROW_EYE)
                    qid2 = qseg(ROW_ID)
                    if int_prio:
                        qspx2, qspy2 = qvx2, qvy2  # unused on this path
                    else:
                        qspx2, qspy2 = qseg(ROW_SPX), qseg(ROW_SPY)

                    cpx_, cpy_ = ccrow(ROW_PX), ccrow(ROW_PY)
                    cvx_, cvy_ = ccrow(ROW_VX), ccrow(ROW_VY)
                    cid_ = ccrow(ROW_ID)
                    d2 = (cpx_ - qpx2) ** 2 + (cpy_ - qpy2) ** 2
                    mask2 = (
                        (d2 < qeye2 * qeye2) & (cid_ != qid2) & (cid_ >= 0)
                    )
                    ttc, _ = _pair_ttc(qvx2, qvy2, qpx2, qpy2,
                                       cvx_, cvy_, cpx_, cpy_, radius)
                    ttc = jnp.where(mask2, ttc, inf)
                    t_a = jnp.min(jnp.where(lane_lo, ttc, inf), axis=1,
                                  keepdims=True)             # [H, 1]
                    t_b = jnp.min(jnp.where(lane_lo, inf, ttc), axis=1,
                                  keepdims=True)
                    t_seg = jnp.where(lane_lo, t_a, t_b)     # [H, C]
                    inv_a = 1.0 / jnp.where(t_a > 0, t_a, 1.0)
                    inv_b = 1.0 / jnp.where(t_b > 0, t_b, 1.0)
                    pfx, pfy = _pair_force(
                        zp, t_seg, qpx2, qpy2, qvx2, qvy2, qspx2, qspy2,
                        qprio2, cpx_, cpy_, cvx_, cvy_,
                        ccrow(ROW_FX), ccrow(ROW_FY), ccrow(ROW_PRIO), mask2,
                        int_prio=int_prio,
                        inv_t=jnp.where(lane_lo, inv_a, inv_b),
                    )
                    zf = jnp.float32(0.0)
                    write_out(
                        jnp.concatenate([t_a, t_b], axis=0),
                        jnp.concatenate(
                            [jnp.sum(jnp.where(lane_lo, pfx, zf), axis=1,
                                     keepdims=True),
                             jnp.sum(jnp.where(lane_lo, zf, pfx), axis=1,
                                     keepdims=True)], axis=0),
                        jnp.concatenate(
                            [jnp.sum(jnp.where(lane_lo, pfy, zf), axis=1,
                                     keepdims=True),
                             jnp.sum(jnp.where(lane_lo, zf, pfy), axis=1,
                                     keepdims=True)], axis=0),
                    )

                not_dual = jnp.logical_not(dual_ok)

                @pl.when(not_dual & (count <= jnp.float32(C)))
                def _():
                    shared_tier()

                @pl.when(not_dual & (count > jnp.float32(C)))
                def _():
                    full_passes(segs)

            # ---- tier dispatch: flagged sub-blocks absorb the fused
            # spill plane as a fourth candidate segment; everyone else
            # runs the exact three-window shape (the two bodies share
            # all code above — only the static segment count differs).
            if spill_lanes:
                ns = sflag_ref[cnt_base + s]

                @pl.when(ns == 0)
                def _():
                    tier_section(segs3)

                @pl.when(ns > 0)
                def _():
                    tier_section(segs3 + [(sp_feat, sp_ok)])
            else:
                tier_section(segs3)

        # ``unroll=2`` places TWO independent sub-block bodies in one
        # loop iteration: their dependency chains are disjoint (separate
        # windows, unions, matmuls, output rows), giving Mosaic's
        # scheduler MXU work of one block to overlap with VPU work of
        # the other.  The round-2 full 48x unroll was icache-bound
        # (DESIGN_NOTES "settled"); 2x is the measured middle ground.
        if unroll == 2 and nsub % 2 == 0:
            def sub_block2(i, _):
                sub_block(2 * i, 0)
                sub_block(2 * i + 1, 0)
                return 0

            jax.lax.fori_loop(0, nsub // 2, sub_block2, 0)
        else:
            jax.lax.fori_loop(0, nsub, sub_block, 0)

    if spill_lanes:
        def kernel(zp_ref, cnt_ref, sflag_ref, packed_any, qt_ref,
                   sp_ref, out_ref, strips_r, sem):
            _body(zp_ref, cnt_ref, sflag_ref, packed_any, qt_ref,
                  sp_ref, out_ref, strips_r, sem)
    else:
        def kernel(zp_ref, cnt_ref, packed_any, qt_ref, out_ref,
                   strips_r, sem):
            _body(zp_ref, cnt_ref, None, packed_any, qt_ref, None,
                  out_ref, strips_r, sem)

    return kernel, q_len, W_EXT, N_COPIES


def zanlungo_forces_bucketed(cfg: BucketConfig, zparams4, packed_t,
                             interpret: bool = False,
                             compact_pass2: bool = True,
                             int_prio: bool = False,
                             packed_T=None,
                             dual_row: bool = False,
                             spill_ext=None,
                             unroll: int = 1):
    """Run the kernel over the packed array.

    zparams4: [5] f32 — (agent_scale, force_distance, agent_mass,
    agent_radius, force_cap); packed_t: [slots, NUM_F] from bucketize.
    packed_T: optional [NUM_CAND, slots] candidate plane (bucketize's
    second return) — pass it to skip the in-graph transpose fallback,
    which costs ~9 ms at 1M.  Returns [slots, 2] f32 velocities
    (rec + force/mass) per bucket slot.

    spill_ext: optional (sflag [n_blocks] i32, sp_T [NUM_CAND, 128]
    f32) — the fused-spill extension (see :func:`zanlungo_fused`):
    flagged sub-blocks absorb sp_T's live lanes as a fourth candidate
    segment, so bucket-overflow agents act as force candidates without
    the separate per-spill window recompute.  Callers must flag every
    sub-block with a query tile within Chebyshev distance 1 of a live
    spill's (carried) tile.
    """
    if packed_T is None:
        packed_T = packed_t[:, :NUM_CAND].T
    kernel, q_len, w_ext, n_copies = _make_kernel(
        cfg, compact_pass2=compact_pass2, int_prio=int_prio,
        dual_row=dual_row,
        spill_lanes=0 if spill_ext is None else spill_ext[1].shape[1],
        unroll=unroll,
    )
    n_strips = cfg.ty // cfg.strip_tiles

    # Live-query count per sub-block (contiguous sub_q-slot ranges in the
    # column-major layout) from the transposed plane's ID row — ONE
    # contiguous [slots] read + a reshape-reduce (~0.1 ms at 1M).  Feeds
    # the kernel's occupancy-adaptive skip.
    sub_q = cfg.sub_tiles * cfg.bucket
    counts = jnp.sum(
        (packed_T[ROW_ID, :] >= 0).reshape(cfg.slots // sub_q, sub_q),
        axis=-1, dtype=jnp.int32,
    )

    in_specs = [
        # Lane-major packed array pinned to HBM, manually DMA'd in
        # 128-aligned windows.
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(                          # query strip (transposed)
            (q_len, NUM_F),
            lambda i, j, *_: (i * n_strips + j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if spill_ext is not None:
        sflag, sp_T = spill_ext
        in_specs.append(pl.BlockSpec(          # fused spill plane
            (NUM_CAND, sp_T.shape[1]),
            lambda i, j, *_: (0, 0),
            memory_space=pltpu.VMEM,
        ))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if spill_ext is None else 3,
        grid=(cfg.tx, n_strips),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (q_len, 2),
            lambda i, j, *_: (i * n_strips + j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, n_copies, NUM_CAND, w_ext), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    # Candidate strips carry only the 8 candidate feature rows — half
    # the DMA traffic and compaction-matmul M-dim of the full layout.
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cfg.slots, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    if spill_ext is None:
        return call(zparams4.astype(jnp.float32), counts, packed_T,
                    packed_t)
    return call(zparams4.astype(jnp.float32), counts,
                sflag.astype(jnp.int32), packed_T, packed_t,
                sp_T.astype(jnp.float32))


def spill_patch(cfg: BucketConfig, zp, position, velocity, self_pref,
                pref_committed, priority, eyesight, alive, rec_vel,
                packed_t, bucket_pos, vel,
                spill_capacity: int, chunk: int = 16,
                interpret: bool = False, int_prio: bool = False,
                packed_T=None, tile_xy=None):
    """EXACT repair of bucket-overflow truncation (the reference's
    per-cell sets are unbounded, location_hash_2d.rs:15).

    Agents beyond a tile's ``cfg.bucket`` slots ("spills") are missing
    from the packed plane: they got no force output, AND every query
    within eyesight of one computed a wrong min-TTC (t_i enters every
    pair force, zanlungo.rs:109-112) so its whole force sum is off.
    Repair is grouped PER SPILL — row-gather-free, since XLA row gathers
    cost ~35 ns/row and a per-query formulation measured 430 ms at 1M:

    - per spill, its 5x5 tile window is read as 5 CONTIGUOUS column
      slices of the packed array (the column-major slot layout makes a
      5-tile vertical run one dynamic_slice — cheap, unlike gathers);
    - the queries recomputed are the window's inner 3x3 rows + the spill
      itself: everything possibly within eyesight of it (eyesight <=
      tile_size).  Re-evaluating an UNaffected query is harmless — its
      exact recompute equals what the kernel produced (idempotent), so
      overlapping spill neighborhoods need no dedup;
    - each query's candidates = the spill's 5x5 window (a superset of
      the query's own 3x3) + the whole spill list, masked exactly like
      the kernel (strict dist < eyesight, self by agent id);
    - models/local.zanlungo_from_rows evaluates the groups in
      ``chunk``-sized lax.map batches; results overwrite ``vel`` rows.

    Returns (vel, unresolved) — spills beyond ``spill_capacity``.  f32
    summation order differs from the kernel on overwritten rows
    (tolerance-level).
    """
    from ..models.local import zanlungo_from_rows

    n = position.shape[0]
    chunk = max(1, min(int(chunk), int(spill_capacity)))
    # Round the buffer up to a whole number of lax.map chunks.
    s_cap = ((int(spill_capacity) + chunk - 1) // chunk) * chunk
    b, ty, tx = cfg.bucket, cfg.ty, cfg.tx
    assert tx >= 5 and ty >= 5, (
        "spill_patch needs a >= 5x5-tile world (set spill_capacity=0 "
        "for smaller worlds)"
    )
    run = 5 * b  # rows per column slice (5 tiles)
    f32 = jnp.float32
    if tile_xy is not None:
        # Carried binning (skin-deferred presort): the packed plane was
        # binned by the LAST SORT's tile keys, so the spill windows must
        # center on those tiles, not the fresh positions' — a spill's
        # stale tile is where its neighbors are packed (the skin bound
        # keeps every true neighbor within the stale 5x5/3x3 windows).
        tcx, tcy = tile_xy
    else:
        inv_tile = 1.0 / cfg.tile_size
        tcx = jnp.clip(jnp.floor(
            (position[:, 0] - cfg.offset[0]) * inv_tile).astype(jnp.int32),
            0, tx - 1)
        tcy = jnp.clip(jnp.floor(
            (position[:, 1] - cfg.offset[1]) * inv_tile).astype(jnp.int32),
            0, ty - 1)

    is_spill = alive & (bucket_pos >= cfg.slots)

    # Compact spill agent indices — scatter-free (ops/compact.py; XLA
    # scatters pay ~137 ns/update regardless of how few land, ~6 ms at
    # 1M every step; cumsum is ~0.2 ms — DESIGN_NOTES.md).
    c_sp = compact_indices(is_spill, s_cap)
    n_spill, spill_idx = c_sp.count, c_sp.idx
    spill_valid, spill_over = c_sp.valid, c_sp.n_over
    sc = jnp.clip(spill_idx, 0, n - 1)
    sp_tcx = jnp.where(spill_valid, tcx[sc], 1)
    sp_tcy = jnp.where(spill_valid, tcy[sc], 1)

    # Spill feature rows (queries AND candidates), f32 like the plane.
    sp = dict(
        pos=position[sc].astype(f32),
        vel=velocity[sc].astype(f32),
        prefc=pref_committed[sc].astype(f32),
        spref=self_pref[sc].astype(f32),
        prio=priority[sc].astype(f32),
        eye=eyesight[sc].astype(f32),
        rec=rec_vel[sc].astype(f32),
        id=jnp.where(spill_valid, spill_idx, -1).astype(f32),
    )
    def make_tier(cap: int):
        """Patch using only the first ``cap`` spill rows — exact whenever
        n_spill <= cap (the compaction fills in order)."""

        def tier(v):
            out, q_id, q_slots = _spill_groups(
                cfg, zp, packed_t,
                {k_: v_[:cap] for k_, v_ in sp.items()},
                sp_tcx[:cap], sp_tcy[:cap], spill_valid[:cap], chunk,
                interpret=interpret, int_prio=int_prio,
                packed_T=packed_T,
            )
            # Overwrite AFFECTED rows only: a window query's force sum
            # changed iff some spill sits strictly within its eyesight
            # (the pair mask, location_hash_2d.rs:251) — unaffected
            # queries keep their (identical, and bitwise-so) kernel
            # values, and the scatter shrinks from cap*(9b+1) rows to
            # the ~dozen per spill (XLA scatters pay ~137 ns/update
            # whether or not they land).  q_id carries ROW_ID = agent
            # indices here.
            q_agent = q_id.astype(jnp.int32)
            qrows = packed_t[
                jnp.clip(q_slots, 0, cfg.slots - 1).reshape(-1)
            ]
            nq = q_id.shape[1]
            qpx = qrows[:, ROW_PX].reshape(cap, nq - 1)
            qpy = qrows[:, ROW_PY].reshape(cap, nq - 1)
            qeye = qrows[:, ROW_EYE].reshape(cap, nq - 1)
            d2s = ((qpx - sp["pos"][:cap, 0:1]) ** 2
                   + (qpy - sp["pos"][:cap, 1:2]) ** 2)
            aff = jnp.concatenate(
                [(d2s < qeye * qeye) & spill_valid[:cap, None],
                 spill_valid[:cap, None]], axis=1,
            ) & (q_agent >= 0)
            flat_aff = aff.reshape(-1)
            flat_tgt = jnp.where(flat_aff, q_agent.reshape(-1), n)
            flat_out = out.reshape(-1, 2)
            n_aff = jnp.sum(flat_aff.astype(jnp.int32))

            k_aff = min(32 * cap, flat_aff.shape[0])

            def compacted(vv):
                c_aff = compact_indices(flat_aff, k_aff)
                src = jnp.clip(c_aff.idx, 0, flat_aff.shape[0] - 1)
                tgt = jnp.where(c_aff.valid, flat_tgt[src], n)
                return vv.at[tgt].set(
                    flat_out[src].astype(vv.dtype), mode="drop"
                )

            def full_scatter(vv):
                # Dense-hotspot fallback: more affected rows than the
                # compaction covers — scatter the whole window set
                # (idempotent recomputes, so over-writing is exact).
                return vv.at[flat_tgt].set(
                    flat_out.astype(vv.dtype), mode="drop"
                )

            return jax.lax.cond(n_aff <= k_aff, compacted, full_scatter, v)

        return tier

    # The group machinery's cost is fixed by its static tier shape, not
    # the actual spill count — pick the smallest sufficient tier (and
    # skip entirely on clean steps, the common case).
    tiers = sorted({min(16, s_cap), min(64, s_cap), min(256, s_cap),
                    s_cap})

    def dispatch(i, v):
        cap = tiers[i]
        if i + 1 == len(tiers):
            return make_tier(cap)(v)
        return jax.lax.cond(
            n_spill <= cap, make_tier(cap),
            lambda vv: dispatch(i + 1, vv), v
        )

    vel = jax.lax.cond(
        n_spill > 0, lambda v: dispatch(0, v), lambda v: v, vel
    )
    return vel, spill_over.astype(jnp.int32)


def _spill_groups_xla(cfg: BucketConfig, zp, packed_t, sp: dict,
                      sp_tcx, sp_tcy, spill_valid, chunk: int):
    """Pure-XLA spill-group evaluation: the parity oracle for the Pallas
    path below (tests/test_zanlungo_pallas.py routes the full patch
    through it) and the live fallback for hand-built BucketConfigs whose
    packed plane is narrower than one aligned window DMA (see
    _spill_groups).  Materializes [chunk, 9b+1, 5*run+cap] pair tensors
    through HBM — ~16 ms at the 1M bench's 64-spill tier and measured
    SLOWER than the Pallas path even at 10k-agent scale (186 vs 269
    steps/s, DESIGN_NOTES.md), so it is not a production path.

    ``sp``: dict of spill feature rows [S, ...] (pos, vel, prefc, spref,
    prio, eye, rec, id; f32) — ids must be unique against the packed
    plane's ROW_ID space.  Returns (out [S, nq, 2] patched velocities,
    q_id [S, nq] the queries' ROW_ID values (last column = the spill
    itself), q_slots [S, nq-1] the window queries' packed slot indices).
    """
    from ..models.local import zanlungo_from_rows

    s_cap = sp_tcx.shape[0]
    chunk = min(int(chunk), s_cap)
    assert s_cap % chunk == 0
    b, ty, tx = cfg.bucket, cfg.ty, cfg.tx
    assert tx >= 5 and ty >= 5, (
        "the spill machinery needs a >= 5x5-tile world (set "
        "spill_capacity=0 for smaller worlds)"
    )
    run = 5 * b
    sp_pos, sp_vel, sp_prefc = sp["pos"], sp["vel"], sp["prefc"]
    sp_spref, sp_prio, sp_eye = sp["spref"], sp["prio"], sp["eye"]
    sp_rec, sp_id = sp["rec"], sp["id"]

    # 5 contiguous column slices per spill: a 5x5 tile window CLAMPED
    # into the world (not into the array — slot clipping would shift the
    # tile<->row mapping at world edges and mis-place the query block).
    # Requires tx, ty >= 5 (asserted by the caller); the clamped window
    # always contains the spill's full in-world 3x3.
    bx = jnp.clip(sp_tcx - 2, 0, tx - 5)                     # [S]
    by = jnp.clip(sp_tcy - 2, 0, ty - 5)
    dxs = jnp.arange(5, dtype=jnp.int32)
    colx = bx[:, None] + dxs[None, :]                        # [S, 5]
    base = (colx * ty + by[:, None]) * b                     # in-bounds

    def col_slice(b0):
        return jax.lax.dynamic_slice(
            packed_t, (b0, jnp.zeros((), b0.dtype)), (run, NUM_F)
        )

    win = jax.vmap(jax.vmap(col_slice))(base)                # [S, 5, run, F]
    row_ok = (
        (win[..., ROW_ID] >= 0) & spill_valid[:, None, None]
    )                                                        # [S, 5, run]

    # Queries: the (clamped) 3x3 tile block around the spill + the
    # spill's own row.  The block's position inside the window is
    # spill-dependent at world edges, so extract it dynamically.
    qx = jnp.clip(sp_tcx - 1, 0, tx - 3) - bx                # [S] in [0, 2]
    qy = jnp.clip(sp_tcy - 1, 0, ty - 3) - by

    def q_slice(w, px, py):
        return jax.lax.dynamic_slice(
            w, (px, py * b, jnp.zeros((), px.dtype)), (3, 3 * b, NUM_F)
        )

    qwin = jax.vmap(q_slice)(win, qx, qy).reshape(s_cap, 9 * b, NUM_F)

    def qok_slice(r, px, py):
        return jax.lax.dynamic_slice(r, (px, py * b), (3, 3 * b))

    q_ok = jax.vmap(qok_slice)(row_ok, qx, qy).reshape(s_cap, 9 * b)
    nq = 9 * b + 1

    # Window queries' packed slot indices (for slot-space callers).
    qcol = bx[:, None] + qx[:, None] + jnp.arange(3, dtype=jnp.int32)[None]
    qrow0 = (by + qy)[:, None] * b  # row offset within the column
    q_slots = (
        (qcol[:, :, None] * ty) * b
        + qrow0[:, :, None]
        + jnp.arange(3 * b, dtype=jnp.int32)[None, None, :]
    ).reshape(s_cap, 9 * b)

    q_pos = jnp.concatenate([qwin[..., ROW_PX:ROW_PX + 2],
                             sp_pos[:, None, :]], axis=1)
    q_vel = jnp.concatenate([qwin[..., ROW_VX:ROW_VX + 2],
                             sp_vel[:, None, :]], axis=1)
    q_spref = jnp.concatenate([qwin[..., ROW_SPX:ROW_SPX + 2],
                               sp_spref[:, None, :]], axis=1)
    q_rec = jnp.concatenate([qwin[..., ROW_RX:ROW_RX + 2],
                             sp_rec[:, None, :]], axis=1)
    q_prio = jnp.concatenate([qwin[..., ROW_PRIO],
                              sp_prio[:, None]], axis=1)
    q_eye = jnp.concatenate([qwin[..., ROW_EYE], sp_eye[:, None]], axis=1)
    q_id = jnp.concatenate([jnp.where(q_ok, qwin[..., ROW_ID], -1.0),
                            sp_id[:, None]], axis=1)         # [S, nq]

    # Candidates: the full 5x5 window + the whole spill list.
    cw = win.reshape(s_cap, 5 * run, NUM_F)
    c_ok = row_ok.reshape(s_cap, 5 * run)
    nc = 5 * run + s_cap
    c_pos = jnp.concatenate(
        [cw[..., ROW_PX:ROW_PX + 2],
         jnp.broadcast_to(sp_pos[None], (s_cap, s_cap, 2))], axis=1)
    c_vel = jnp.concatenate(
        [cw[..., ROW_VX:ROW_VX + 2],
         jnp.broadcast_to(sp_vel[None], (s_cap, s_cap, 2))], axis=1)
    c_prefc = jnp.concatenate(
        [cw[..., ROW_FX:ROW_FX + 2],
         jnp.broadcast_to(sp_prefc[None], (s_cap, s_cap, 2))], axis=1)
    c_prio = jnp.concatenate(
        [cw[..., ROW_PRIO],
         jnp.broadcast_to(sp_prio[None], (s_cap, s_cap))], axis=1)
    c_id = jnp.concatenate(
        [jnp.where(c_ok, cw[..., ROW_ID], -1.0),
         jnp.broadcast_to(sp_id[None], (s_cap, s_cap))], axis=1)  # [S, nc]

    def group(args):
        (qp, qv, qsp, qrec, qprio, qeye, qid,
         cp, cv, cpf, cprio, cid) = args
        d2 = jnp.sum((cp[:, None, :, :] - qp[:, :, None, :]) ** 2, axis=-1)
        valid = (
            (cid[:, None, :] >= 0)
            & (qid[:, :, None] >= 0)
            & (d2 < (qeye * qeye)[:, :, None])
            & (cid[:, None, :] != qid[:, :, None])
        )
        out = zanlungo_from_rows(
            zp, qp, qv, qsp, qprio,
            jnp.broadcast_to(cp[:, None], d2.shape + (2,)),
            jnp.broadcast_to(cv[:, None], d2.shape + (2,)),
            jnp.broadcast_to(cpf[:, None], d2.shape + (2,)),
            jnp.broadcast_to(cprio[:, None], d2.shape),
            valid, qrec,
        )
        return out

    def resh(x):
        return x.reshape((s_cap // chunk, chunk) + x.shape[1:])

    out = jax.lax.map(group, (
        resh(q_pos), resh(q_vel), resh(q_spref), resh(q_rec), resh(q_prio),
        resh(q_eye), resh(q_id),
        resh(c_pos), resh(c_vel), resh(c_prefc), resh(c_prio), resh(c_id),
    ))                                                       # [S/c, c, nq, 2]
    out = out.reshape(s_cap, nq, 2)
    return out, q_id, q_slots


def _make_spill_kernel(cfg: BucketConfig, cap: int, cap_pad: int,
                       int_prio: bool = False):
    """One program per spill: recompute the spill's 3x3 window queries
    against its full 5x5 candidate window + the spill list, entirely in
    VMEM.  The XLA version above materializes [chunk, 9b+1, 5*run+cap]
    pair tensors in HBM (~16 ms at the 1M bench's 64-spill tier,
    perf/step_parts.py); here the pair math never leaves the core.

    Data routing (Mosaic DMA rules: lane slices 128-aligned, sublane
    8-aligned): CANDIDATES need lane-major rows -> 5 manual DMAs of the
    transposed packed array's 8 candidate rows (one sublane tile),
    128-align-down + roll; QUERIES need sublane-major rows -> nine
    (bucket, NUM_F) BlockSpec inputs on the untransposed packed array,
    indexed per-program via scalar prefetch (tile offsets are
    bucket-granular by construction)."""
    b = cfg.bucket
    run = 5 * b
    qc = 3 * b                    # queries per window column (one chunk)
    q_len = 9 * b
    ext = ((run + 127) // 128 + 1) * 128   # aligned window read width
    cw = 5 * run + cap_pad

    def kernel(meta_ref, packed_T_any, *rest):
        (q0, q1, q2, q3, q4, q5, q6, q7, q8, spt_ref, zp_ref,
         out_ref, wins, wsem) = rest
        qblocks = (q0, q1, q2, q3, q4, q5, q6, q7, q8)
        p = pl.program_id(0)
        zp = (zp_ref[0, 0], zp_ref[0, 1], zp_ref[0, 2], zp_ref[0, 3],
              zp_ref[0, 4])
        radius = zp_ref[0, 3]
        inf = jnp.float32(jnp.inf)

        # ---- 5 candidate column windows: lane-major manual DMAs.
        def cand_dma(k):
            return pltpu.make_async_copy(
                packed_T_any.at[:, pl.ds(
                    pl.multiple_of(meta_ref[p, k], 128), ext)],
                wins.at[k], wsem.at[k],
            )

        for k in range(5):
            cand_dma(k).start()
        for k in range(5):
            cand_dma(k).wait()

        # Candidate row: [NUM_CAND, 5*run + cap_pad], lane order
        # identical to the XLA version's win.reshape + spill-list concat.
        pieces = []
        for k in range(5):
            w = wins[k]
            shift = meta_ref[p, 5 + k]
            w = pltpu.roll(
                w,
                jax.lax.rem(jnp.int32(ext) - shift, jnp.int32(ext)),
                axis=1,
            )
            pieces.append(w[:, :run])
        pieces.append(spt_ref[...])
        cand = jnp.concatenate(pieces, axis=1)      # [NUM_CAND, CW]

        def crow(r):
            return cand[r:r + 1, :]

        cpx_, cpy_ = crow(ROW_PX), crow(ROW_PY)
        cvx_, cvy_ = crow(ROW_VX), crow(ROW_VY)
        cfx_, cfy_ = crow(ROW_FX), crow(ROW_FY)
        cprio_, cid_ = crow(ROW_PRIO), crow(ROW_ID)

        def q_chunk(i, _):
            # Queries for column chunk i: tiles 3i, 3i+1, 3i+2 stacked
            # on sublanes (same order as the XLA qwin reshape).
            qr = jnp.concatenate(
                [qblocks[3 * i + j][...] for j in range(3)], axis=0
            )                                        # [qc, NUM_F]

            def qrow(r):
                return qr[:, r:r + 1]

            qpx_, qpy_ = qrow(ROW_PX), qrow(ROW_PY)
            qvx_, qvy_ = qrow(ROW_VX), qrow(ROW_VY)
            qspx_, qspy_ = qrow(ROW_SPX), qrow(ROW_SPY)
            qprio_, qeye_, qid_ = (qrow(ROW_PRIO), qrow(ROW_EYE),
                                   qrow(ROW_ID))
            d2 = (cpx_ - qpx_) ** 2 + (cpy_ - qpy_) ** 2
            mask = (
                (d2 < qeye_ * qeye_) & (cid_ != qid_) & (cid_ >= 0)
                & (qid_ >= 0)
            )
            ttc, _ = _pair_ttc(qvx_, qvy_, qpx_, qpy_,
                               cvx_, cvy_, cpx_, cpy_, radius)
            ttc = jnp.where(mask, ttc, inf)
            t_i = jnp.min(ttc, axis=1, keepdims=True)
            pfx, pfy = _pair_force(
                zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_, qprio_,
                cpx_, cpy_, cvx_, cvy_, cfx_, cfy_, cprio_, mask,
                int_prio=int_prio,
            )
            has = jnp.isfinite(t_i)
            inv_mass = 1.0 / zp[2]
            out_x = qrow(ROW_RX) + jnp.where(
                has, jnp.sum(pfx, axis=1, keepdims=True) * inv_mass, 0.0)
            out_y = qrow(ROW_RY) + jnp.where(
                has, jnp.sum(pfy, axis=1, keepdims=True) * inv_mass, 0.0)
            out_ref[i * qc:(i + 1) * qc, 0:1] = out_x
            out_ref[i * qc:(i + 1) * qc, 1:2] = out_y

        for i in range(3):  # static: qblocks indexing must be static
            q_chunk(i, None)

    return kernel, ext, cw, q_len


def _spill_groups_window_pallas(cfg: BucketConfig, zp5, packed_t, sp_t,
                                sp_tcx, sp_tcy, interpret: bool,
                                int_prio: bool = False, packed_T=None):
    """Pallas path for the WINDOW-query part of :func:`_spill_groups`:
    out_win [S, 9b, 2] velocities for the spill's 3x3-tile queries (rows
    for empty/invalid slots are garbage — callers mask by q_id).  sp_t:
    [NUM_CAND, cap_pad] spill candidate features, id -1 on dead rows."""
    b, ty, tx = cfg.bucket, cfg.ty, cfg.tx
    cap = sp_tcx.shape[0]
    cap_pad = sp_t.shape[1]
    kernel, ext, cw, q_len = _make_spill_kernel(cfg, cap, cap_pad,
                                                 int_prio=int_prio)

    bx = jnp.clip(sp_tcx - 2, 0, tx - 5)
    by = jnp.clip(sp_tcy - 2, 0, ty - 5)
    qx = jnp.clip(sp_tcx - 1, 0, tx - 3) - bx
    qy = jnp.clip(sp_tcy - 1, 0, ty - 3) - by
    cols = bx[:, None] + jnp.arange(5, dtype=jnp.int32)[None, :]
    off = (cols * ty + by[:, None]) * b                      # [S, 5]
    base = jnp.clip((off // 128) * 128, 0, cfg.slots - ext)
    shift = (off - base).astype(jnp.int32)
    # Query tile k = 3*i + j: column bx+qx+i, tile row by+qy+j — as
    # BLOCK indices of (bucket, NUM_F) blocks of the packed array.
    qcol = bx + qx
    qblk = jnp.stack(
        [(qcol + i) * ty + by + qy + j
         for i in range(3) for j in range(3)], axis=1
    )                                                        # [S, 9]
    meta = jnp.concatenate([base, shift, qblk], axis=1).astype(jnp.int32)

    def qspec(k):
        return pl.BlockSpec(
            (b, NUM_F), lambda p, meta_r, _k=k: (meta_r[p, 10 + _k], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            *[qspec(k) for k in range(9)],
            pl.BlockSpec((NUM_CAND, cap_pad), lambda p, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda p, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_len, 2), lambda p, *_: (p, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((5, NUM_CAND, ext), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    zp8 = jnp.zeros((1, 8), jnp.float32).at[0, :5].set(zp5)
    out_call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cap * q_len, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    if packed_T is None:
        packed_T = packed_t[:, :NUM_CAND].T
    out = out_call(meta, packed_T, *([packed_t] * 9), sp_t, zp8)
    return out.reshape(cap, q_len, 2)


def _spill_own_rows(cfg: BucketConfig, zp, packed_t, sp: dict,
                    sp_tcx, sp_tcy, spill_valid):
    """Velocities for the spill agents' OWN rows: [S] queries against
    their 3x3 packed window + the whole spill list, via the exact
    models/local math (zanlungo_from_rows) — the reference semantics for
    an agent the bucket layout could not hold (zanlungo.rs:93-218 over
    the full neighbor set, location_hash_2d.rs:251 masking).  Returns
    [S, 1, 2]; rows for invalid slots hold rec_vel."""
    from ..models.local import zanlungo_from_rows

    s_cap = sp_tcx.shape[0]
    b, ty, tx = cfg.bucket, cfg.ty, cfg.tx
    q_len = 9 * b
    bx3 = jnp.clip(sp_tcx - 1, 0, tx - 3)
    by3 = jnp.clip(sp_tcy - 1, 0, ty - 3)
    cols3 = bx3[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]
    base3 = (cols3 * ty + by3[:, None]) * b                  # [S, 3]

    def col3(b0):
        return jax.lax.dynamic_slice(
            packed_t, (b0, jnp.zeros((), b0.dtype)), (3 * b, NUM_F)
        )

    w3 = jax.vmap(jax.vmap(col3))(base3).reshape(s_cap, q_len, NUM_F)
    w3_ok = w3[..., ROW_ID] >= 0
    c_pos = jnp.concatenate(
        [w3[..., ROW_PX:ROW_PX + 2],
         jnp.broadcast_to(sp["pos"][None], (s_cap, s_cap, 2))], axis=1)
    c_vel = jnp.concatenate(
        [w3[..., ROW_VX:ROW_VX + 2],
         jnp.broadcast_to(sp["vel"][None], (s_cap, s_cap, 2))], axis=1)
    c_prefc = jnp.concatenate(
        [w3[..., ROW_FX:ROW_FX + 2],
         jnp.broadcast_to(sp["prefc"][None], (s_cap, s_cap, 2))], axis=1)
    c_prio = jnp.concatenate(
        [w3[..., ROW_PRIO],
         jnp.broadcast_to(sp["prio"][None], (s_cap, s_cap))], axis=1)
    c_id = jnp.concatenate(
        [jnp.where(w3_ok, w3[..., ROW_ID], -1.0),
         jnp.broadcast_to(sp["id"][None], (s_cap, s_cap))], axis=1)
    d2 = jnp.sum(
        (c_pos - sp["pos"][:, None, :]) ** 2, axis=-1
    )                                                        # [S, nc]
    valid = (
        (c_id >= 0)
        & spill_valid[:, None]
        & (d2 < (sp["eye"] ** 2)[:, None])
        & (c_id != sp["id"][:, None])
    )
    return zanlungo_from_rows(
        zp, sp["pos"][:, None], sp["vel"][:, None],
        sp["spref"][:, None], sp["prio"][:, None],
        c_pos[:, None], c_vel[:, None], c_prefc[:, None],
        c_prio[:, None], valid[:, None], sp["rec"][:, None],
    )                                                        # [S, 1, 2]


def _spill_flags(cfg: BucketConfig, sp_tcx, sp_tcy, spill_valid):
    """Per-sub-block fused-spill flags: count of live spills whose
    (carried) tile is within Chebyshev distance 1 of one of the
    sub-block's query tiles.  Because ``tile_size >= max_eyesight``
    (BucketConfig.create), every query within eyesight of a spill lives
    in an adjacent tile, so flagged sub-blocks are a superset of the
    affected ones; on the carried-binning path the same skin bound that
    keeps kernel windows exact keeps this adjacency exact (core/step.py
    skin_mode).  [n_blocks] i32, indexed like the kernel's cnt_ref:
    block = (cx * n_strips + cy // strip) * nsub + (cy % strip) // qb."""
    n_strips = cfg.ty // cfg.strip_tiles
    nsub = cfg.strip_tiles // cfg.sub_tiles
    n_blocks = cfg.tx * n_strips * nsub
    d = jnp.arange(-1, 2, dtype=jnp.int32)
    cx = jnp.clip(sp_tcx[:, None, None] + d[None, :, None], 0, cfg.tx - 1)
    cy = jnp.clip(sp_tcy[:, None, None] + d[None, None, :], 0, cfg.ty - 1)
    blk = (
        (cx * n_strips + cy // cfg.strip_tiles) * nsub
        + (cy % cfg.strip_tiles) // cfg.sub_tiles
    )
    tgt = jnp.where(spill_valid[:, None, None], blk, n_blocks)
    return jnp.zeros((n_blocks,), jnp.int32).at[tgt.reshape(-1)].add(
        1, mode="drop"
    )


def _spill_groups(cfg: BucketConfig, zp, packed_t, sp: dict,
                  sp_tcx, sp_tcy, spill_valid, chunk: int,
                  interpret: bool = False, int_prio: bool = False,
                  packed_T=None):
    """Per-spill group evaluation: same contract as
    :func:`_spill_groups_xla` (out [S, 9b+1, 2], q_id [S, 9b+1],
    q_slots [S, 9b]) but the window-query pair math runs in the Pallas
    kernel (VMEM-resident) and only the spills' OWN rows — [S] queries
    against their 3x3 + the spill list — go through the small XLA pass.
    Window rows are kernel-math (tolerance-equal to the XLA oracle, like
    the main force kernel); own rows keep the models/local math exactly.
    """
    from ..models.local import zanlungo_from_rows

    s_cap = sp_tcx.shape[0]
    b, ty, tx = cfg.bucket, cfg.ty, cfg.tx
    assert tx >= 5 and ty >= 5, (
        "the spill machinery needs a >= 5x5-tile world (set "
        "spill_capacity=0 for smaller worlds)"
    )
    # The window kernel's aligned candidate DMA reads ``ext`` lanes from
    # a 128-aligned base clipped into [0, slots - ext]; a packed plane
    # narrower than one read window would clip to a NEGATIVE base and
    # read out of bounds.  Unreachable via BucketConfig.create (its
    # ty >= 128/bucket and the tx/ty >= 5 asserts above pin slots >=
    # 640 > ext for every legal bucket), but a hand-built BucketConfig
    # could hit it — such worlds take the XLA group path instead: same
    # contract, oracle math, trivially cheap at that size.
    ext = ((5 * b + 127) // 128 + 1) * 128
    if cfg.slots < ext:
        return _spill_groups_xla(cfg, zp, packed_t, sp, sp_tcx, sp_tcy,
                                 spill_valid, chunk)
    q_len = 9 * b

    zp5 = zparams5(zp)
    # Spill features in the packed row layout, lane-padded to 128.
    cap_pad = ((s_cap + 127) // 128) * 128
    f32 = jnp.float32
    sp_rows = jnp.zeros((cap_pad, NUM_F), f32)
    sp_rows = sp_rows.at[:s_cap, ROW_PX].set(sp["pos"][:, 0])
    sp_rows = sp_rows.at[:s_cap, ROW_PY].set(sp["pos"][:, 1])
    sp_rows = sp_rows.at[:s_cap, ROW_VX].set(sp["vel"][:, 0])
    sp_rows = sp_rows.at[:s_cap, ROW_VY].set(sp["vel"][:, 1])
    sp_rows = sp_rows.at[:s_cap, ROW_FX].set(sp["prefc"][:, 0])
    sp_rows = sp_rows.at[:s_cap, ROW_FY].set(sp["prefc"][:, 1])
    sp_rows = sp_rows.at[:s_cap, ROW_PRIO].set(sp["prio"])
    sp_rows = sp_rows.at[:s_cap, ROW_EYE].set(sp["eye"])
    sp_rows = sp_rows.at[:s_cap, ROW_RX].set(sp["rec"][:, 0])
    sp_rows = sp_rows.at[:s_cap, ROW_RY].set(sp["rec"][:, 1])
    sp_rows = sp_rows.at[:s_cap, ROW_SPX].set(sp["spref"][:, 0])
    sp_rows = sp_rows.at[:s_cap, ROW_SPY].set(sp["spref"][:, 1])
    sp_rows = sp_rows.at[:, ROW_ID].set(-1.0)
    sp_rows = sp_rows.at[:s_cap, ROW_ID].set(sp["id"])

    out_win = _spill_groups_window_pallas(
        cfg, zp5, packed_t, sp_rows[:, :NUM_CAND].T, sp_tcx, sp_tcy,
        interpret, int_prio=int_prio, packed_T=packed_T,
    )                                                        # [S, 9b, 2]

    # Window-query bookkeeping (identical to the XLA version).
    bx = jnp.clip(sp_tcx - 2, 0, tx - 5)
    by = jnp.clip(sp_tcy - 2, 0, ty - 5)
    qx = jnp.clip(sp_tcx - 1, 0, tx - 3) - bx
    qy = jnp.clip(sp_tcy - 1, 0, ty - 3) - by
    qcol = bx[:, None] + qx[:, None] + jnp.arange(3, dtype=jnp.int32)[None]
    qrow0 = (by + qy)[:, None] * b
    q_slots = (
        (qcol[:, :, None] * ty) * b
        + qrow0[:, :, None]
        + jnp.arange(3 * b, dtype=jnp.int32)[None, None, :]
    ).reshape(s_cap, q_len)
    q_id = jnp.where(
        spill_valid[:, None],
        packed_t[q_slots.reshape(-1), ROW_ID].reshape(s_cap, q_len),
        -1.0,
    )

    # Spills' OWN rows: [S] queries vs their 3x3 packed window + the
    # whole spill list (exactly the XLA version's last column).
    own = _spill_own_rows(cfg, zp, packed_t, sp, sp_tcx, sp_tcy,
                          spill_valid)                       # [S, 1, 2]

    out = jnp.concatenate([out_win, own], axis=1)            # [S, 9b+1, 2]
    q_id_full = jnp.concatenate([q_id, sp["id"][:, None]], axis=1)
    return out, q_id_full, q_slots


def zanlungo_fused(cfg: BucketConfig, zp, position, velocity, self_pref,
                   pref_committed, priority, eyesight, alive, rec_vel,
                   interpret: bool = False, use_pack_kernel: bool = False,
                   spill_capacity: int = 0, presorted: bool = False,
                   int_prio: bool = False, binning=None,
                   dual_row: bool = False, fused_spills: bool = False):
    """Full fused pass: bucketize -> kernel -> unbucketize.

    Signature mirrors models/local.py zanlungo_velocity (minus the
    candidate table).  Returns (vel [N, 2], max_tile_occupancy, dropped).

    With ``spill_capacity`` > 0, bucket overflow (tile occupancy >
    ``cfg.bucket``) is repaired EXACTLY and ``dropped`` counts only what
    the static caps could not cover (plus pack-kernel window overflow).
    With 0 (off), overflow agents keep ``rec_vel`` and vanish as
    candidates — silent truncation, surfaced through ``dropped``.

    ``fused_spills`` (the default): spills ride the MAIN kernel as a
    fourth candidate segment on flagged sub-blocks, so affected packed
    queries get their exact forces in one pass and only the spills' own
    rows run the small oracle-math pass (_spill_own_rows) — replacing
    the per-spill window-recompute kernel + affected-row scatter of
    :func:`spill_patch` (measured +6.1 ms at the 1M bench's ~60-spill
    steps, perf/step_parts.py).  Affected queries' force sums append
    spill addends after the window lanes instead of the patch's
    window-order recompute — the same tolerance class the patch already
    had ("f32 summation order differs ... on overwritten rows").  Spill
    storms past min(128, spill_capacity) fall back to the full
    :func:`spill_patch` (whose recompute overwrites any partial fused
    contribution — idempotent, exact either way).
    """
    dtype = position.dtype
    tile_xy = None
    bin3 = None
    if binning is not None:
        # (key, bpos, max_occ, n_bucket_over) carried by the
        # skin-deferred presort (core/step.py): the state is still in
        # the last sort's order and every agent's tile key is unchanged
        # within the skin margin, so key + rank are skipped and the
        # spill windows center on the carried tiles.
        key_c, bpos_c, occ_c, over_c = binning
        bin3 = (bpos_c, occ_c, over_c)
        t_alive = jnp.clip(key_c, 0, cfg.n_tiles - 1)
        tile_xy = (t_alive // jnp.int32(cfg.ty),
                   t_alive % jnp.int32(cfg.ty))
    packed_t, packed_T, bucket_pos, max_occ, dropped = bucketize(
        cfg, position, velocity, pref_committed, self_pref, priority,
        eyesight, rec_vel, alive, use_pack_kernel=use_pack_kernel,
        interpret=interpret, presorted=presorted, binning=bin3,
    )
    zparams4 = zparams5(zp)

    # ---- fused-spill discovery (before the kernel): the first
    # min(128, spill_capacity) bucket-overflow agents become the
    # kernel's fourth candidate segment.  128 == the kernel's C so every
    # compaction segment shares the [C, C] tri geometry.
    S_K = 128
    use_fsp = bool(
        spill_capacity > 0 and fused_spills
        and cfg.tx >= 5 and cfg.ty >= 5
    )
    spill_ext = None
    if use_fsp:
        n = position.shape[0]
        f32 = jnp.float32
        fused_cap = min(S_K, int(spill_capacity))
        c_sp = compact_indices(alive & (bucket_pos >= cfg.slots), S_K)
        n_spill, spill_idx = c_sp.count, c_sp.idx
        lane_i = jnp.arange(S_K, dtype=jnp.int32)
        live = c_sp.valid & (lane_i < fused_cap)
        fits = n_spill <= jnp.int32(fused_cap)
        sc = jnp.clip(spill_idx, 0, n - 1)
        if tile_xy is not None:
            sp_tcx = jnp.where(live, tile_xy[0][sc], 1)
            sp_tcy = jnp.where(live, tile_xy[1][sc], 1)
        else:
            inv_tile = 1.0 / cfg.tile_size
            sp_tcx = jnp.where(live, jnp.clip(jnp.floor(
                (position[sc, 0] - cfg.offset[0]) * inv_tile
            ).astype(jnp.int32), 0, cfg.tx - 1), 1)
            sp_tcy = jnp.where(live, jnp.clip(jnp.floor(
                (position[sc, 1] - cfg.offset[1]) * inv_tile
            ).astype(jnp.int32), 0, cfg.ty - 1), 1)
        sp = dict(
            pos=position[sc].astype(f32),
            vel=velocity[sc].astype(f32),
            prefc=pref_committed[sc].astype(f32),
            spref=self_pref[sc].astype(f32),
            prio=priority[sc].astype(f32),
            eye=eyesight[sc].astype(f32),
            rec=rec_vel[sc].astype(f32),
            id=jnp.where(live, spill_idx, -1).astype(f32),
        )
        sp_T = jnp.stack([
            sp["pos"][:, 0], sp["pos"][:, 1],
            sp["vel"][:, 0], sp["vel"][:, 1],
            sp["prefc"][:, 0], sp["prefc"][:, 1],
            sp["prio"], sp["id"],
        ], axis=0)                              # [NUM_CAND, S_K]
        spill_ext = (_spill_flags(cfg, sp_tcx, sp_tcy, live), sp_T)

    out = zanlungo_forces_bucketed(cfg, zparams4, packed_t,
                                   interpret=interpret, int_prio=int_prio,
                                   packed_T=packed_T, dual_row=dual_row,
                                   spill_ext=spill_ext)
    ok = (bucket_pos < cfg.slots) & alive
    # Plain row gather: with presort the indices are MONOTONE, which the
    # hardware rewards (~5.4 ms at 1M vs ~10 for random order); a Pallas
    # windowed one-hot compaction kernel measured SLOWER (8.8 ms,
    # perf/ab_pack.py round 3) — window DMA + one-hot compare overhead
    # exceeds the per-row gather cost it saves.  Don't retry.
    vel = out[jnp.clip(bucket_pos, 0, cfg.slots - 1)].astype(dtype)
    vel = jnp.where(ok[:, None], vel, rec_vel)
    n_bucket_over = jnp.sum(
        (alive & (bucket_pos >= cfg.slots)).astype(jnp.int32)
    )
    # Pack-window overflow leaves an agent's assigned slot holding the
    # SENTINEL row while its bucket_pos < slots, so the gather above
    # reads the sentinel slot's zero output and the agent would freeze.
    # Such agents must keep rec_vel like every other unpacked agent
    # (test_overflow_agents_keep_rec_vel's contract).  The [N] audit
    # gather runs only when pack overflow actually happened (lax.cond —
    # clean steps pay nothing); slot assignment is injective, so a slot
    # is either the agent's own row or the sentinel.

    def _fix_pack_dropped(v):
        landed = packed_t[
            jnp.clip(bucket_pos, 0, cfg.slots - 1), ROW_ID
        ] >= 0
        return jnp.where((ok & ~landed)[:, None], rec_vel.astype(dtype),
                         v)

    vel = jax.lax.cond(
        dropped.astype(jnp.int32) > n_bucket_over,
        _fix_pack_dropped, lambda v: v, vel,
    )
    if spill_capacity > 0:
        # `dropped` from bucketize = bucket overflow + pack overflow;
        # the spill machinery resolves the bucket-overflow part exactly.
        if use_fsp:
            # Affected packed queries were already fixed IN the kernel
            # (fourth segment); only the spills' own velocities remain.
            def _fused(v):
                own = _spill_own_rows(
                    cfg, zp, packed_t, sp, sp_tcx, sp_tcy, live
                )[:, 0, :]
                tgt = jnp.where(live, spill_idx, n)
                return (
                    v.at[tgt].set(own.astype(v.dtype), mode="drop"),
                    jnp.zeros((), jnp.int32),
                )

            def _storm(v):
                # More spills than the fused segment holds: the full
                # patch recomputes every affected query from scratch
                # (idempotent overwrite — any partial fused contribution
                # is replaced, not doubled).
                return spill_patch(
                    cfg, zp, position, velocity, self_pref,
                    pref_committed, priority, eyesight, alive, rec_vel,
                    packed_t, bucket_pos, v, spill_capacity,
                    interpret=interpret, int_prio=int_prio,
                    packed_T=packed_T, tile_xy=tile_xy,
                )

            vel, unresolved = jax.lax.cond(
                n_spill > 0,
                lambda v: jax.lax.cond(fits, _fused, _storm, v),
                lambda v: (v, jnp.zeros((), jnp.int32)),
                vel,
            )
        else:
            vel, unresolved = spill_patch(
                cfg, zp, position, velocity, self_pref, pref_committed,
                priority, eyesight, alive, rec_vel, packed_t, bucket_pos,
                vel, spill_capacity, interpret=interpret,
                int_prio=int_prio, packed_T=packed_T, tile_xy=tile_xy,
            )
        pack_over = dropped - n_bucket_over  # pack-kernel window overflow
        dropped = (unresolved + pack_over).astype(jnp.int32)
    return vel, max_occ, dropped
