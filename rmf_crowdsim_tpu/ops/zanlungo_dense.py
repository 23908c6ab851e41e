"""Dense (bucket-free) fused Zanlungo Pallas TPU kernel.

The bucketed kernel (ops/zanlungo_pallas.py) pads agents into fixed
per-tile buckets: ~55% fill at the optimum, a ~7.8 ms MXU pack per step
to build the padded plane, a monotone gather back, and a whole spill
subsystem for bucket overflow.  This module removes the buckets: the
tile-SORTED rows themselves are the layout.

Layout ("compressed cell list"):

1.  Same supertile framing as the bucketed kernel (tile_size >=
    max_eyesight, ``tx`` x ``ty`` grid, flat id ``t = tcx * ty + tcy``,
    column-major).  Reuses :func:`zanlungo_pallas.tile_key`.
2.  Agents are tile-sorted (the presorted step's invariant,
    core/step.py) — row i of the [16, N] feature plane IS sorted agent
    i.  No pack, no padded plane, no per-tile capacity, hence NO bucket
    overflow and no spill machinery on this path.
3.  Row ranges per tile come from one ``searchsorted`` over the sorted
    keys (``tile_start [n_tiles + 1]``), prefetched to SMEM.
4.  Kernel grid = (tx,): program c owns tile column c's rows
    [col_start[c], col_start[c+1]).  It DMAs three whole-column dense
    segments (columns c-1, c, c+1; static ``EXT_STRIP`` lanes from a
    128-aligned base), rolls the CENTER segment so lane 0 == the
    column's first row, pre-transposes it into a [cap, 16] query plane
    (one [16, 128] in-kernel transpose per 128 rows), and loops over
    32-row query sub-blocks.  Per sub-block:
    - the query rows' tile span [t_lo, t_hi] comes from a min/max over
      the carried-tile feature row (ROW_TCY);
    - per neighbor column, the candidate window is the dense row range
      of tiles [t_lo - 1, t_hi + 1]: a 128-aligned 256-lane read ROLLED
      by the misalignment (any shift in [0, 128) — per-tile offsets are
      arbitrary, so the bucketed kernel's static pre-roll phases don't
      apply), masked to the true extent;
    - when every window extent fits 128 lanes (~100% at production
      densities: mean extent ~(span + 2) * occupancy), the sub-block
      runs the same dual-row / shared-union / full-width compacted tier
      machinery as the bucketed kernel, at identical 3x128-lane shapes;
    - otherwise an exact FULL-COLUMN SWEEP evaluates the sub-block
      against all three whole strips in 256-lane chunks (two passes:
      min-TTC, then force) — the rare-tail analog of the bucketed
      kernel's spill patch, fused into the kernel.

Column capacity: the per-program strip DMA is statically sized at
``col_cap`` rows (default ~2x the uniform mean, a >=40-sigma Poisson
bound).  Columns holding more rows drop the surplus from BOTH query and
candidate sets — the one capacity narrowing of this engine, surfaced
loudly through ``dropped`` (and the host's raise-by-default truncation
handling), exactly like bucket overflow before the spill patch existed.
Kernel work scales with LIVE rows (empty sub-blocks skip), so a
generous ``col_cap`` costs HBM for the padded output only.

Reference parity: the pair math is the shared :func:`_pair_ttc` /
:func:`_pair_force` (zanlungo.rs:49-218 via models/local.py, the
oracle); neighbor masking is the strict ``dist < eyesight`` of
location_hash_2d.rs:251.  f32 force-sum lane order differs from the
bucketed kernel (candidates arrive in sorted-row order, not bucket-slot
order) — the tolerance class every fast path here already accepts.

Carried binning (skin-deferred presort): identical contract to the
bucketed kernel — ROW_TCY carries the SORT-TIME tile row and windows
center on sort-time tiles; the skin margin keeps every true neighbor
pair within +-1 sort-time tile (core/step.py skin_mode).  Fresh-dead
rows pack inert (position sentinel, id -1).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .zanlungo_pallas import (
    NUM_CAND,
    NUM_F,
    ROW_EYE,
    ROW_FX,
    ROW_FY,
    ROW_ID,
    ROW_PRIO,
    ROW_PX,
    ROW_PY,
    ROW_RX,
    ROW_RY,
    ROW_SPX,
    ROW_SPY,
    ROW_VX,
    ROW_VY,
    _pair_force,
    _pair_ttc,
    _POS_SENTINEL,
    zparams5,
)

# Row 13 is free in the dense layout (the bucketed kernel's ROW_BPOS is
# pack-only): it carries the query's SORT-TIME tile row (tcy, exact in
# f32), from which each sub-block derives its window span in-kernel.
ROW_TCY = 13

SUB_Q = 32          # query rows per sub-block (dual halves of 16)
_WIN = 256          # aligned candidate-window read width (lanes)
_C = 128            # compacted/tier lane width (== one vreg row)


@dataclasses.dataclass(frozen=True)
class DenseConfig:
    """Static geometry of the dense tile-sorted layout.

    Attribute-compatible with :class:`zanlungo_pallas.BucketConfig` for
    :func:`zanlungo_pallas.tile_key` (tile_size/offset/tx/ty/n_tiles).
    """

    tile_size: float
    offset: Tuple[float, float]
    tx: int          # supertile columns (>= 3)
    ty: int          # supertile rows
    col_cap: int     # static rows per column strip (multiple of 128)

    @property
    def n_tiles(self) -> int:
        return self.tx * self.ty

    @property
    def slots(self) -> int:
        """Padded output rows (tx * col_cap) — the dense analog of the
        bucketed plane's slot count, for shape bookkeeping."""
        return self.tx * self.col_cap

    @property
    def ext_strip(self) -> int:
        # Column strip DMA width: col_cap rows + 384 slack so every
        # 128-aligned 256-lane window read stays in bounds (see the
        # in-bounds argument in _dense_meta).
        return self.col_cap + 384

    def __post_init__(self):
        assert self.tx >= 3 and self.ty >= 1, "world must span >= 3 columns"
        assert self.col_cap % 128 == 0 and self.col_cap >= 256
        assert self.col_cap % SUB_Q == 0

    @classmethod
    def create(cls, width: float, height: float, offset: Tuple[float, float],
               max_eyesight: float, capacity: int,
               tile_size: float | None = None,
               col_headroom: float = 2.0) -> "DenseConfig":
        """``tile_size`` defaults to max_eyesight (the coverage minimum;
        unlike the bucketed kernel there is NO (sub+2)*bucket == 128
        constraint — any tile >= eyesight is legal).  ``col_cap`` is the
        uniform per-column mean times ``col_headroom``, rounded to 128:
        at 1M agents over 239 columns, headroom 2.0 is a ~65-sigma
        Poisson bound; clustered worlds that exceed it drop the surplus
        loudly (see the module docstring)."""
        tile = max(float(tile_size or 0.0), float(max_eyesight), 1e-6)
        tx = max(3, int(math.ceil(width / tile)))
        ty = max(1, int(math.ceil(height / tile)))
        mean = capacity / tx
        cap = int(math.ceil(mean * col_headroom / 128.0)) * 128
        cap = max(cap, 256)
        return cls(tile_size=tile,
                   offset=(float(offset[0]), float(offset[1])),
                   tx=tx, ty=ty, col_cap=cap)


# ---------------------------------------------------------------------------
# jnp side: prep (sorted rows -> plane + tables), unpack
# ---------------------------------------------------------------------------


def dense_prep(cfg: DenseConfig, key_sorted, position, velocity,
               pref_committed, self_pref, priority, eyesight, rec_vel,
               alive):
    """Build the kernel inputs from TILE-SORTED agent rows.

    ``key_sorted`` [N] int32: each row's tile id in :func:`tile_key`
    order (dead rows carry the ``n_tiles`` sentinel on fresh sorts; on
    carried binnings they keep their sort-time key and are masked inert
    here — fresh-dead masking, exactly like bucketize's carried path).

    Returns (feat_T [16, N + 384] f32, tile_start [n_tiles + 1] i32,
    qn [n_blocks] i32 — row extent per 32-row sub-block, dma [tx, 8]
    i32 per-program scalars, bpos [N] i32 — padded output row per agent
    (== tx * col_cap for column-overflow rows), n_col_over [] i32,
    max_occ [] i32).
    """
    n = position.shape[0]
    assert n < (1 << 24), "row ids must be exact in f32"
    f32 = jnp.float32
    cap, tx, ty = cfg.col_cap, cfg.tx, cfg.ty
    # >= ext_strip so the whole-strip DMA is always in bounds even when
    # n < col_cap (tiny scenes).
    n_pad = max(n + 384, cfg.ext_strip)

    # Row ranges per tile / column (sorted keys -> one searchsorted).
    tile_start = jnp.searchsorted(
        key_sorted, jnp.arange(cfg.n_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)
    col_start = tile_start[:: ty]                      # [tx + 1] view
    col_len = col_start[1:] - col_start[:-1]           # [tx]
    n_col_over = jnp.sum(jnp.maximum(col_len - cap, 0)).astype(jnp.int32)
    occ = tile_start[1:] - tile_start[:-1]
    max_occ = jnp.max(
        jnp.where(jnp.arange(cfg.n_tiles) < cfg.n_tiles, occ, 0)
    ).astype(jnp.int32)

    # Padded output row per agent: col * cap + rank-in-column.  The
    # column start per ROW comes from a running max over column-change
    # marks (rows are column-sorted), NOT a col_start[col] gather —
    # small-table gathers pay the measured ~10 ns/row floor
    # (DESIGN_NOTES "permutation floor"), the scan is ~0.2 ms at 1M.
    idx = jnp.arange(n, dtype=jnp.int32)
    col = jnp.clip(key_sorted // jnp.int32(ty), 0, tx)  # dead -> tx
    changed = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), col[1:] != col[:-1]]
    )
    cs_row = jax.lax.associative_scan(
        jnp.maximum, jnp.where(changed, idx, -1)
    )                                                   # col_start per row
    local = idx - cs_row
    in_cap = (col < tx) & (local < cap)
    bpos = jnp.where(in_cap, col * jnp.int32(cap) + local,
                     jnp.int32(cfg.slots))

    # Feature plane [16, N + 384], lane-major (axis-0 stack of [N]
    # columns — no [N, 16] transpose ever materializes).  Fresh-dead
    # masking unconditionally: on fresh sorts dead rows sort past every
    # column (harmless), on carried binnings they sit interleaved and
    # MUST read as inert candidates/queries.
    px = jnp.where(alive, position[:, 0].astype(f32), _POS_SENTINEL)
    py = jnp.where(alive, position[:, 1].astype(f32), _POS_SENTINEL)
    idc = jnp.where(alive, idx.astype(f32), -1.0)
    tcy = jnp.clip(key_sorted, 0, cfg.n_tiles - 1) % jnp.int32(ty)
    cols = [
        px,
        py,
        velocity[:, 0].astype(f32),
        velocity[:, 1].astype(f32),
        pref_committed[:, 0].astype(f32),
        pref_committed[:, 1].astype(f32),
        priority.astype(f32),
        idc,
        rec_vel[:, 0].astype(f32),
        rec_vel[:, 1].astype(f32),
        eyesight.astype(f32),
        self_pref[:, 0].astype(f32),
        self_pref[:, 1].astype(f32),
        tcy.astype(f32),               # ROW_TCY: sort-time tile row
        jnp.zeros((n,), f32),
        jnp.ones((n,), f32),
    ]
    feat_T = jnp.stack(cols, axis=0)                    # [16, N]
    pad = jnp.zeros((NUM_F, n_pad - n), f32)
    pad = pad.at[ROW_PX].set(_POS_SENTINEL)
    pad = pad.at[ROW_PY].set(_POS_SENTINEL)
    pad = pad.at[ROW_ID].set(-1.0)
    feat_T = jnp.concatenate([feat_T, pad], axis=1)     # [16, n_pad]

    # Per-sub-block row extent (skip condition): elementwise from
    # col_len, no gathers.  n_blocks = tx * (cap / SUB_Q).
    nsub = cap // SUB_Q
    s_off = jnp.arange(nsub, dtype=jnp.int32)[None, :] * SUB_Q
    qn = jnp.clip(col_len[:, None] - s_off, 0, SUB_Q)
    qn = qn.reshape(-1).astype(jnp.int32)               # [tx * nsub]

    # Per-program scalars: [B0, B2, cs_c, m, occ_c, 0, 0, 0].
    # B_k = 128-aligned DMA base of neighbor strip k (clamped so the
    # EXT_STRIP read stays inside [0, n_pad]); the center strip's base
    # is aligned the same way and then ROLLED by m = cs_c - base so
    # lane 0 == the column's first row.  In-bounds argument for every
    # window read: a window's local offset loc = w0 - base (neighbors) /
    # w0 - cs_c (center) satisfies loc <= n - (n_pad - EXT_STRIP)
    # = EXT_STRIP - 384, so align128(loc) + 256 <= EXT_STRIP - 128.
    ext_strip = cfg.ext_strip
    ccol = jnp.arange(tx, dtype=jnp.int32)

    def base_of(cs):
        return jnp.clip((cs // 128) * 128, 0, n_pad - ext_strip)

    cs_l = col_start[jnp.clip(ccol - 1, 0, tx)]
    cs_c = col_start[ccol]
    cs_r = col_start[jnp.clip(ccol + 1, 0, tx)]
    b0 = base_of(cs_l)
    bc = base_of(cs_c)
    b2 = base_of(cs_r)
    dma = jnp.stack(
        [b0, b2, cs_c, cs_c - bc, jnp.minimum(col_len, cap),
         jnp.zeros_like(b0), jnp.zeros_like(b0), jnp.zeros_like(b0)],
        axis=1,
    ).astype(jnp.int32)                                 # [tx, 8]

    return feat_T, tile_start, qn, dma, bpos, n_col_over, max_occ


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_dense_kernel(cfg: DenseConfig, int_prio: bool = False,
                       dual_row: bool = True):
    cap, tx, ty = cfg.col_cap, cfg.tx, cfg.ty
    ext_strip = cfg.ext_strip
    nsub = cap // SUB_Q
    n_sweep = ext_strip // _WIN
    H = SUB_Q // 2

    def kernel(zp_ref, ts_ref, qn_ref, dma_ref, feat_any, out_ref,
               strips, cen_r, qT, sem):
        # strips: [3, 8-or-16 rows, ext_strip] raw segments (k == 1 holds
        # all 16 rows; neighbors only the NUM_CAND candidate rows);
        # cen_r: [16, ext_strip] center rolled to column-local lanes;
        # qT:   [cap, 16] pre-transposed query plane.
        c = pl.program_id(0)
        zp = (zp_ref[0], zp_ref[1], zp_ref[2], zp_ref[3], zp_ref[4])
        radius = zp_ref[3]
        inf = jnp.float32(jnp.inf)

        cs_c = dma_ref[c, 2]
        m_roll = dma_ref[c, 3]
        occ_c = dma_ref[c, 4]

        blk0 = c * nsub
        strip_live = occ_c  # column row count: 0 -> nothing to do

        def strip_dma(k, base, rows):
            return pltpu.make_async_copy(
                feat_any.at[:rows, pl.ds(base, ext_strip)],
                strips.at[k, :rows],
                sem.at[k],
            )

        @pl.when(strip_live > 0)
        def _dma_roll_transpose():
            b0 = pl.multiple_of(dma_ref[c, 0], 128)
            bc = pl.multiple_of(cs_c - m_roll, 128)
            b2 = pl.multiple_of(dma_ref[c, 1], 128)
            strip_dma(0, b0, NUM_CAND).start()
            strip_dma(1, bc, NUM_F).start()
            strip_dma(2, b2, NUM_CAND).start()
            strip_dma(0, b0, NUM_CAND).wait()
            strip_dma(1, bc, NUM_F).wait()
            strip_dma(2, b2, NUM_CAND).wait()

            # Center strip -> column-local lanes (lane i == column row
            # i).  One dynamic roll per program; the wrapped tail
            # (lanes >= ext_strip - m) is never read (every window/query
            # read ends <= ext_strip - 128 and m < 128).
            cen_r[...] = pltpu.roll(
                strips[1, :NUM_F],
                jax.lax.rem(jnp.int32(ext_strip) - m_roll,
                            jnp.int32(ext_strip)),
                axis=1,
            )

            # Query plane: [cap, 16] sublane-major, one [16, 128]
            # in-kernel transpose per 128 rows (skipping dead groups).
            def tgroup(g, _):
                @pl.when(g * 128 < occ_c)
                def _():
                    g0 = pl.multiple_of(g * 128, 128)
                    qT[pl.ds(g0, 128), :] = cen_r[:, pl.ds(g0, 128)].T
                return 0

            jax.lax.fori_loop(0, cap // 128, tgroup, 0)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        lane_iota2 = jax.lax.broadcasted_iota(jnp.int32, (1, _WIN), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB_Q, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (_C, _C), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (_C, _C), 1)
        tri = (ci < rj).astype(jnp.float32)
        r_iota = jax.lax.broadcasted_iota(
            jnp.int32, (_C, 1), 0
        ).astype(jnp.float32)
        ri8 = jax.lax.broadcasted_iota(jnp.int32, (NUM_CAND, 1), 0)
        sent_col = jnp.where(
            (ri8 == ROW_PX) | (ri8 == ROW_PY), _POS_SENTINEL,
            jnp.where(ri8 == ROW_ID, -1.0, 0.0),
        )

        # Which neighbor strips are real columns (world edges).
        k_ok = [c > 0, jnp.bool_(True), c < tx - 1]

        def sub_block(s, _):
            @pl.when(qn_ref[blk0 + s] > 0)
            def _live():
                _sub_block_body(s)
            return 0

        def _sub_block_body(s):
            q0 = s * SUB_Q
            qn = qn_ref[blk0 + s]
            qblk = qT[pl.ds(q0, SUB_Q), :]               # [32, 16]
            qvalid = row_iota < qn                       # [32, 1]

            def qrow(r):
                return qblk[:, r:r + 1]

            qpx_, qpy_ = qrow(ROW_PX), qrow(ROW_PY)
            qvx_, qvy_ = qrow(ROW_VX), qrow(ROW_VY)
            qprio_ = qrow(ROW_PRIO)
            qeye_raw = qrow(ROW_EYE)
            qspx_, qspy_ = qrow(ROW_SPX), qrow(ROW_SPY)
            # Foreign lanes (rows past the column end belong to the NEXT
            # column) and dead rows: id -1 (kills pair masks + bbox
            # liveness) and eyesight 0 (kills bbox dilation).
            qid_ = jnp.where(qvalid, qrow(ROW_ID), -1.0)
            qeye_ = jnp.where(qid_ >= 0, qeye_raw, 0.0)

            # Window tile span from the carried tile row (min/max over
            # valid rows).  All-invalid blocks produce a clamped empty
            # window (ext <= 0 -> every lane masked).
            tcy_r = qrow(ROW_TCY)
            big = jnp.float32(1e9)
            t_lo = jnp.min(jnp.where(qid_ >= 0, tcy_r, big)).astype(
                jnp.int32)
            t_hi = jnp.max(jnp.where(qid_ >= 0, tcy_r, -big)).astype(
                jnp.int32)
            t_lo = jnp.clip(t_lo - 1, 0, ty - 1)
            t_hi = jnp.clip(t_hi + 1, -1, ty - 1)

            locs = []
            exts = []
            for k in range(3):
                ck = jnp.clip(c + (k - 1), 0, tx - 1)
                w0 = ts_ref[ck * ty + t_lo]
                w1 = ts_ref[ck * ty + t_hi + 1]
                if k == 1:
                    base = cs_c
                else:
                    base = dma_ref[c, 0 if k == 0 else 1]
                # Clamps: ``loc`` stays inside the strip's window-read
                # range (only binding when a neighbor column overflowed
                # col_cap — those candidates are the counted overflow
                # casualties); the CENTER extent additionally stops
                # before the rolled strip's wrapped tail (lanes past
                # cap + 256 would be roll garbage, not data; foreign
                # next-column rows below that are real and masked by
                # distance).
                loc = jnp.clip(w0 - base, 0, ext_strip - _WIN)
                ext = jnp.maximum(w1 - w0, 0)
                if k == 1:
                    ext = jnp.minimum(ext, cap + 256 - loc)
                locs.append(loc)
                exts.append(ext)
            m_ext = jnp.maximum(jnp.maximum(exts[0], exts[1]), exts[2])

            def read_win(k, off, width):
                # One-shot ref indexing (a staged ref[...] read followed
                # by pl.ds would materialize the whole strip).
                if k == 1:
                    return cen_r[0:NUM_CAND, pl.ds(off, width)]
                return strips[k, 0:NUM_CAND, pl.ds(off, width)]

            def write_out(t_i, fx, fy):
                has = jnp.isfinite(t_i)
                inv_mass = 1.0 / zp[2]
                out_x = qrow(ROW_RX) + jnp.where(has, fx * inv_mass, 0.0)
                out_y = qrow(ROW_RY) + jnp.where(has, fy * inv_mass, 0.0)
                out_ref[pl.ds(q0, SUB_Q), 0:1] = out_x
                out_ref[pl.ds(q0, SUB_Q), 1:2] = out_y

            def seg_rows(seg, r):
                return seg[0][r:r + 1, :]

            def masks_of(segs, qpxs, qpys, qeyes, qids):
                out = []
                for sg in segs:
                    cpx_, cpy_ = seg_rows(sg, ROW_PX), seg_rows(sg, ROW_PY)
                    cid_ = seg_rows(sg, ROW_ID)
                    dx = cpx_ - qpxs
                    dy = cpy_ - qpys
                    out.append(
                        (dx * dx + dy * dy < qeyes * qeyes)
                        & (cid_ != qids)
                        & sg[1]
                    )
                return out

            def full_passes(segs):
                masks = masks_of(segs, qpx_, qpy_, qeye_, qid_)
                t_i = jnp.full((SUB_Q, 1), inf, jnp.float32)
                for k, sg in enumerate(segs):
                    cpx_, cpy_ = seg_rows(sg, ROW_PX), seg_rows(sg, ROW_PY)
                    cvx_, cvy_ = seg_rows(sg, ROW_VX), seg_rows(sg, ROW_VY)
                    ttc, _ = _pair_ttc(qvx_, qvy_, qpx_, qpy_,
                                       cvx_, cvy_, cpx_, cpy_, radius)
                    ttc = jnp.where(masks[k], ttc, inf)
                    t_i = jnp.minimum(
                        t_i, jnp.min(ttc, axis=1, keepdims=True)
                    )
                fx = jnp.zeros((SUB_Q, 1), jnp.float32)
                fy = jnp.zeros((SUB_Q, 1), jnp.float32)
                for k, sg in enumerate(segs):
                    pfx, pfy = _pair_force(
                        zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_,
                        qprio_,
                        seg_rows(sg, ROW_PX), seg_rows(sg, ROW_PY),
                        seg_rows(sg, ROW_VX), seg_rows(sg, ROW_VY),
                        seg_rows(sg, ROW_FX), seg_rows(sg, ROW_FY),
                        seg_rows(sg, ROW_PRIO), masks[k],
                        int_prio=int_prio,
                    )
                    fx = fx + jnp.sum(pfx, axis=1, keepdims=True)
                    fy = fy + jnp.sum(pfy, axis=1, keepdims=True)
                write_out(t_i, fx, fy)

            def bbox_union(q_sl, segs):
                live = qid_[q_sl] >= 0

                def mn(v):
                    return jnp.min(
                        jnp.where(live, v, jnp.float32(1e30)),
                        axis=0, keepdims=True,
                    )

                def mx(v):
                    return jnp.max(
                        jnp.where(live, v, jnp.float32(-1e30)),
                        axis=0, keepdims=True,
                    )

                lo_x, hi_x = mn(qpx_[q_sl]), mx(qpx_[q_sl])
                lo_y, hi_y = mn(qpy_[q_sl]), mx(qpy_[q_sl])
                eye = jnp.max(qeye_[q_sl], axis=0, keepdims=True)
                eye2 = eye * eye
                parts = []
                for sg in segs:
                    cpx_, cpy_ = seg_rows(sg, ROW_PX), seg_rows(sg, ROW_PY)
                    dx = jnp.maximum(
                        jnp.maximum(lo_x - cpx_, cpx_ - hi_x), 0.0)
                    dy = jnp.maximum(
                        jnp.maximum(lo_y - cpy_, cpy_ - hi_y), 0.0)
                    parts.append(jnp.where(
                        sg[1] & (dx * dx + dy * dy < eye2), 1.0, 0.0))
                return jnp.concatenate(parts, axis=1)   # [1, 3C] 0/1

            def tri_rank(uv):
                parts = []
                off = None
                for k in range(3):
                    seg = uv[:, k * _C:(k + 1) * _C]
                    r = jax.lax.dot_general(
                        seg, tri, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                    parts.append(r if off is None else r + off)
                    if k < 2:
                        sm = jnp.sum(seg, axis=1, keepdims=True)
                        off = sm if off is None else off + sm
                return jnp.concatenate(parts, axis=1)

            def split3(wv):
                hi = wv.astype(jnp.bfloat16)
                r1 = wv - hi.astype(jnp.float32)
                mid = r1.astype(jnp.bfloat16)
                lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                return hi, mid, lo

            def compact_force(w3, p_t, unfilled):
                comp3 = jax.lax.dot_general(
                    w3, p_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                comp = (comp3[:NUM_CAND] + comp3[NUM_CAND:2 * NUM_CAND]) \
                    + comp3[2 * NUM_CAND:]
                return comp + unfilled * sent_col

            def _tiers(segs):
                """Dual-row / shared-union / full-width dispatch — the
                bucketed kernel's _compacted_tiers at SUB_Q == 32
                (ops/zanlungo_pallas.py carries the design notes)."""
                w_all = jnp.concatenate([sg[0] for sg in segs], axis=1)
                w3 = jnp.concatenate(split3(w_all), axis=0)  # [24, 3C]

                def shared_tier():
                    u = bbox_union(slice(0, SUB_Q), segs)
                    count = jnp.sum(u)

                    @pl.when(count <= jnp.float32(_C))
                    def _():
                        rank = tri_rank(u)
                        rank_m = jnp.where(u > 0, rank, -1.0)
                        p_t = jnp.where(
                            rank_m == r_iota, 1.0, 0.0
                        ).astype(jnp.bfloat16)
                        unfilled = jnp.where(
                            lane_iota < count.astype(jnp.int32), 0.0, 1.0)
                        comp = compact_force(w3, p_t, unfilled)

                        def ccrow(r):
                            return comp[r:r + 1, :]

                        cpx_, cpy_ = ccrow(ROW_PX), ccrow(ROW_PY)
                        cvx_, cvy_ = ccrow(ROW_VX), ccrow(ROW_VY)
                        cid_ = ccrow(ROW_ID)
                        d2 = (cpx_ - qpx_) ** 2 + (cpy_ - qpy_) ** 2
                        mask2 = ((d2 < qeye_ * qeye_) & (cid_ != qid_)
                                 & (cid_ >= 0))
                        ttc, _ = _pair_ttc(qvx_, qvy_, qpx_, qpy_,
                                           cvx_, cvy_, cpx_, cpy_, radius)
                        ttc = jnp.where(mask2, ttc, inf)
                        t_i = jnp.min(ttc, axis=1, keepdims=True)
                        pfx, pfy = _pair_force(
                            zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_,
                            qprio_, cpx_, cpy_, cvx_, cvy_,
                            ccrow(ROW_FX), ccrow(ROW_FY), ccrow(ROW_PRIO),
                            mask2, int_prio=int_prio,
                        )
                        write_out(
                            t_i,
                            jnp.sum(pfx, axis=1, keepdims=True),
                            jnp.sum(pfy, axis=1, keepdims=True),
                        )

                    @pl.when(count > jnp.float32(_C))
                    def _():
                        full_passes(segs)

                if not dual_row:
                    shared_tier()
                    return

                u0 = bbox_union(slice(0, H), segs)
                u1 = bbox_union(slice(H, SUB_Q), segs)
                c0 = jnp.sum(u0)
                c1 = jnp.sum(u1)
                dual_ok = (c0 + c1) <= jnp.float32(_C)

                @pl.when(dual_ok)
                def _dual():
                    u2 = jnp.concatenate([u0, u1], axis=0)
                    rank2 = tri_rank(u2)
                    rk0 = jnp.where(u0 > 0, rank2[0:1], -1.0)
                    rk1 = jnp.where(u1 > 0, rank2[1:2] + c0, -1.0)
                    p_t = jnp.where(
                        (rk0 == r_iota) | (rk1 == r_iota), 1.0, 0.0,
                    ).astype(jnp.bfloat16)
                    li = lane_iota
                    filled = li < (c0 + c1).astype(jnp.int32)
                    comp = compact_force(
                        w3, p_t, jnp.where(filled, 0.0, 1.0))

                    def ccrow(r):
                        return comp[r:r + 1, :]

                    lane_lo = li < c0.astype(jnp.int32)

                    def qseg(rv):
                        return jnp.where(lane_lo, rv[:H], rv[H:])

                    qpx2, qpy2 = qseg(qpx_), qseg(qpy_)
                    qvx2, qvy2 = qseg(qvx_), qseg(qvy_)
                    qprio2, qeye2 = qseg(qprio_), qseg(qeye_)
                    qid2 = qseg(qid_)
                    if int_prio:
                        qspx2, qspy2 = qvx2, qvy2  # unused on this path
                    else:
                        qspx2, qspy2 = qseg(qspx_), qseg(qspy_)

                    cpx_, cpy_ = ccrow(ROW_PX), ccrow(ROW_PY)
                    cvx_, cvy_ = ccrow(ROW_VX), ccrow(ROW_VY)
                    cid_ = ccrow(ROW_ID)
                    d2 = (cpx_ - qpx2) ** 2 + (cpy_ - qpy2) ** 2
                    mask2 = ((d2 < qeye2 * qeye2) & (cid_ != qid2)
                             & (cid_ >= 0))
                    ttc, _ = _pair_ttc(qvx2, qvy2, qpx2, qpy2,
                                       cvx_, cvy_, cpx_, cpy_, radius)
                    ttc = jnp.where(mask2, ttc, inf)
                    t_a = jnp.min(jnp.where(lane_lo, ttc, inf), axis=1,
                                  keepdims=True)
                    t_b = jnp.min(jnp.where(lane_lo, inf, ttc), axis=1,
                                  keepdims=True)
                    t_seg = jnp.where(lane_lo, t_a, t_b)
                    inv_a = 1.0 / jnp.where(t_a > 0, t_a, 1.0)
                    inv_b = 1.0 / jnp.where(t_b > 0, t_b, 1.0)
                    pfx, pfy = _pair_force(
                        zp, t_seg, qpx2, qpy2, qvx2, qvy2, qspx2, qspy2,
                        qprio2, cpx_, cpy_, cvx_, cvy_,
                        ccrow(ROW_FX), ccrow(ROW_FY), ccrow(ROW_PRIO),
                        mask2, int_prio=int_prio,
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

                @pl.when(jnp.logical_not(dual_ok))
                def _not_dual():
                    shared_tier()

            def _wide_segs():
                """Three 256-lane window segments for tier B (128 <
                m_ext <= 256): a 384-lane read from the 128-aligned
                base (in bounds: align128(loc) + 384 <= ext_strip, the
                slack DenseConfig.ext_strip provides), rolled so lane 0
                == the window start, truncated to 256 lanes."""
                segs = []
                for k in range(3):
                    loc = locs[k]
                    # Extra clamp vs tier A: locs is clipped to
                    # ext_strip - 256, so a column-overflow loc can sit
                    # past ext_strip - 384; clamp the base so the read
                    # stays in bounds (overflow scenes raise at the
                    # host through n_col_over anyway — when it is 0 the
                    # clamp never binds and sh < 128, so sh + ext <=
                    # 383 and the rolled window is exact).
                    loc_al = pl.multiple_of(
                        jnp.minimum((loc // 128) * 128,
                                    jnp.int32(ext_strip - 384)), 128)
                    sh = loc - loc_al
                    w = read_win(k, loc_al, 384)
                    w = pltpu.roll(
                        w, jax.lax.rem(jnp.int32(384) - sh,
                                       jnp.int32(384)), axis=1,
                    )[:, :2 * _C]
                    ok = (
                        (lane_iota2 < exts[k])
                        & (w[ROW_ID:ROW_ID + 1, :] >= 0)
                        & k_ok[k]
                    )
                    segs.append((w, ok))
                return segs

            def _sweep():
                """Exact fallback for window extents past 256 lanes
                (extreme hotspots): scan each strip's window range in
                256-lane chunks — min-TTC pass, then force pass.  The
                chunk loops are BOUNDED to the window's aligned span
                (the unbounded whole-strip version cost ~20% of the
                kernel at a 0.1% firing rate, perf/dense_stats.py);
                window bounds [loc, loc + ext) are applied as lane
                masks, so coverage is exact for ANY extent <= col_cap
                (the dense analog of the bucketed spill fallback)."""
                bounds = []
                for k in range(3):
                    j_lo = locs[k] // _WIN
                    j_hi = jnp.minimum(
                        (locs[k] + exts[k] + _WIN - 1) // _WIN,
                        jnp.int32(n_sweep),
                    )
                    live = jnp.asarray(k_ok[k]) & (exts[k] > 0)
                    bounds.append((j_lo, jnp.where(live, j_hi, j_lo)))

                def chunk_mask(k, j):
                    gl = lane_iota2 + j * _WIN
                    return (
                        (gl >= locs[k]) & (gl < locs[k] + exts[k])
                        & k_ok[k]
                    )

                def ttc_chunk(k):
                    def body(j, t_i):
                        j0 = pl.multiple_of(j * _WIN, _WIN)
                        w = read_win(k, j0, _WIN)
                        ok = (chunk_mask(k, j)
                              & (w[ROW_ID:ROW_ID + 1, :] >= 0))
                        cpx_, cpy_ = w[ROW_PX:ROW_PX + 1], \
                            w[ROW_PY:ROW_PY + 1]
                        cid_ = w[ROW_ID:ROW_ID + 1]
                        dxm = cpx_ - qpx_
                        dym = cpy_ - qpy_
                        mask = ((dxm * dxm + dym * dym < qeye_ * qeye_)
                                & (cid_ != qid_) & ok)
                        ttc, _ = _pair_ttc(
                            qvx_, qvy_, qpx_, qpy_,
                            w[ROW_VX:ROW_VX + 1], w[ROW_VY:ROW_VY + 1],
                            cpx_, cpy_, radius)
                        ttc = jnp.where(mask, ttc, inf)
                        return jnp.minimum(
                            t_i, jnp.min(ttc, axis=1, keepdims=True))
                    return body

                t_i = jnp.full((SUB_Q, 1), inf, jnp.float32)
                for k in range(3):
                    t_i = jax.lax.fori_loop(
                        bounds[k][0], bounds[k][1], ttc_chunk(k), t_i)

                def force_chunk(k):
                    def body(j, acc):
                        fx, fy = acc
                        j0 = pl.multiple_of(j * _WIN, _WIN)
                        w = read_win(k, j0, _WIN)
                        ok = (chunk_mask(k, j)
                              & (w[ROW_ID:ROW_ID + 1, :] >= 0))
                        cpx_, cpy_ = w[ROW_PX:ROW_PX + 1], \
                            w[ROW_PY:ROW_PY + 1]
                        cid_ = w[ROW_ID:ROW_ID + 1]
                        dxm = cpx_ - qpx_
                        dym = cpy_ - qpy_
                        mask = ((dxm * dxm + dym * dym < qeye_ * qeye_)
                                & (cid_ != qid_) & ok)
                        pfx, pfy = _pair_force(
                            zp, t_i, qpx_, qpy_, qvx_, qvy_,
                            qspx_, qspy_, qprio_,
                            cpx_, cpy_,
                            w[ROW_VX:ROW_VX + 1], w[ROW_VY:ROW_VY + 1],
                            w[ROW_FX:ROW_FX + 1], w[ROW_FY:ROW_FY + 1],
                            w[ROW_PRIO:ROW_PRIO + 1], mask,
                            int_prio=int_prio,
                        )
                        fx = fx + jnp.sum(pfx, axis=1, keepdims=True)
                        fy = fy + jnp.sum(pfy, axis=1, keepdims=True)
                        return (fx, fy)
                    return body

                acc = (jnp.zeros((SUB_Q, 1), jnp.float32),
                       jnp.zeros((SUB_Q, 1), jnp.float32))
                for k in range(3):
                    acc = jax.lax.fori_loop(
                        bounds[k][0], bounds[k][1], force_chunk(k), acc)
                write_out(t_i, acc[0], acc[1])

            # ---- tier dispatch -------------------------------------
            # A: every window fits one rolled 128-lane segment (the
            #    common case by construction: mean extent ~(span + 2
            #    tiles) * occupancy — DenseConfig.create's sizing), and
            #    the standard compacted-tier machinery runs at the
            #    bucketed kernel's exact 3x128 shapes.
            # B: 128 < m_ext <= 256 — direct evaluation of the three
            #    raw 256-lane windows (no compaction).  The hotspot
            #    tail is almost entirely here (m_ext p99.9 = 130 at
            #    the bench density, max 145-235 — perf/dense_stats.py),
            #    at ~2x a tier-A pass instead of the sweep's ~10x.
            # C: extreme dense-hotspot tail — exact bounded sweep.
            @pl.when(m_ext <= _C)
            def _tier_a():
                segs = []
                for k in range(3):
                    loc = locs[k]
                    loc_al = pl.multiple_of((loc // 128) * 128, 128)
                    sh = loc - loc_al
                    w = read_win(k, loc_al, _WIN)
                    w = pltpu.roll(
                        w, jax.lax.rem(jnp.int32(_WIN) - sh,
                                       jnp.int32(_WIN)), axis=1,
                    )[:, :_C]
                    ok = (
                        (lane_iota < exts[k])
                        & (w[ROW_ID:ROW_ID + 1, :] >= 0)
                        & k_ok[k]
                    )
                    segs.append((w, ok))
                _tiers(segs)

            @pl.when((m_ext > _C) & (m_ext <= 2 * _C))
            def _tier_b():
                full_passes(_wide_segs())

            @pl.when(m_ext > 2 * _C)
            def _tier_c():
                _sweep()

        @pl.when(strip_live > 0)
        def _run():
            jax.lax.fori_loop(0, nsub, sub_block, 0)

    return kernel


def zanlungo_forces_dense(cfg: DenseConfig, zp5, feat_T, tile_start, qn,
                          dma, interpret: bool = False,
                          int_prio: bool = False, dual_row: bool = True):
    """Run the dense kernel.  Returns [tx * col_cap, 2] f32 velocities in
    padded column order (garbage on rows holding no agent — callers
    gather live rows only, via ``bpos``)."""
    kernel = _make_dense_kernel(cfg, int_prio=int_prio, dual_row=dual_row)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cfg.tx,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (cfg.col_cap, 2), lambda c, *_: (c, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, NUM_F, cfg.ext_strip), jnp.float32),
            pltpu.VMEM((NUM_F, cfg.ext_strip), jnp.float32),
            pltpu.VMEM((cfg.col_cap, NUM_F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cfg.slots, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(zp5.astype(jnp.float32), tile_start, qn, dma, feat_T)


def zanlungo_fused_dense(cfg: DenseConfig, zp, position, velocity,
                         self_pref, pref_committed, priority, eyesight,
                         alive, rec_vel, key_sorted,
                         interpret: bool = False, int_prio: bool = False,
                         dual_row: bool = True):
    """Full dense pass over TILE-SORTED rows: prep -> kernel -> gather.

    ``key_sorted`` [N] int32: the rows' tile keys in sorted order — the
    presorted step's invariant (fresh or carried; core/step.py).
    Returns (vel [N, 2], max_tile_occupancy, dropped) with the same
    contract as :func:`zanlungo_pallas.zanlungo_fused`; ``dropped``
    counts column-capacity overflow (the one narrowing of this engine —
    module docstring)."""
    dtype = position.dtype
    feat_T, tile_start, qn, dma, bpos, n_over, max_occ = dense_prep(
        cfg, key_sorted, position, velocity, pref_committed, self_pref,
        priority, eyesight, rec_vel, alive,
    )
    out = zanlungo_forces_dense(
        cfg, zparams5(zp), feat_T, tile_start, qn, dma,
        interpret=interpret, int_prio=int_prio, dual_row=dual_row,
    )
    ok = (bpos < cfg.slots) & alive
    vel = out[jnp.clip(bpos, 0, cfg.slots - 1)].astype(dtype)
    vel = jnp.where(ok[:, None], vel, rec_vel)
    return vel, max_occ, n_over.astype(jnp.int32)
