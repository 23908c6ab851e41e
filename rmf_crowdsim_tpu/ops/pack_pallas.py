"""MXU one-hot pack kernel: bucketed scatter without XLA scatter.

XLA's row scatter costs ~137 ns/row on this stack (measured: 137 ms for
1M x 16 f32 rows — per-row-overhead bound), making it the single biggest
piece of the per-step bucketize.  This kernel replaces it:

- The packed array [slots, NUM_F] is split into *slot groups* of
  ``GROUP`` slots; kernel program g exclusively owns group g (blocked
  output spec — no write races, no prefill, complete coverage).
- Each program streams the sorted feature rows whose bucket slots fall in
  its group (a contiguous row range, precomputed in jnp from the
  monotone envelope of the slot sequence), lane-major (Mosaic demands
  128-aligned lane offsets/extents) in double-buffered chunks.
- Placement is a one-hot matmul on the MXU:
  ``region[G, F] = sum_c onehot_c[G, 256] @ chunk_c[F, 256].T``
  via ``dot_general`` contracting the row dim — no transposes needed.
  BITWISE exact: 0/1 weights are lossless in bf16 and the data operand
  splits into three exactly-bf16 8-bit significand slices.  The three
  split terms are STACKED into ONE matmul per orientation (N=48 row
  plane / M=32 transposed plane incl. the hit counter) — small-M/N
  matmuls pay the full MXU pipeline fill for a sliver of work, and the
  stack amortizes it (measured −2.9 ms/step at 1M, perf/mxfuse_ab.py);
  the per-GROUP folds keep the exact (hi + mid) + lo order.
- Row 15 of every real feature row is 1.0, so ``region[:, 15]`` counts
  hits; empty slots blend in the sentinel row algebraically:
  ``region += (1 - region[:, 15:16]) * sentinel_row``.
- Rows are assigned to groups by slot, so bucket-overflow (dropped) rows
  interleaved in the stream are simply never selected.

Row 13 of the feature rows must hold the row's bucket slot as f32
(exact below 2^24 — asserted by the caller).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .zanlungo_pallas import (
    NUM_CAND, NUM_F, ROW_ID, ROW_PX, ROW_PY, _POS_SENTINEL,
)

# Sentinel row as a host constant: .at[].set inside a kernel lowers to a
# scatter primitive, which Mosaic does not implement.
_SENT_NP = np.zeros((1, NUM_F), np.float32)
_SENT_NP[0, ROW_PX] = _POS_SENTINEL
_SENT_NP[0, ROW_PY] = _POS_SENTINEL
_SENT_NP[0, ROW_ID] = -1.0

ROW_BPOS = 13   # bucket slot of this row, as f32
ROW_ONE = 15    # constant 1.0 on real rows (hit counting)

# Geometry (perf/ab_pack.py at 1M).  The kernel's one-hot compare AND
# MXU work both scale with the rows STREAMED per group, so the chunk
# count is DYNAMIC per group (prefetched scalar): a group streams only
# ceil(span / CHUNK) chunks of its true row span (mean GROUP * fill +
# <=127 DMA alignment + any interleaved bucket-overflow rows — a
# hotspot tile's drops sit inside the span, so spans are NOT bounded
# by GROUP and the overflow audit must stay).  MAX_CHUNKS * CHUNK is
# the worst-case window, kept at the old production 1024 rows; beyond
# it rows surface as pack drops (loud, host raises).  Measured (static
# counts): 512/512/2 (1024 rows) = 12.2 ms, 512/256/2 (512 rows) =
# 7.8 but overflows scenes with group fill > ~75% (the gentle-1M
# scene), 512/128/3 = 7.2, overflows even at 55% fill.  Dynamic counts
# give the 7.8-class cost on the bench scene (mean span 342 -> 2
# chunks) with the full 1024-row worst-case coverage.
GROUP = 512         # slots per kernel program
CHUNK = 256         # rows per inner DMA/matmul
MAX_CHUNKS = 4      # worst-case rows streamed = CHUNK * MAX_CHUNKS


def _make_kernel(n_pad: int, slots: int, group: int = GROUP,
                 chunk_sz: int = CHUNK, max_chunks: int = MAX_CHUNKS):
    GROUP, CHUNK, MAX_CHUNKS = group, chunk_sz, max_chunks

    def kernel(r0_ref, nc_ref, feat_t_any, sent_ref, out_ref, out_t_ref,
               chunks, region, region_t, sem):
        # feat_t_any: TRANSPOSED features [NUM_F, n_pad] — Mosaic requires
        # DMA lane offsets/extents to be 128-aligned, so row chunks are
        # read lane-major at 128-aligned starts (r0 is align128'd).
        g = pl.program_id(0)
        r0 = r0_ref[g]
        nc = nc_ref[g]  # chunks this group actually spans (<= MAX_CHUNKS)

        def chunk_dma(c, slot):
            start = jnp.clip(r0 + c * CHUNK, 0, n_pad - CHUNK)
            start = pl.multiple_of(start, 128)
            return pltpu.make_async_copy(
                feat_t_any.at[:, pl.ds(start, CHUNK)],
                chunks.at[slot],
                sem.at[slot],
            )

        @pl.when(nc > 0)
        def _():
            chunk_dma(0, 0).start()

        region[...] = jnp.zeros((GROUP, 3 * NUM_F), jnp.float32)
        region_t[...] = jnp.zeros((2 * NUM_F, GROUP), jnp.float32)
        base = (g * GROUP).astype(jnp.float32)

        def body(c, _):
            two = jnp.asarray(2, c.dtype)
            slot = jax.lax.rem(c, two)
            nslot = jax.lax.rem(c + 1, two)

            @pl.when(c + 1 < nc)
            def _():
                chunk_dma(c + 1, nslot).start()

            chunk_dma(c, slot).wait()

            # A chunk whose unclipped start would overrun the array holds
            # only padding (n <= n_pad - CHUNK by construction) AND the
            # clipped DMA re-read REAL rows — accumulating it would
            # double-add them.  Skip it entirely.
            @pl.when(r0 + c * CHUNK <= n_pad - CHUNK)
            def _():
                rows_t = chunks[slot]  # [NUM_F, CHUNK]
                # Local slot within the group; rows not in this group
                # (other groups' rows, dropped rows with slot == slots,
                # padding) select nothing.
                local = rows_t[ROW_BPOS:ROW_BPOS + 1, :] - base  # [1, CHUNK]
                mine = (local >= 0.0) & (local < float(GROUP))
                local = jnp.where(mine, local, -1.0)
                # tpu.iota only supports integer types; the int->f32
                # convert is exact for these magnitudes.
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (GROUP, 1), 0
                ).astype(jnp.float32)
                onehot = (iota == local).astype(jnp.float32)  # [GROUP, CHUNK]
                # region += onehot @ rows_t.T, BITWISE exact in 3 DEFAULT
                # MXU passes: onehot is 0/1 (lossless bf16), and rows_t
                # splits into three exactly-bf16 terms (8-bit significand
                # slices of the 24-bit f32 significand); the one-hot
                # selects a single column per output so (hi + mid) + lo
                # reconstructs the f32 value exactly.  Replaces the
                # HIGHEST two-sided 6-pass decomposition at half the MXU
                # work — identical output (parity-tested vs XLA scatter).
                hi = rows_t.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = rows_t - hi
                mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
                lo = r1 - mid

                # ONE matmul per orientation instead of 3-4 small ones:
                # an M=8 (or N=16) matmul pays the full MXU pipeline fill
                # for a sliver of work, so the bf16-split terms are
                # STACKED — hi/mid/lo along N for the row-major plane
                # ([GROUP, 48], folded per GROUP below) and along M for
                # the transposed plane ([32, GROUP]: 3x8 candidate rows +
                # rows_t[8:16], whose last row is ROW_ONE == the hit
                # counter).  Each fold keeps the exact (hi + mid) + lo
                # order, and every output slot still sums one true value
                # plus exact zeros (slots are unique), so the result is
                # BITWISE identical to the separate passes (parity-tested
                # vs the XLA scatter).
                region[...] = region[...] + jax.lax.dot_general(
                    onehot, jnp.concatenate([hi, mid, lo], axis=0),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                region_t[...] = region_t[...] + jax.lax.dot_general(
                    jnp.concatenate(
                        [hi[:NUM_CAND], mid[:NUM_CAND], lo[:NUM_CAND],
                         rows_t[NUM_CAND:]], axis=0),
                    onehot,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )

            return 0

        # Dynamic trip count: groups stream only the chunks their row
        # span covers (most groups need ceil(GROUP*fill/CHUNK)).
        jax.lax.fori_loop(0, nc, body, 0)

        # Fold the stacked bf16-split terms once per GROUP (exact order).
        reg = (region[:, :NUM_F] + region[:, NUM_F:2 * NUM_F]) \
            + region[:, 2 * NUM_F:]                     # [GROUP, NUM_F]
        filled = reg[:, ROW_ONE:ROW_ONE + 1]  # 1.0 where a row landed
        out_ref[...] = reg + (1.0 - filled) * sent_ref[...]
        reg_t = (region_t[:NUM_CAND] + region_t[NUM_CAND:2 * NUM_CAND]) \
            + region_t[2 * NUM_CAND:3 * NUM_CAND]       # [NUM_CAND, GROUP]
        # Hit counter rode the transposed matmul as rows_t[8:16]'s last
        # row (ROW_ONE: 1.0 real rows x 0/1 one-hot — exact in one pass;
        # the other stacked query-side rows are discarded).
        filled_t = region_t[3 * NUM_CAND + (ROW_ONE - NUM_CAND):
                            3 * NUM_CAND + (ROW_ONE - NUM_CAND) + 1]
        # Sentinel as a sublane column (iota-built — slicing the
        # lane-major sent_ref row here would be a cross-axis relayout).
        ri = jax.lax.broadcasted_iota(jnp.int32, (NUM_CAND, 1), 0)
        sent_col = jnp.where(
            (ri == ROW_PX) | (ri == ROW_PY), _POS_SENTINEL,
            jnp.where(ri == ROW_ID, -1.0, 0.0),
        )
        out_t_ref[...] = reg_t + (1.0 - filled_t) * sent_col

    return kernel


def pack_rows_pallas(feat_t, bpos_sorted, slots: int,
                     interpret: bool = False, group: int = None,
                     chunk: int = None, max_chunks: int = None):
    """Pack sorted feature rows into the bucketed layout.

    feat_t: [NUM_F, N] f32 — TRANSPOSED feature rows (the kernel streams
    them lane-major; callers building features from [N] columns stack on
    axis 0 directly, so no [N, NUM_F] transpose ever materializes) with
    ROW_BPOS/ROW_ONE rows already set; bpos_sorted: [N] int32 (== slots
    for dropped/dead rows).  slots must be a multiple of GROUP.

    Returns (packed_t [slots, NUM_F], packed_T [NUM_CAND, slots] — the
    candidate plane in the force kernel's strip-DMA orientation, emitted
    by the same one-hot matmuls (an XLA transpose of the packed plane
    costs ~9 ms at 1M), overflow [] int32 — rows whose group row-window
    overflowed MAX_CHUNKS*CHUNK; nonzero means increase MAX_CHUNKS or
    bucket sizing is degenerate).
    """
    GROUP = group or globals()["GROUP"]
    CHUNK = chunk or globals()["CHUNK"]
    MAX_CHUNKS = max_chunks or globals()["MAX_CHUNKS"]
    assert feat_t.shape[0] == NUM_F
    n = feat_t.shape[1]
    assert slots < (1 << 24), "slot ids must be exact in f32"
    slots_pad = ((slots + GROUP - 1) // GROUP) * GROUP
    n_groups = slots_pad // GROUP

    # Monotone envelope of the slot sequence (dropped rows carry the
    # previous valid slot) -> first streamed row per group.
    mono = jax.lax.associative_scan(
        jnp.maximum, jnp.where(bpos_sorted < slots, bpos_sorted, -1)
    )
    row_lo = jnp.searchsorted(
        mono, jnp.arange(n_groups, dtype=jnp.int32) * GROUP, side="left"
    ).astype(jnp.int32)
    r0 = (row_lo // 128) * 128  # 128-aligned DMA starts (lane dim)

    # Rows belonging to group g live in [row_lo[g], row_lo[g+1])
    # INCLUDING interleaved non-packable rows (bucket-overflow drops
    # carry the previous valid slot in the monotone envelope; dead/
    # sentinel rows sort last and pad the FINAL group's span — a
    # mostly-dead capacity can feed ~45% dead rows), so spans are not
    # bounded by GROUP.  The kernel streams ceil(span/CHUNK) chunks
    # from r0, capped at MAX_CHUNKS.  The overflow audit counts only
    # IN-BUCKET rows beyond the streamed window — rows that actually
    # lost their slot (surface as pack drops; callers raise on
    # truncation).  Counting raw span overhang instead reported ~835k
    # phantom drops per 1M rebin from the dead tail (regression-tested
    # in test_pack_kernel_dead_tail_not_counted_as_overflow).
    row_hi = jnp.concatenate(
        [row_lo[1:], jnp.asarray([n], jnp.int32)]
    )
    span = row_hi - r0
    n_chunks = jnp.clip(
        (span + CHUNK - 1) // CHUNK, 0, MAX_CHUNKS
    ).astype(jnp.int32)
    inb = (bpos_sorted < slots).astype(jnp.int32)
    prefix = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(inb, dtype=jnp.int32)]
    )  # [n + 1]: in-bucket rows before index i
    win_end = jnp.minimum(r0 + MAX_CHUNKS * CHUNK, row_hi)
    overflow = jnp.sum(prefix[row_hi] - prefix[win_end]).astype(jnp.int32)

    # Pad rows to a DMA-safe length (padding rows select nothing: their
    # ROW_BPOS is `slots`, outside every group).
    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
    pad = n_pad - n
    pad_rows_t = jnp.zeros((NUM_F, pad), jnp.float32)
    pad_rows_t = pad_rows_t.at[ROW_BPOS, :].set(float(slots))
    feat_t_pad = jnp.concatenate([feat_t, pad_rows_t], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, NUM_F), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (GROUP, NUM_F), lambda g, *_: (g, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NUM_CAND, GROUP), lambda g, *_: (0, g),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NUM_F, CHUNK), jnp.float32),
            pltpu.VMEM((GROUP, 3 * NUM_F), jnp.float32),
            pltpu.VMEM((2 * NUM_F, GROUP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    packed, packed_T = pl.pallas_call(
        _make_kernel(n_pad, slots, GROUP, CHUNK, MAX_CHUNKS),
        out_shape=[
            jax.ShapeDtypeStruct((slots_pad, NUM_F), jnp.float32),
            jax.ShapeDtypeStruct((NUM_CAND, slots_pad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(r0, n_chunks, feat_t_pad, jnp.asarray(_SENT_NP))
    return packed[:slots], packed_T[:, :slots], overflow
