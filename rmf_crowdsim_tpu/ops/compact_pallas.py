"""Monotone unbucketize: slot-space rows back to agent order, MXU-style.

With ``config.presort`` the agent SoA is tile-sorted, so ``bucket_pos``
(agent -> packed slot) is MONOTONE: the slots of any 512-agent block
form one contiguous window of the packed array.  The XLA row gather
``out[bucket_pos]`` pays ~10 ns/row (~6-10 ms at 1M, perf/scan_ops.py);
this kernel replaces it with per-block windowed one-hot matmuls:

- program p owns agent rows [p*OUT_B, (p+1)*OUT_B) — a STATIC output
  block (no scatter, no read-modify-write);
- it DMAs the slot window [base_p, base_p + WIN) of the force output,
  fed as an 8-sublane padded TRANSPOSE ``out8 [8, slots]`` (manual
  Mosaic DMA slices need 8-aligned sublane and 128-aligned lane
  offsets/extents — a [slots, 2] view satisfies neither);
  base_p = 128-aligned bucket_pos[p*OUT_B], scalar-prefetched,
  double-buffered across the sequential grid;
- selection is ``p_t.T @ window``: p_t[j, i] = (bpos[i] == base_p + j),
  exact in THREE DEFAULT MXU passes via the hi/mid/lo bf16 significand
  split (see ops/pack_pallas.py) — bitwise-equal to the gather.

Agents without a slot (bucket overflow, dead: bucket_pos >= slots)
match no window lane and come back 0; callers blend rec_vel over them
exactly as they did for the gather (zanlungo_pallas.zanlungo_fused).

A block whose slot span exceeds WIN (locally sparse packing: long runs
of empty tiles between consecutive agents) cannot be covered; the
jnp-side span audit returns ``cover_ok`` so the caller falls back to
the XLA gather via lax.cond — exactness either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT_B = 512   # agent rows per program
WIN = 2048    # slot window per program (fill >= ~25% locally)


def _make_kernel(n_prog: int):
    def kernel(base_ref, out8_any, bpos_ref, vel_ref, win_vmem, sem):
        p = pl.program_id(0)

        def win_dma(q, slot):
            b = pl.multiple_of(base_ref[jnp.minimum(q, n_prog - 1)], 128)
            return pltpu.make_async_copy(
                out8_any.at[:, pl.ds(b, WIN)], win_vmem.at[slot],
                sem.at[slot],
            )

        @pl.when(p == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(p + 1 < n_prog)
        def _():
            win_dma(p + 1, jax.lax.rem(p + 1, jnp.int32(2))).start()

        win_dma(p, jax.lax.rem(p, jnp.int32(2))).wait()
        window = win_vmem[jax.lax.rem(p, jnp.int32(2))]  # [8, WIN]

        base = base_ref[p]
        local = bpos_ref[0, :] - base                  # [OUT_B] lanes
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0)
        p_t = jnp.where(
            local[None, :] == j_iota, 1.0, 0.0
        )                                              # [WIN, OUT_B] f32
        # (bucket_pos >= slots is remapped to slots + WIN by the caller —
        # provably outside every window, so no lane matches and the row
        # comes back 0.)

        hi = window.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = window - hi
        mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
        lo = r1 - mid

        def sel(w):
            # [WIN, OUT_B] x [8, WIN] -> [OUT_B, 8], contracting WIN.
            return jax.lax.dot_general(
                p_t, w, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        res = (sel(hi) + sel(mid)) + sel(lo)           # [OUT_B, 8]
        vel_ref[...] = res[:, 0:2]

    return kernel


def unbucketize_compact(out, bucket_pos, n: int, interpret: bool = False):
    """``(out [slots, 2] f32, bucket_pos [N] int32, n) -> (vel [N, 2],
    cover_ok [] bool)`` — vel[i] bitwise-equals out[bucket_pos[i]] for
    packed agents (0 otherwise) when ``cover_ok``; callers must fall
    back to the gather when not (lax.cond keeps one compiled shape)."""
    slots = out.shape[0]
    assert slots % 128 == 0
    n_pad = ((n + OUT_B - 1) // OUT_B) * OUT_B
    n_prog = n_pad // OUT_B
    bpos_pad = jnp.full((n_pad,), slots, jnp.int32).at[:n].set(
        bucket_pos.astype(jnp.int32)
    )

    # 8-sublane padded transpose (see module docstring).
    out8 = jnp.zeros((8, slots), jnp.float32).at[0:2, :].set(out.T)

    # Per-program window base: first agent's slot, 128-aligned, clamped
    # so the window stays in-array.
    first = jnp.clip(bpos_pad[::OUT_B], 0, slots - 1)
    base = jnp.clip((first // 128) * 128, 0, max(slots - WIN, 0))

    # Span audit: the largest PACKED slot in each block must sit inside
    # its window; sentinel rows (>= slots) are exempt.
    packed_max = jnp.max(
        jnp.where(bpos_pad < slots, bpos_pad, -1).reshape(n_prog, OUT_B),
        axis=1,
    )
    cover_ok = jnp.all(
        (packed_max < 0) | (packed_max - base < WIN)
    )
    # Sentinels must miss every window even when base is clamped near
    # the array end: remap them past slots + WIN.
    bpos_safe = jnp.where(bpos_pad < slots, bpos_pad, slots + WIN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, OUT_B), lambda p, *_: (0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_B, 2), lambda p, *_: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vel = pl.pallas_call(
        _make_kernel(n_prog),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base.astype(jnp.int32), out8, bpos_safe.reshape(1, n_pad))
    return vel[:n], cover_ok
