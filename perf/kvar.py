"""Kernel ablation battery — stage-by-stage cost of the v5 sub-block.

Builds kernels that run only the first K stages of the v5 sub-block
skeleton (ops/zanlungo_pallas._make_kernel) so consecutive stage deltas
isolate each piece's cost.  Every stage feeds a crumb of its data into
the output write so nothing is dead-code-eliminated.

Stages:
  0 loop+write      fori_loop over sub-blocks, write rec rows only
  1 +windows        3x strip slices [NUM_F, R] (no roll)
  2 +roll           the dynamic pltpu.roll per window
  3 +qrows          the 12 [sub_q, 1] query-feature reads
  4 +masks          the full-width candidate mask pass
  5 +union+rank     union reduce + tri matmul + count
  6 +compact        the one-hot compaction matmul + sentinel blend
  7 +ttc            compacted TTC + t_i reduce
  8 +force          compacted force + sums  (== v5 minus the overflow
                    fallback branch)
  9 v5              the real kernel (with fallback), for reference
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    NUM_F, ROW_EYE, ROW_FX, ROW_FY, ROW_ID, ROW_PRIO, ROW_PX, ROW_PY,
    ROW_RX, ROW_RY, ROW_SPX, ROW_SPY, ROW_VX, ROW_VY, _POS_SENTINEL,
    BucketConfig, _pair_force, _pair_ttc, bucketize,
)


def make_stage_kernel(cfg: BucketConfig, stage: int):
    strip, qb, B = cfg.strip_tiles, cfg.sub_tiles, cfg.bucket
    q_len = strip * B
    sub_q = qb * B
    nsub = strip // qb
    ty, tx = cfg.ty, cfg.tx
    C = 128
    col_slots_s = ty * B
    W_EXT = min((((strip + 2) * B + 127) // 128) * 128 + 128, col_slots_s)
    R = min(2 * C, W_EXT)

    def kernel(zp_ref, packed_any, qt_ref, out_ref, strip_vmem, sem):
        px = pl.program_id(0)
        ps = pl.program_id(1)
        py0 = ps * strip
        zp = (zp_ref[0], zp_ref[1], zp_ref[2], zp_ref[3], zp_ref[4])
        radius = zp_ref[3]
        col_slots = ty * B

        base_l = jnp.clip(((py0 * B - B) // 128) * 128, 0,
                          col_slots - W_EXT)
        base_l = pl.multiple_of(base_l, 128)

        def strip_dma(k):
            c = jnp.clip(px + (k - 1), 0, tx - 1)
            abs_base = pl.multiple_of(c * col_slots + base_l, 128)
            return pltpu.make_async_copy(
                packed_any.at[:, pl.ds(abs_base, W_EXT)],
                strip_vmem.at[k], sem.at[k])

        if stage != 104:
            for k in range(3):
                strip_dma(k).start()
            for k in range(3):
                strip_dma(k).wait()

        def win_true_start_l(s):
            return jnp.clip((py0 + s * qb - 1) * B, 0, col_slots - C)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (3 * C, 3 * C), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (3 * C, 3 * C), 1)
        tri = (ci < rj).astype(jnp.float32)

        # Micro-variants bisecting stage 0:
        #  100: q0 static 0 (isolate dynamic sublane slicing)
        #  101: loop with integer carry only, one whole-strip write
        #  102: no loop at all, whole-strip write (program+DMA floor)
        #  103: stage 0 with ONE [sub_q, 2] write instead of two [sub_q, 1]
        if stage == 102:
            out_ref[...] = jnp.zeros((q_len, 2), jnp.float32)
            return
        if stage == 104:
            # no strip DMA at all: pipeline floor (qt in + out out only)
            out_ref[...] = qt_ref[:, 0:2]
            return
        if stage == 101:
            out_ref[...] = jnp.zeros((q_len, 2), jnp.float32)
            jax.lax.fori_loop(0, nsub, lambda s, c: c + s, 0)
            return

        def sub_block(s, _):
            g_l = win_true_start_l(s)
            off = g_l - base_l
            off_al = pl.multiple_of(
                jnp.clip((off // 128) * 128, 0, W_EXT - R), 128)
            shift = off - off_al
            q0 = 0 if stage == 100 else s * sub_q

            def qrow(r):
                return qt_ref[pl.ds(q0, sub_q), r:r + 1]

            if stage in (100, 103):
                rx = qrow(ROW_RX)
                ry = qrow(ROW_RY)
                out_ref[pl.ds(q0, sub_q), 0:2] = jnp.concatenate(
                    [rx, ry], axis=1)
                return 0

            crumb = jnp.zeros((sub_q, 1), jnp.float32)

            rolled, g_cls = [], []
            if stage >= 1:
                for k in range(3):
                    w = strip_vmem[k, :, pl.ds(off_al, R)]
                    if stage >= 2 and R > C:
                        w = pltpu.roll(
                            w,
                            jax.lax.rem(
                                jnp.int32(R) - shift.astype(jnp.int32),
                                jnp.int32(R)),
                            axis=1)
                    g_cls.append(
                        jnp.clip(px + (k - 1), 0, tx - 1) * col_slots + g_l)
                    rolled.append(w)
                # touch the windows so loads survive
                t = sum(w[0:1, :C] for w in rolled)  # [1, C]
                crumb = crumb + jnp.sum(t) * 1e-30

            if stage >= 3:
                qs = [qrow(r) for r in
                      (ROW_PX, ROW_PY, ROW_VX, ROW_VY, ROW_PRIO, ROW_EYE,
                       ROW_ID, ROW_SPX, ROW_SPY, ROW_RX, ROW_RY)]
                (qpx_, qpy_, qvx_, qvy_, qprio_, qeye_, qid_, qspx_,
                 qspy_, rx_, ry_) = qs
                crumb = crumb + sum(qs) * 1e-30

            def crow(k, r):
                return rolled[k][r:r + 1, :C]

            inf = jnp.float32(jnp.inf)
            masks = None
            if stage >= 4:
                masks = []
                for k in range(3):
                    cpx_, cpy_ = crow(k, ROW_PX), crow(k, ROW_PY)
                    cid_ = crow(k, ROW_ID)
                    cand_slot = g_cls[k] + lane_iota
                    lo = (px + (k - 1)) * col_slots
                    col_ok = (cand_slot >= lo) & (cand_slot < lo + col_slots)
                    dx = cpx_ - qpx_
                    dy = cpy_ - qpy_
                    dist2 = dx * dx + dy * dy
                    masks.append(
                        (dist2 < qeye_ * qeye_) & (cid_ != qid_)
                        & (cid_ >= 0) & col_ok)
                crumb = crumb + jnp.sum(
                    masks[0].astype(jnp.float32), axis=1, keepdims=True
                ) * 1e-30

            if stage >= 5:
                u = jnp.concatenate(
                    [jnp.any(m, axis=0, keepdims=True) for m in masks],
                    axis=1).astype(jnp.float32)
                rank = jax.lax.dot_general(
                    u, tri, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                count = jnp.sum(u)
                crumb = crumb + (count + rank[0, 0]) * 1e-30

            comp = None
            if stage >= 6:
                r_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (C, 1), 0).astype(jnp.float32)
                p_t = jnp.where((rank == r_iota) & (u > 0), 1.0, 0.0)
                w_all = jnp.concatenate(
                    [rolled[k][:, :C] for k in range(3)], axis=1)
                comp = jax.lax.dot_general(
                    w_all, p_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                ri = jax.lax.broadcasted_iota(jnp.int32, (NUM_F, 1), 0)
                sent = jnp.where(
                    (ri == ROW_PX) | (ri == ROW_PY), _POS_SENTINEL,
                    jnp.where(ri == ROW_ID, -1.0, 0.0))
                filled = comp[15:16, :]
                comp = comp + (1.0 - filled) * sent
                crumb = crumb + jnp.sum(comp[0:1, :]) * 1e-30

            t_i = None
            mask2 = None
            if stage >= 7:
                def ccrow(r):
                    return comp[r:r + 1, :]
                cpx_, cpy_ = ccrow(ROW_PX), ccrow(ROW_PY)
                cvx_, cvy_ = ccrow(ROW_VX), ccrow(ROW_VY)
                cid_ = ccrow(ROW_ID)
                d2 = (cpx_ - qpx_) ** 2 + (cpy_ - qpy_) ** 2
                mask2 = (d2 < qeye_ * qeye_) & (cid_ != qid_) & (cid_ >= 0)
                ttc, _ = _pair_ttc(qvx_, qvy_, qpx_, qpy_,
                                   cvx_, cvy_, cpx_, cpy_, radius)
                ttc = jnp.where(mask2, ttc, inf)
                t_i = jnp.min(ttc, axis=1, keepdims=True)
                crumb = crumb + jnp.where(
                    jnp.isfinite(t_i), t_i, 0.0) * 1e-30

            fx = fy = None
            if stage >= 8:
                def ccrow(r):
                    return comp[r:r + 1, :]
                pfx, pfy = _pair_force(
                    zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_, qprio_,
                    ccrow(ROW_PX), ccrow(ROW_PY), ccrow(ROW_VX),
                    ccrow(ROW_VY), ccrow(ROW_FX), ccrow(ROW_FY),
                    ccrow(ROW_PRIO), mask2)
                fx = jnp.sum(pfx, axis=1, keepdims=True)
                fy = jnp.sum(pfy, axis=1, keepdims=True)

            if stage >= 8:
                has = jnp.isfinite(t_i)
                inv_mass = 1.0 / zp[2]
                out_x = qrow(ROW_RX) + jnp.where(has, fx * inv_mass, 0.0)
                out_y = qrow(ROW_RY) + jnp.where(has, fy * inv_mass, 0.0)
                out_ref[pl.ds(q0, sub_q), 0:1] = out_x + crumb
                out_ref[pl.ds(q0, sub_q), 1:2] = out_y
            else:
                out_ref[pl.ds(q0, sub_q), 0:1] = qrow(ROW_RX) + crumb
                out_ref[pl.ds(q0, sub_q), 1:2] = qrow(ROW_RY)
            return 0

        jax.lax.fori_loop(0, nsub, sub_block, 0)

    return kernel, q_len, W_EXT


def run_stage(cfg: BucketConfig, zp4, packed_t, stage: int):
    kernel, q_len, w_ext = make_stage_kernel(cfg, stage)
    n_strips = cfg.ty // cfg.strip_tiles
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cfg.tx, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((q_len, NUM_F), lambda i, j, *_: (i * n_strips + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q_len, 2), lambda i, j, *_: (i * n_strips + j, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, NUM_F, w_ext), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cfg.slots, 2), jnp.float32),
        grid_spec=grid_spec,
    )(zp4.astype(jnp.float32), packed_t.T, packed_t)


def main():
    n = 1_000_000
    area_per_agent = 1.6
    side = float(np.ceil(np.sqrt(n * area_per_agent)))
    side = float(np.ceil(side / 2.0) * 2.0)
    cfg = BucketConfig.create(side, side, (-side / 2, -side / 2), 2.0,
                              bucket=32, strip_tiles=96, sub_tiles=2,
                              tile_size=5.3)
    print(f"cfg: tx={cfg.tx} ty={cfg.ty} slots={cfg.slots} "
          f"strip={cfg.strip_tiles}", flush=True)
    rng = np.random.default_rng(0)
    lim = side / 2 - 1.0
    pos = jnp.asarray(rng.uniform(-lim, lim, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.standard_normal((n, 2)) * 0.3, jnp.float32)
    pref = vel
    prio = jnp.arange(n, dtype=jnp.float32)
    eye = jnp.full((n,), 2.0, jnp.float32)
    alive = jnp.ones((n,), bool)
    zp4 = jnp.asarray([1.0, 1.0, 2.0, 0.25, 20.0], jnp.float32)

    packed_t, bucket_pos, max_occ, dropped = jax.jit(
        functools.partial(bucketize, cfg, use_pack_kernel=True)
    )(pos, vel, pref, pref, prio, eye, vel, alive)
    packed_t = jax.device_put(packed_t)
    print(f"bucketized: max_occ={int(max_occ)} dropped={int(dropped)}",
          flush=True)

    stages = [int(a) for a in sys.argv[1:]] or list(range(9))
    prev = None
    for stage in stages:
        f = jax.jit(lambda p, _s=stage: run_stage(cfg, zp4, p, _s))
        t0 = time.time()
        out = f(packed_t)
        _ = float(out[0, 0])
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(packed_t)
            _ = float(out[0, 0])
            best = min(best, time.perf_counter() - t0)
        delta = "" if prev is None else f"  (+{(best - prev) * 1e3:.1f})"
        print(f"stage {stage}: {best * 1e3:.2f} ms{delta}  "
              f"[compile {compile_s:.0f}s]", flush=True)
        prev = best


if __name__ == "__main__":
    main()
