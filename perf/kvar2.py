"""Fresh kernel ablation (round 4) — stage costs of the CURRENT kernel
(pre-rolled strip copies, NUM_CAND strips, DEFAULT+bf16-split compaction,
int_prio), scan-amortized so no dispatch RTT pollutes the numbers.

Stages (cumulative; consecutive deltas isolate each piece):
  0  loop + per-sub-block output writes (rec passthrough)
  1  + pre-roll copies at program start
  2  + window reads (3x [NUM_CAND, 128] slices per sub-block)
  3  + query-feature reads (the 11 [sub_q, 1] column slices)
  4  + full-width mask pass
  5  + union + tri rank matmul + count
  6  + one-hot p_t + 3-term bf16 compaction matmuls + sentinel blend
  7  + compacted TTC + t_i reduce
  8  + compacted force + sums (= kernel minus the overflow fallback)
  9  the production kernel (with fallback branch)
Micro: 100 = no fori_loop at all (one whole-strip write; program+DMA
floor), 101 = stage 0 minus strip DMAs.
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
    NUM_CAND, NUM_F, ROW_EYE, ROW_FX, ROW_FY, ROW_ID, ROW_PRIO, ROW_PX,
    ROW_PY, ROW_RX, ROW_RY, ROW_SPX, ROW_SPY, ROW_VX, ROW_VY,
    _POS_SENTINEL, BucketConfig, _pair_force, _pair_ttc, _strip_shifts,
    bucketize, tile_key, zanlungo_forces_bucketed,
)
from perf.step_parts import setup  # noqa: E402

INT_PRIO = True


def make_stage_kernel(cfg: BucketConfig, stage: int):
    strip, qb, B = cfg.strip_tiles, cfg.sub_tiles, cfg.bucket
    q_len = strip * B
    sub_q = qb * B
    nsub = strip // qb
    ty, tx = cfg.ty, cfg.tx
    C = 128
    col_slots_s = ty * B
    W_EXT = min((((strip + 2) * B + 127) // 128) * 128 + 128, col_slots_s)
    PHASES = _strip_shifts(cfg)
    if 0 in PHASES:
        N_COPIES, LAND = len(PHASES), PHASES.index(0)
    else:
        N_COPIES, LAND = len(PHASES) + 1, len(PHASES)

    def kernel(zp_ref, packed_any, qt_ref, out_ref, strips_r, sem):
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
                strips_r.at[k, LAND], sem.at[k])

        if stage != 101:
            for k in range(3):
                strip_dma(k).start()
            for k in range(3):
                strip_dma(k).wait()

        if stage == 100 or stage == 101:
            out_ref[...] = qt_ref[:, 0:2]
            return
        if stage == 102 or stage == 105:
            # qt stream replaced by a tiny dummy block: isolates the
            # [q_len, 16] query-block pipeline cost.  105: caller feeds
            # a pre-transposed packed plane (no per-iteration .T).
            out_ref[...] = jnp.zeros((q_len, 2), jnp.float32)
            return
        if stage == 106:
            # transposed output layout [2, q_len] (128-minor, unpadded).
            out_ref[...] = jnp.zeros((2, q_len), jnp.float32)
            return
        if stage == 103:
            # 102 + per-sub-block output writes (the loop, no reads).
            def wr(s, _):
                q0 = s * sub_q
                out_ref[pl.ds(q0, sub_q), 0:2] = jnp.zeros(
                    (sub_q, 2), jnp.float32)
                return 0
            jax.lax.fori_loop(0, nsub, wr, 0)
            return

        if stage >= 1:
            for k in range(3):
                for p, v in enumerate(PHASES):
                    if p == LAND or v == 0:
                        continue
                    strips_r[k, p] = pltpu.roll(
                        strips_r[k, LAND], W_EXT - v, axis=1)

        def win_true_start_l(s):
            return jnp.clip((py0 + s * qb - 1) * B, 0, col_slots - C)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (3 * C, 3 * C), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (3 * C, 3 * C), 1)
        tri = (ci < rj).astype(jnp.float32)

        def sub_block(s, _):
            g_l = win_true_start_l(s)
            off = g_l - base_l
            off_al = pl.multiple_of((off // 128) * 128, 128)
            shift = off - off_al
            pidx = jnp.int32(0)
            for p, v in enumerate(PHASES[1:]):
                pidx = pidx + (shift >= jnp.int32(v)).astype(jnp.int32)
            q0 = s * sub_q

            def qrow(r):
                return qt_ref[pl.ds(q0, sub_q), r:r + 1]

            crumb = jnp.zeros((sub_q, 1), jnp.float32)

            rolled, g_cls = [], []
            if stage >= 2:
                for k in range(3):
                    w = strips_r[k, pidx, :, pl.ds(off_al, C)]
                    g_cls.append(
                        jnp.clip(px + (k - 1), 0, tx - 1) * col_slots + g_l)
                    rolled.append(w)
                t = sum(w[0:1, :C] for w in rolled)
                crumb = crumb + jnp.sum(t) * 1e-30

            if stage >= 3:
                qs = [qrow(r) for r in
                      (ROW_PX, ROW_PY, ROW_VX, ROW_VY, ROW_PRIO, ROW_EYE,
                       ROW_ID, ROW_SPX, ROW_SPY)]
                (qpx_, qpy_, qvx_, qvy_, qprio_, qeye_, qid_, qspx_,
                 qspy_) = qs
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
                    precision=jax.lax.Precision.DEFAULT)
                count = jnp.sum(u)
                crumb = crumb + (count + rank[0, 0]) * 1e-30

            comp = None
            if stage >= 6:
                r_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (C, 1), 0).astype(jnp.float32)
                p_t = jnp.where((rank == r_iota) & (u > 0), 1.0, 0.0)
                w_all = jnp.concatenate(
                    [rolled[k][:, :C] for k in range(3)], axis=1)

                def split3(wv):
                    hi = wv.astype(jnp.bfloat16).astype(jnp.float32)
                    r1 = wv - hi
                    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
                    return hi, mid, r1 - mid

                def dot_d(a, b):
                    return jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)

                w_hi, w_mid, w_lo = split3(w_all)
                comp = (dot_d(w_hi, p_t) + dot_d(w_mid, p_t)) \
                    + dot_d(w_lo, p_t)
                ri = jax.lax.broadcasted_iota(jnp.int32, (NUM_CAND, 1), 0)
                sent = jnp.where(
                    (ri == ROW_PX) | (ri == ROW_PY), _POS_SENTINEL,
                    jnp.where(ri == ROW_ID, -1.0, 0.0))
                unfilled = jnp.where(
                    lane_iota < count.astype(jnp.int32), 0.0, 1.0)
                comp = comp + unfilled * sent
                crumb = crumb + jnp.sum(comp[0:1, :]) * 1e-30

            t_i = mask2 = None
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

            if stage >= 8:
                def ccrow(r):
                    return comp[r:r + 1, :]
                pfx, pfy = _pair_force(
                    zp, t_i, qpx_, qpy_, qvx_, qvy_, qspx_, qspy_, qprio_,
                    ccrow(ROW_PX), ccrow(ROW_PY), ccrow(ROW_VX),
                    ccrow(ROW_VY), ccrow(ROW_FX), ccrow(ROW_FY),
                    ccrow(ROW_PRIO), mask2, int_prio=INT_PRIO)
                fx = jnp.sum(pfx, axis=1, keepdims=True)
                fy = jnp.sum(pfy, axis=1, keepdims=True)
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

    return kernel, q_len, W_EXT, N_COPIES


def run_stage(cfg: BucketConfig, zp4, packed_t, stage: int):
    if stage == 104:
        # Harness floor: no pallas call at all.
        return packed_t[:, 0:2] * 1.0000001
    if stage == 9:
        return zanlungo_forces_bucketed(cfg, zp4, packed_t,
                                        int_prio=INT_PRIO)
    kernel, q_len, w_ext, n_copies = make_stage_kernel(cfg, stage)
    n_strips = cfg.ty // cfg.strip_tiles
    if stage in (102, 103, 105, 106):
        qt_spec = pl.BlockSpec((8, NUM_F), lambda i, j, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        qt_spec = pl.BlockSpec((q_len, NUM_F),
                               lambda i, j, *_: (i * n_strips + j, 0),
                               memory_space=pltpu.VMEM)
    if stage == 106:
        out_spec = pl.BlockSpec(
            (2, q_len), lambda i, j, *_: (0, i * n_strips + j),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, cfg.slots), jnp.float32)
    else:
        out_spec = pl.BlockSpec(
            (q_len, 2), lambda i, j, *_: (i * n_strips + j, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((cfg.slots, 2), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cfg.tx, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            qt_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((3, n_copies, NUM_CAND, w_ext), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    if stage == 105:
        assert packed_t.shape[0] == NUM_CAND  # pre-transposed plane
        packed_T, packed_full = packed_t, packed_t.T
        # packed_full only feeds the dummy qt block; shape [slots, 16]
        # not needed — reuse an 8-row dummy.
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid_spec=grid_spec,
        )(zp4.astype(jnp.float32), packed_T,
          jnp.zeros((8, NUM_F), jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
    )(zp4.astype(jnp.float32), packed_t[:, :NUM_CAND].T, packed_t)


def measure(cfg, zp4, packed_t, stage):
    def body(cr, _):
        p = cr["p"] * 1.0000001
        o = run_stage(cfg, zp4, p, stage)
        return {"p": p + o[0, 0] * 1e-30}, None

    def timed(k):
        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        t0 = time.time()
        out = f({"p": packed_t})
        _ = float(out["p"][0, 0])
        comp = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f({"p": packed_t})
            _ = float(out["p"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best, comp

    t1, c1 = timed(1)
    t21, c21 = timed(21)
    return (t21 - t1) / 20.0, c1, c21


def main():
    strip_req = None
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("strip="):
            strip_req = int(a.split("=")[1])
        else:
            argv.append(a)
    sys.argv = [sys.argv[0]] + argv

    _cfg, bcfg, carry, zp, zp4 = setup()
    if strip_req is not None:
        import dataclasses as _dc
        bcfg = BucketConfig.create(
            _cfg.grid.width, _cfg.grid.height, _cfg.grid.offset,
            _cfg.max_eyesight, bucket=_cfg.bucket_capacity,
            strip_tiles=strip_req, sub_tiles=_cfg.sub_tiles,
            tile_size=_cfg.bucket_tile_size or None,
        )
        print(f"strip override: strip={bcfg.strip_tiles} ty={bcfg.ty}",
              flush=True)
    key = tile_key(bcfg, carry["pos"], carry["alive"])
    order = jnp.argsort(key, stable=True)
    packed_t, _pT, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, carry["prio"][order], carry["eye"][order],
            v, carry["alive"][order], use_pack_kernel=True, presorted=True)
    )(carry["pos"][order], carry["vel"][order])
    print(f"occ={int(occ)} dropped={int(dropped)} "
          f"phases={_strip_shifts(bcfg)}", flush=True)

    stages = [int(a) for a in sys.argv[1:]] or [100, 0, 1, 2, 3, 4, 5, 6,
                                                7, 8, 9]
    prev = None
    packed_T = jnp.asarray(packed_t[:, :NUM_CAND].T)
    for stage in stages:
        per, c1, c21 = measure(
            bcfg, zp4, packed_T if stage == 105 else packed_t, stage)
        delta = "" if prev is None else f"  (+{(per - prev) * 1e3:.2f})"
        print(f"stage {stage:3d}: {per * 1e3:7.3f} ms{delta}  "
              f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)
        prev = per


if __name__ == "__main__":
    main()
