"""Scan-amortized A/B battery: pack-kernel geometry, compaction kernel
vs XLA gather, and the force kernel alone (variance gauge).

Usage: python perf/ab_pack.py [which ...]
  which: pack512x256 pack512x512 pack1024x512 gather compact kernel
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup, N  # noqa: E402
from rmf_crowdsim_tpu.ops.pack_pallas import ROW_BPOS, pack_rows_pallas  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    NUM_F, bucketize, tile_key, zanlungo_forces_bucketed,
)


def timed(body, init, k):
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
    t0 = time.time()
    out = f(init)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.ravel(leaf)[0])
    comp = time.time() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(init)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.ravel(leaf)[0])
        best = min(best, time.perf_counter() - t0)
    return best, comp


def run(name, body, init):
    t1, c1 = timed(body, init, 1)
    t21, c21 = timed(body, init, 21)
    per = (t21 - t1) / 20.0
    print(f"{name:14s}: {per * 1e3:7.3f} ms/op  [K=1 {t1 * 1e3:6.1f}, "
          f"K=21 {t21 * 1e3:7.1f}, compiles {c1:.0f}/{c21:.0f}s]",
          flush=True)


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    # Presort once on the host side.
    key = tile_key(bcfg, carry["pos"], carry["alive"])
    order = jnp.argsort(key, stable=True)
    pos = carry["pos"][order]
    vel = carry["vel"][order]
    prio, eye, alive = (carry["prio"][order], carry["eye"][order],
                        carry["alive"][order])

    packed_t, _pT, bpos, occ, dropped = jax.jit(
        lambda p: bucketize(bcfg, p, vel, vel, vel, prio, eye, vel, alive,
                            use_pack_kernel=True, presorted=True)
    )(pos)
    print(f"slots={bcfg.slots} occ={int(occ)} dropped={int(dropped)}",
          flush=True)

    # Sorted feature rows for the pack A/B (ROW_BPOS prefilled).
    f32 = jnp.float32
    feat = jnp.zeros((N, NUM_F), f32)
    feat = feat.at[:, 0].set(pos[:, 0]).at[:, 1].set(pos[:, 1])
    feat = feat.at[:, ROW_BPOS].set(bpos.astype(f32))
    feat = feat.at[:, 15].set(1.0)

    which = sys.argv[1:] or ["pack512x256", "pack512x512", "pack1024x512",
                             "gather", "kernel"]

    # Sentinel row for the scatter/gather pack alternatives.
    from rmf_crowdsim_tpu.ops.zanlungo_pallas import sentinel_rows
    sent1 = sentinel_rows(1)

    geos = {"pack512x256": (512, 256, 4), "pack512x512": (512, 512, 2),
            "pack1024x512": (1024, 512, 3),
            # 512 streamed rows per 512-slot group: ~282 mean + <=127
            # alignment + 6 sigma tail still fits; halves the one-hot
            # compare AND MXU work of 512/512/2.
            "pack512x256x2": (512, 256, 2),
            "pack512x128x3": (512, 128, 3),
            "pack256x128x3": (256, 128, 3),
            "pack384x256x2": (384, 256, 2)}
    for name in which:
        if name in geos:
            g, c, m = geos[name]

            def body(cr, _, _g=g, _c=c, _m=m):
                ft = cr["feat"] * 1.0000001
                pk, over = pack_rows_pallas(ft, bpos, bcfg.slots,
                                            group=_g, chunk=_c,
                                            max_chunks=_m)
                return {"feat": ft + pk[0, 0] * 1e-30}, None

            run(name, body, {"feat": feat})
        elif name == "gather":
            def body(cr, _):
                o = cr["o"] * 1.0000001
                v = o[jnp.clip(bpos, 0, bcfg.slots - 1)]
                return {"o": o + v[0, 0] * 1e-30}, None

            run(name, body, {"o": jnp.ones((bcfg.slots, 2), f32)})
        elif name == "xlascatter":
            # Round-2 pack baseline re-measured scan-amortized: plain XLA
            # row scatter of the (presorted -> MONOTONE bpos) feature rows
            # into a sentinel-prefilled plane.  The pack kernel was built
            # against the ISOLATED 28.6-137 ms scatter numbers; real
            # scan-amortized scatters are ~6 ms at 1M (DESIGN_NOTES).
            def body(cr, _):
                ft = cr["feat"] * 1.0000001
                pk = jnp.broadcast_to(sent1, (bcfg.slots, NUM_F))
                pk = pk.at[bpos].set(ft, mode="drop")
                return {"feat": ft + pk[0, 0] * 1e-30}, None

            run(name, body, {"feat": feat})
        elif name == "ssgather":
            # Gather formulation of the pack: slot s's row is
            # tile_start[s // bucket] + (s % bucket), valid while rank <
            # occupancy — searchsorted over the sorted tile keys + one
            # MONOTONE row gather of [slots, NUM_F] (monotone gathers are
            # ~2x cheaper than random, DESIGN_NOTES).
            key_s = tile_key(bcfg, pos, alive)
            b = bcfg.bucket

            def body(cr, _):
                ft = cr["feat"] * 1.0000001
                tstart = jnp.searchsorted(
                    key_s, jnp.arange(bcfg.n_tiles + 1, dtype=key_s.dtype)
                ).astype(jnp.int32)
                s = jnp.arange(bcfg.slots, dtype=jnp.int32)
                t = s // b
                r = s % b
                row = tstart[t] + r
                valid = row < tstart[t + 1]
                rowc = jnp.clip(row, 0, N - 1)
                pk = jnp.where(valid[:, None], ft[rowc], sent1)
                return {"feat": ft + pk[0, 0] * 1e-30}, None

            run(name, body, {"feat": feat})
        elif name == "kernel":
            def body(cr, _):
                p = cr["p"] * 1.0000001
                o = zanlungo_forces_bucketed(bcfg, zp4, p)
                return {"p": p + o[0, 0] * 1e-30}, None

            run(name, body, {"p": packed_t})


if __name__ == "__main__":
    main()
