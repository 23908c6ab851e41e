"""A/B kernel strip geometry: programs x per-program DMA count.

The ledger's "program/DMA floor ~7.5 ms" rides grid=(tx, ty/strip)
programs each issuing 3 whole-strip DMAs.  Larger strips divide the
program count (and with strip == ty, each program's 3 column DMAs cover
the whole column).  Usage: python perf/strip_ab.py [strip ...]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup  # noqa: E402
import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import bucketize, tile_key  # noqa: E402


def measure(tag, packed_t, bcfg, zp4):
    def body(cr, _):
        p = cr["p"] * 1.0000001
        o = zpal.zanlungo_forces_bucketed(bcfg, zp4, p)
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
    print(f"{tag:16s}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
          f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    print(f"base: tx={bcfg.tx} ty={bcfg.ty} strip={bcfg.strip_tiles} "
          f"programs={bcfg.tx * (bcfg.ty // bcfg.strip_tiles)}", flush=True)
    key = tile_key(bcfg, carry["pos"], carry["alive"])
    order = jnp.argsort(key, stable=True)
    packed_t, _pT, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, carry["prio"][order], carry["eye"][order],
            v, carry["alive"][order], use_pack_kernel=True, presorted=True)
    )(carry["pos"][order], carry["vel"][order])
    print(f"occ={int(occ)} dropped={int(dropped)}", flush=True)

    strips = [int(s) for s in sys.argv[1:]] or [bcfg.strip_tiles, bcfg.ty]
    for s in strips:
        assert bcfg.ty % s == 0 and s % bcfg.sub_tiles == 0, s
        bc = dataclasses.replace(bcfg, strip_tiles=s)
        measure(f"strip={s}", packed_t, bc, zp4)


if __name__ == "__main__":
    main()
