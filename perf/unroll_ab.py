"""A/B the 2x sub-block unroll: two independent sub-block dependency
chains per fori iteration let Mosaic overlap one block's MXU compaction
matmuls with the other's VPU pair math — IF register pressure and
icache permit (the round-2 full 48x unroll lost to icache: 81.0 vs
73.6 ms).  Standalone kernel at the 1M bench scene, production config
(dual_row + int_prio, presorted pack)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    bucketize, tile_key, zanlungo_forces_bucketed, zparams5,
)


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    alive = carry["alive"]
    key = tile_key(bcfg, carry["pos"], alive)
    order = jnp.argsort(key, stable=False)
    pos = carry["pos"][order]
    vel = carry["vel"][order]
    prio = carry["prio"][order]
    eye = carry["eye"][order]
    al = alive[order]
    packed_t, packed_T, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, prio, eye, v, al,
            use_pack_kernel=True, presorted=True)
    )(pos, vel)
    print(f"device: {jax.devices()[0]}  occ={int(occ)} "
          f"dropped={int(dropped)}", flush=True)
    zp5 = zparams5(zp)

    for unroll in (1, 2):
        def body(c, _):
            p = c["p"] * 1.0000001
            pT = c["pT"] * 1.0000001
            o = zanlungo_forces_bucketed(
                bcfg, zp5, p, int_prio=True, packed_T=pT, dual_row=True,
                unroll=unroll,
            )
            return {"p": p + o[0, 0] * 1e-30, "pT": pT}, None

        def timed(k):
            f = jax.jit(
                lambda c: jax.lax.scan(body, c, None, length=k)[0])
            t0 = time.time()
            out = f({"p": packed_t, "pT": packed_T})
            _ = float(out["p"][0, 0])
            comp = time.time() - t0
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                out = f({"p": packed_t, "pT": packed_T})
                _ = float(out["p"][0, 0])
                best = min(best, time.perf_counter() - t0)
            return best, comp

        t1, c1 = timed(1)
        t21, c21 = timed(21)
        print(f"unroll={unroll}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
              f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
