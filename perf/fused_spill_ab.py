"""A/B the fused spill repair (kernel fourth-segment + own-rows pass)
vs the spill_patch path, standalone zanlungo_fused at the 1M bench
scene, scan-amortized (presorted + pack kernel + dual_row + int_prio —
the production configuration)."""

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
    tile_key, zanlungo_fused,
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
    print(f"device: {jax.devices()[0]}", flush=True)

    def make(fused):
        def body(c, _):
            # Jiggle VELOCITY only: jiggling positions flips tile keys
            # for boundary-straddlers, breaking the presorted contract
            # (measured: ~10k phantom pack-overflows/step — the
            # production step re-sorts instead).  Position-only work
            # (rank, spill discovery) hoists as loop-invariant on BOTH
            # arms; the delta isolates the vel-dependent spill repair:
            # patch window-kernel + scatters vs fourth-segment +
            # own-rows.
            p = c["pos"]
            v = c["vel"] * 1.0000001
            out, occ, dropped = zanlungo_fused(
                bcfg, zp, p, v, v, v, prio, eye, al, v,
                use_pack_kernel=True, spill_capacity=244,
                presorted=True, int_prio=True, dual_row=True,
                fused_spills=fused,
            )
            return {"pos": p, "vel": v + out * 1e-30,
                    "occ": occ, "dr": dropped}, None
        return body

    for fused in (False, True):
        body = make(fused)
        c0 = {"pos": pos, "vel": vel, "occ": jnp.int32(0),
              "dr": jnp.int32(0)}

        def timed(k):
            f = jax.jit(
                lambda c: jax.lax.scan(body, c, None, length=k)[0])
            t0 = time.time()
            o = f(c0)
            _ = float(o["pos"][0, 0])
            comp = time.time() - t0
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                o = f(c0)
                _ = float(o["pos"][0, 0])
                best = min(best, time.perf_counter() - t0)
            return best, comp, o

        t1, c1, _ = timed(1)
        t21, c21, o = timed(21)
        print(f"fused={fused}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
              f"occ={int(o['occ'])} dropped={int(o['dr'])} "
              f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
