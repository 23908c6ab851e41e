"""Spill-patch cost curve: scan-amortized cost of spill_patch at forced
spill counts (the tier ladder 16/64/256/s_cap), 1M bench scene.

Decides the resident-mode breach-eviction design (DESIGN_NOTES round 4):
evicting skin-breachers into the spill list avoids full resorts ONLY if
the patch's marginal cost per spill stays below the amortized resort
cost it saves.
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

from perf.step_parts import setup  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    bucketize, spill_patch, tile_key,
)


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    n = carry["pos"].shape[0]
    key = tile_key(bcfg, carry["pos"], carry["alive"])
    order = jnp.argsort(key, stable=True)
    pos = carry["pos"][order]
    vel = carry["vel"][order]
    prio = carry["prio"][order]
    eye = carry["eye"][order]
    alive = carry["alive"][order]
    packed_t, packed_T, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, prio, eye, v, alive,
            use_pack_kernel=True, presorted=True)
    )(pos, vel)
    nat = int(dropped)
    print(f"natural spills: {nat}", flush=True)

    for extra in (0, 100, 250, 500, 950):
        want = nat + extra
        # Evict `extra` random in-bucket agents: set their bucket_pos to
        # the spill sentinel (their slots keep stale rows — fine for a
        # timing probe).
        rng = np.random.default_rng(1)
        idx = jnp.asarray(
            rng.choice(n, size=max(extra, 1), replace=False), jnp.int32)
        bpos_f = bpos if extra == 0 else bpos.at[idx].set(bcfg.slots)
        s_cap = 1024

        def body(cr, _):
            p = cr["pos"] * 1.0000001
            v, unresolved = spill_patch(
                bcfg, zp, p, vel, vel, vel, prio, eye, alive, vel,
                cr["pt"], bpos_f, cr["v0"], s_cap,
                int_prio=True, packed_T=packed_T,
            )
            return {"pos": p, "pt": cr["pt"],
                    "v0": cr["v0"] + v * 1e-30}, None

        def timed(k):
            f = jax.jit(lambda c: jax.lax.scan(
                body, c, None, length=k)[0])
            c0 = {"pos": pos, "pt": packed_t,
                  "v0": jnp.zeros((n, 2), jnp.float32)}
            t0 = time.time()
            out = f(c0)
            _ = float(out["v0"][0, 0])
            comp = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(c0)
                _ = float(out["v0"][0, 0])
                best = min(best, time.perf_counter() - t0)
            return best, comp

        t1, c1 = timed(1)
        t21, c21 = timed(21)
        print(f"spills ~{want:5d}: {(t21 - t1) / 20 * 1e3:7.3f} ms "
              f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
