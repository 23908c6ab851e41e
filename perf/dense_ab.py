"""A/B the dense (bucket-free) fused kernel vs the bucketed production
pipeline at the 1M bench density, scan-amortized (K=1 vs K=21 marginal).

Stages, all keeping the carry tile-sorted like config.presort does:
  dense:<tile>   presort(by dense key) + zanlungo_fused_dense
  dense_k:<tile> kernel only (prep hoisted out of the scan)
  bucketed       presort + bucketize + kernel + unbucket gather (the
                 production r5 pipeline body, no spill)

Usage: python perf/dense_ab.py [tile ...]   (default 5.3 2.65)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup, N  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_dense import (  # noqa: E402
    DenseConfig, dense_prep, zanlungo_fused_dense, zanlungo_forces_dense,
)
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    bucketize, tile_key, zanlungo_forces_bucketed, zparams5,
)


def presort_keep_key(dcfg, c):
    tkey = tile_key(dcfg, c["pos"], c["alive"])
    res = jax.lax.sort(
        (tkey, c["pos"][:, 0], c["pos"][:, 1], c["vel"][:, 0],
         c["vel"][:, 1], c["pref"][:, 0], c["pref"][:, 1], c["i32a"],
         c["eye"], c["alive"], c["prio"]),
        num_keys=1, is_stable=False,
    )
    (key_s, px, py, vx, vy, fx, fy, i32a, eye, alive, prio) = res
    c = dict(c)
    c.update(pos=jnp.stack([px, py], -1), vel=jnp.stack([vx, vy], -1),
             pref=jnp.stack([fx, fy], -1), i32a=i32a, eye=eye,
             alive=alive, prio=prio)
    return c, key_s


def timed(f, carry):
    t0 = time.time()
    out = f(carry)
    _ = float(out["pos"][0, 0])
    comp = time.time() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(carry)
        _ = float(out["pos"][0, 0])
        best = min(best, time.perf_counter() - t0)
    return best, comp


def measure(tag, body, carry):
    def run(k):
        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        return timed(f, carry)

    t1, c1 = run(1)
    t21, c21 = run(21)
    print(f"{tag:14s}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
          f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


def main():
    cfg, bcfg, carry0, zp, zp4 = setup()
    tiles = [float(t) for t in sys.argv[1:]] or [5.3, 2.65]

    base = {k: carry0[k] for k in
            ("pos", "vel", "pref", "prio", "eye", "alive", "i32a")}

    for tile in tiles:
        dcfg = DenseConfig.create(
            cfg.grid.width, cfg.grid.height, cfg.grid.offset,
            cfg.max_eyesight, N, tile_size=tile)
        print(f"tile={tile}: tx={dcfg.tx} ty={dcfg.ty} "
              f"col_cap={dcfg.col_cap} slots={dcfg.slots}", flush=True)

        def dense_body(c, _, dcfg=dcfg):
            c, key_s = presort_keep_key(dcfg, c)
            vel, occ, dropped = zanlungo_fused_dense(
                dcfg, zp, c["pos"], c["vel"], c["pref"], c["pref"],
                c["prio"], c["eye"], c["alive"], c["vel"], key_s)
            c = dict(c)
            c["pos"] = c["pos"] + vel * 1e-7 + (
                dropped.astype(jnp.float32) * 1e-30)
            return c, None

        # Kernel-only: prep hoisted, scan perturbs feat in place.
        cs, key_s = jax.jit(lambda c: presort_keep_key(dcfg, c))(base)
        feat_T, tile_start, qn, dma, bpos, n_over, occ = jax.jit(
            lambda c, k: dense_prep(dcfg, k, c["pos"], c["vel"], c["pref"],
                                    c["pref"], c["prio"], c["eye"],
                                    c["vel"], c["alive"]))(cs, key_s)
        print(f"  n_col_over={int(n_over)} max_occ={int(occ)}", flush=True)

        def kern_body(c, _, dcfg=dcfg, ts=tile_start, qn=qn, dma=dma):
            f = c["pos"] * 1.0000001
            out = zanlungo_forces_dense(dcfg, zparams5(zp), f, ts, qn, dma)
            return {"pos": f + out[0, 0] * 1e-30}, None

        measure(f"dense_k:{tile}", kern_body, {"pos": feat_T})
        measure(f"dense:{tile}", dense_body, dict(base))

    def bucket_body(c, _):
        c, _key = presort_keep_key(bcfg, c)
        packed_t, packed_T, bucket_pos, max_occ, dropped = bucketize(
            bcfg, c["pos"], c["vel"], c["pref"], c["pref"], c["prio"],
            c["eye"], c["vel"], c["alive"], use_pack_kernel=True,
            presorted=True)
        out = zanlungo_forces_bucketed(bcfg, zp4, packed_t,
                                       packed_T=packed_T)
        vel = out[jnp.clip(bucket_pos, 0, bcfg.slots - 1)]
        c = dict(c)
        c["pos"] = c["pos"] + vel * 1e-7
        return c, None

    measure("bucketed", bucket_body, dict(base))


if __name__ == "__main__":
    main()
