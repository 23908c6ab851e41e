"""Prep-fusion floor probe (VERDICT r4 item 1): is there room for a
Pallas sort/rank/pack fusion kernel below the XLA ops it would replace?

Measures, scan-amortized at the 1M bench scene:
  sort14      — the production presort: ONE unstable lax.sort, tile key
                + 14 payloads (core/step.payload_sort_by_key).
  perm14      — the PERMUTATION FLOOR: the same 14 payloads moved by a
                precomputed [N] gather (what any sort kernel must pay
                just to MOVE the data, with zero comparison work).
  perm14_sc   — the same move as a row scatter (the write-side bound).
  rank        — rank_from_sorted_key (CSEs under the scan because the
                sorted key column is loop-invariant; the honest number
                is step_parts' bucketize delta minus the pack kernel,
                ~1.8 ms).
  key+argsort — key build + argsort alone (the index-only sort a
                counting/radix kernel would replace).

Decision rule: a streaming radix/counting kernel can at best approach
perm14 + epsilon.  If sort14 / perm14 < ~2, the fusion's ceiling is a
few ms on RESORT steps only (the skin presort already skips clean
steps) and the project cannot reach VERDICT's "prep <= 8 ms" by itself.

MEASURED 2026-08-19 (v5e, 1M bench scene):
  sort14 6.04 ms · perm14 gather 104.8 · perm14 scatter 82.1 ·
  key+argsort 0.95.  sort14 is ~17x FASTER than applying a
  PRECOMPUTED permutation with per-row gathers: XLA's sort network
  moves payloads in coalesced tiled passes and never pays the
  ~30 GB/s per-element addressing floor.  Any "compute the index map
  cheaply, then move rows" prep kernel (two-pass radix, counting sort,
  merge of the nearly-sorted carry) is therefore DEAD ON ARRIVAL: the
  move alone costs 17x the whole sort.  VERDICT r4 item 1's
  sequential-grid sort/rank/pack fusion is falsified by measurement —
  the viable prep levers were the ones already landed (skin-deferred
  presort + carried binning + fresh-dead masking, unstable sort,
  windowed rank, the MXU pack kernel).
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
    rank_from_sorted_key, tile_key,
)

N = 1_000_000


def timed(tag, fn, carry, k=21):
    f = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=k)[0])
    f1 = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=1)[0])
    t0 = time.time()
    o = f1(carry)
    _ = float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    o = f(carry)
    _ = float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
    comp = time.time() - t0
    b1 = b21 = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        o = f1(carry)
        _ = float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        o = f(carry)
        _ = float(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
        b21 = min(b21, time.perf_counter() - t0)
    per = (b21 - b1) / (k - 1) * 1e3
    print(f"{tag:12s}: {per:7.3f} ms/op  [compile {comp:.0f}s]",
          flush=True)
    return per


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    f32 = jnp.float32
    pos = carry["pos"]
    alive = carry["alive"]
    key = tile_key(bcfg, pos, alive)
    order = jnp.argsort(key, stable=False).astype(jnp.int32)
    pays = {
        f"p{i}": (pos[:, 0] if i % 2 else pos[:, 1]) * (1.0 + 1e-6 * i)
        for i in range(14)
    }

    def jiggle(c):
        # Perturb so the scan can't CSE; keep keys/indices valid.
        return {k_: v * 1.0000001 if v.dtype == f32 else v
                for k_, v in c.items()}

    def sort14(c, _):
        c = jiggle(c)
        res = jax.lax.sort(
            tuple([c["key"]] + [c[f"p{i}"] for i in range(14)]),
            num_keys=1, is_stable=False,
        )
        c2 = dict(c)
        c2["key"] = res[0]
        for i in range(14):
            c2[f"p{i}"] = res[i + 1]
        return c2, None

    def perm14(c, _):
        c = jiggle(c)
        c2 = dict(c)
        for i in range(14):
            c2[f"p{i}"] = c[f"p{i}"][c["ord"]]
        return c2, None

    def perm14_sc(c, _):
        c = jiggle(c)
        c2 = dict(c)
        for i in range(14):
            c2[f"p{i}"] = jnp.zeros_like(c[f"p{i}"]).at[c["ord"]].set(
                c[f"p{i}"]
            )
        return c2, None

    def rank_only(c, _):
        c = jiggle(c)
        bpos, occ, over = rank_from_sorted_key(bcfg, c["skey"])
        c2 = dict(c)
        c2["p0"] = c["p0"] + bpos.astype(f32) * 1e-30
        return c2, None

    def key_argsort(c, _):
        c = jiggle(c)
        k_ = tile_key(bcfg, jnp.stack([c["p0"], c["p1"]], -1), alive)
        o = jnp.argsort(k_, stable=False).astype(jnp.int32)
        c2 = dict(c)
        c2["p0"] = c["p0"] + o.astype(f32) * 1e-30
        return c2, None

    base = dict(pays)
    base["key"] = key
    base["ord"] = order
    base["skey"] = jnp.sort(key)
    print(f"device: {jax.devices()[0]}", flush=True)
    s = timed("sort14", sort14, base)
    g = timed("perm14", perm14, base)
    timed("perm14_sc", perm14_sc, base)
    timed("rank", rank_only, base)
    timed("key+argsort", key_argsort, base)
    print(f"sort14 / perm14 gather floor = {s / g:.2f}x", flush=True)


if __name__ == "__main__":
    main()
