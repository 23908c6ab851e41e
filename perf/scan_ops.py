"""Scan-amortized primitive-op costs (RTT-corrected).

Round-3 discovery: every dispatch+host-scalar-fetch through the axon
tunnel pays a ~25 ms round trip, which polluted all of round 2's
"jit-isolated" numbers (a 256 MB elementwise op "measured" 26.4 ms).
This harness times each op inside a lax.scan at K=1 and K=21 and reports
the slope (t21 - t1) / 20 — the true marginal per-op device cost.

Usage: python perf/scan_ops.py [op ...]
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

N = 1_000_000


def _lcg(k):
    return (k * jnp.uint32(1664525) + jnp.uint32(1013904223))


def make_ops():
    rng = np.random.default_rng(0)
    perm0 = jnp.asarray(rng.permutation(N), jnp.int32)
    keys0 = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64),
                        jnp.uint32)
    rows0 = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
    big0 = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(N), jnp.float32)

    ops = {}

    def noop_body(c, _):
        return {"x": c["x"] * 1.0000001 + 1e-9}, None
    ops["noop"] = ({"x": jnp.ones((8, 128), jnp.float32)}, noop_body, None)

    def ew_body(c, _):
        return {"x": c["x"] * 1.0000001 + 1e-9}, None
    ops["ew256MB"] = ({"x": big0}, ew_body, "512MB moved")

    def argsort_body(c, _):
        k = _lcg(c["k"])
        order = jnp.argsort(k)
        return {"k": k + order.astype(jnp.uint32)}, None
    ops["argsort_1M_u32"] = ({"k": keys0}, argsort_body, None)

    def sortpay_body(c, _):
        k = _lcg(c["k"])
        pays = tuple(c["p"][:, i] for i in range(16))
        res = jax.lax.sort((k,) + pays, num_keys=1, is_stable=True)
        return {"k": res[0], "p": jnp.stack(res[1:], axis=-1)}, None
    ops["sort_1M_16pay"] = ({"k": keys0, "p": rows0}, sortpay_body,
                            "the presort op shape")

    def gather_body(c, _):
        out = c["r"][c["perm"]]
        return {"r": out, "perm": c["perm"][c["perm"]]}, None
    ops["gather_1M_16col"] = ({"r": rows0, "perm": perm0}, gather_body, None)

    def gather1_body(c, _):
        out = c["x"][c["perm"]]
        return {"x": out, "perm": c["perm"][c["perm"]]}, None
    ops["gather_1M_1col"] = ({"x": x0, "perm": perm0}, gather1_body,
                             "includes the perm self-gather")

    def scatter_body(c, _):
        out = jnp.zeros((N,), jnp.float32).at[c["perm"]].set(c["x"])
        return {"x": out, "perm": c["perm"]}, None
    ops["scatter_1M_1col"] = ({"x": x0, "perm": perm0}, scatter_body, None)

    def cumsum_body(c, _):
        return {"x": jnp.cumsum(c["x"]) * 1e-7}, None
    ops["cumsum_1M"] = ({"x": x0}, cumsum_body, None)

    def key_sortpay_body(c, _):
        # tile_key-shaped: compute key from 2D pos, sort 18 payloads.
        k = (c["p"][:, 0] * 190.0 + c["p"][:, 1]).astype(jnp.int32)
        pays = tuple(c["p"][:, i] for i in range(16))
        res = jax.lax.sort((k,) + pays, num_keys=1, is_stable=True)
        return {"p": jnp.stack(res[1:], axis=-1) * 1.0000001}, None
    ops["key_sort_1M_16pay"] = ({"p": rows0}, key_sortpay_body,
                                "tile_key + presort together")
    return ops


def run(name, init, body, note):
    def timed(k):
        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        t0 = time.time()
        out = f(init)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.ravel(leaf)[0])
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(init)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.ravel(leaf)[0])
            best = min(best, time.perf_counter() - t0)
        return best, compile_s

    t1, c1 = timed(1)
    t21, c21 = timed(21)
    per = (t21 - t1) / 20.0
    extra = f"  ({note})" if note else ""
    print(f"{name:22s}: {per * 1e3:7.3f} ms/op   "
          f"[K=1 {t1 * 1e3:6.1f} ms, K=21 {t21 * 1e3:7.1f} ms, "
          f"compiles {c1:.0f}/{c21:.0f}s]{extra}", flush=True)


def main():
    ops = make_ops()
    names = sys.argv[1:] or list(ops)
    print(f"device: {jax.devices()[0]}", flush=True)
    for n in names:
        init, body, note = ops[n]
        run(n, init, body, note)


if __name__ == "__main__":
    main()
