"""Piecewise prep experiments at 1M on the real chip.

Times the permutation-shaped pieces of bucketize/unbucketize and the
sort-with-payload reformulations (DESIGN_NOTES round-3 item 2).
Sync via host scalar fetch (tunnel: block_until_ready lies).
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1_000_000
SLOTS = 1_835_008  # ~ bench geometry slots (tx*ty*bucket), multiple of 512

rng = np.random.default_rng(0)
key_np = rng.integers(0, 57344, size=N).astype(np.int32)  # ~57k tiles
feat_np = rng.standard_normal((N, 16)).astype(np.float32)
out_np = rng.standard_normal((SLOTS, 2)).astype(np.float32)

key = jnp.asarray(key_np)
feat = jnp.asarray(feat_np)
out = jnp.asarray(out_np)
order = jnp.argsort(key, stable=True).astype(jnp.int32)
bpos_sorted = jnp.sort(
    jnp.asarray(rng.choice(SLOTS, size=N, replace=False).astype(np.int32)))
bucket_pos = jnp.zeros((N,), jnp.int32).at[order].set(bpos_sorted)

def timeit(name, fn, *args, reps=5):
    f = jax.jit(fn)
    r = f(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])  # sync
    best = 1e9
    for _i in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        leaf = jax.tree_util.tree_leaves(r)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return best

# --- baseline pieces
timeit("argsort[1M]", lambda k: jnp.argsort(k, stable=True), key)
timeit("feat_gather[1M,16]", lambda f, o: f[o], feat, order)
timeit("scatter_inverse[1M]",
       lambda b, o: jnp.zeros((N,), jnp.int32).at[o].set(b),
       bpos_sorted, order)
timeit("gather_out_random[1M,2]", lambda o, b: o[b], out, bucket_pos)
timeit("gather_out_monotone[1M,2]", lambda o, b: o[b], out, bpos_sorted)

# --- sort-with-payload variants
def sortpay17(k, f):
    ops = (k,) + tuple(f[:, i] for i in range(16)) + (
        jnp.arange(N, dtype=jnp.int32),)
    res = jax.lax.sort(ops, num_keys=1)
    return res[1]
timeit("sort17pay[1M]", sortpay17, key, feat)

def sortpay3(k, f):
    res = jax.lax.sort((k, f[:, 0], f[:, 1],
                        jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    return res[1]
timeit("sort3pay[1M]", sortpay3, key, feat)

# inverse-permutation-by-sort: sort (order, vx, vy) by order
vx = out[bpos_sorted]
def invsort(o, v):
    res = jax.lax.sort((o, v[:, 0], v[:, 1]), num_keys=1)
    return res[1]
timeit("inv_by_sort2pay[1M]", invsort, order, vx)

# combined candidate pipeline A (general engine, no new kernels):
#   sort17pay  (feat_sorted + order payload)
#   + gather_out_monotone + inv_by_sort
def pipeA(k, f, o):
    ops = (k,) + tuple(f[:, i] for i in range(16)) + (
        jnp.arange(N, dtype=jnp.int32),)
    res = jax.lax.sort(ops, num_keys=1)
    ordr = res[-1]
    outv = o[bpos_sorted]
    res2 = jax.lax.sort((ordr, outv[:, 0], outv[:, 1]), num_keys=1)
    return res2[1]
timeit("pipeA_full", pipeA, key, feat, out)

# today's pipeline equivalent for comparison
def pipeB(k, f, o):
    ordr = jnp.argsort(k, stable=True).astype(jnp.int32)
    fs = f[ordr]
    bp = jnp.zeros((N,), jnp.int32).at[ordr].set(bpos_sorted)
    v = o[bp]
    return fs[:, 0] + v[:, 0]
timeit("pipeB_today", pipeB, key, feat, out)
