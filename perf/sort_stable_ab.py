"""A/B: lax.sort stable vs unstable for the presort payload sort.

Presort (core/step.py) runs one is_stable=True lax.sort with 14 f32/i32
payloads at [1M] every step (~7.7 ms scan-amortized).  XLA implements
stability by appending an iota tiebreak key — if that costs ~1 ms it is
worth a config knob (tie order only shifts f32 force-sum tie-breaks).

Methodology: perf/scan_ops.py slope — K=1 vs K=21 inside lax.scan.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1_000_000
rng = np.random.default_rng(0)
key0 = jnp.asarray(rng.integers(0, 57_000, N), jnp.int32)
pay = [jnp.asarray(rng.standard_normal(N), jnp.float32) for _ in range(13)]
pay.append(jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32))

def make(stable):
    def body(c, _):
        k = c[0] ^ 1  # perturb so steps aren't no-ops
        res = jax.lax.sort((k,) + tuple(c[1:]), num_keys=1,
                           is_stable=stable)
        return res, ()
    def run(c, K):
        out, _ = jax.lax.scan(body, c, None, length=K)
        return out
    return jax.jit(run, static_argnums=(1,))

for stable in (True, False):
    f = make(stable)
    c0 = (key0,) + tuple(pay)
    ts = {}
    for K in (1, 21):
        out = f(c0, K); _ = float(out[1][0])  # warm + sync
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = f(c0, K); _ = float(out[1][0])
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    slope = (ts[21] - ts[1]) / 20 * 1e3
    print(f"stable={stable}: per-sort {slope:.2f} ms  (K1 {ts[1]*1e3:.1f} ms)",
          flush=True)
