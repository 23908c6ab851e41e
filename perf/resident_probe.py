"""Resident-rollout diagnosis: marginal per-step cost at K=1 vs K=21
(rebins should fire ONCE per rollout on the bench scene), plus a
rebin-count probe that reruns the rollout's skin logic step by step.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_bench  # noqa: E402

N = 1_000_000


def main():
    rollout, params, state = build_bench(N)
    print(f"engine: {getattr(rollout, 'engine', '?')}", flush=True)
    run = jax.jit(rollout, static_argnums=(3,))

    for k in (1, 2, 21):
        t0 = time.time()
        st, counters = run(params, state, 1.0 / 60.0, k)
        _ = float(st.sim_time)
        comp = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st, counters = run(params, state, 1.0 / 60.0, k)
            _ = float(st.sim_time)
            best = min(best, time.perf_counter() - t0)
        print(f"K={k:2d}: total {best * 1e3:8.2f} ms "
              f"[compile {comp:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
