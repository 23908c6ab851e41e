"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): sim-steps/sec at 1M Zanlungo agents on
one chip, target >100.  ``vs_baseline`` is value / 100.

Also measures the smaller configs from BASELINE.md (1k / 100k) and p50 step
latency; those land in the ``extra`` field of the same JSON line.

Usage: ``python bench.py`` (runs on whatever jax.devices() offers — the
driver runs it on a real TPU chip).  ``python bench.py --n 100000`` to
override the headline scale.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Pallas kernel compiles through the remote TPU tunnel take minutes; the
# persistent cache makes repeat runs (and driver re-runs) instant.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_bench(n_agents: int, dtype: str = "float32",
                backend: str = "grid_pallas"):
    """Dense-crowd Zanlungo scene at ``n_agents`` (BASELINE.json config 5:
    dense corridors stressing grid rebinning + force-kernel occupancy)."""
    from rmf_crowdsim_tpu import (
        GridConfig,
        ParityVelocity,
        SimConfig,
        SimParams,
        Zanlungo,
        make_state,
    )
    from rmf_crowdsim_tpu.core.step import build_rollout

    # ~2.5 agents per cell at cell_size=2, eyesight=2: a dense crowd.
    area_per_agent = 1.6
    side = float(np.ceil(np.sqrt(n_agents * area_per_agent)))
    cell = 2.0
    side = float(np.ceil(side / cell) * cell)
    config = SimConfig(
        capacity=n_agents,
        grid=GridConfig(width=side, height=side, cell_size=cell,
                        offset=(-side / 2, -side / 2)),
        neighbor_backend=backend,
        max_per_cell=16,
        max_eyesight=2.0,
        # bucket 8 halves the fused kernel's padded pair work vs 16; at
        # ~2.5 agents/tile the overflow probability is ~0.1% of tiles.
        bucket_capacity=8,
        sub_tiles=14,
        strip_tiles=98,
        dtype=dtype,
    )
    hl = ParityVelocity((1.0, 0.0))
    # Chunk the XLA-backend force pass at large N so [N,K] temporaries
    # stay bounded (the Pallas backend never materializes them).
    chunk = 32_768 if (backend == "grid" and n_agents > 65_536) else 0
    lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                  force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                  force_chunk=chunk)
    rollout = build_rollout(config, [hl], [lp])

    state = make_state(config)
    rng = np.random.default_rng(0)
    lim = side / 2 - 1.0
    f = config.jdtype
    state = state.replace(
        position=jnp.asarray(
            rng.uniform(-lim, lim, size=(n_agents, 2)), f
        ),
        eyesight=jnp.full((n_agents,), 2.0, f),
        alive=jnp.ones((n_agents,), jnp.bool_),
        uid=jnp.arange(n_agents, dtype=jnp.int32),
        hl_idx=jnp.zeros((n_agents,), jnp.int32),
        lp_idx=jnp.zeros((n_agents,), jnp.int32),
        priority=jnp.arange(n_agents, dtype=f),
        next_uid=jnp.asarray(n_agents, jnp.int32),
    )
    params = SimParams(hl=(hl.init_params(),), lp=(lp.init_params(),),
                       sources=None)
    return rollout, params, state


def time_steps(n_agents: int, n_steps: int = 20, reps: int = 3,
               backend: str = "grid_pallas"):
    """Returns (steps_per_sec, p50_step_ms) for the scene at n_agents.

    NOTE: sync via a host scalar fetch, NOT block_until_ready — through the
    axon TPU tunnel block_until_ready returns before remote execution
    finishes, producing fantasy timings."""
    rollout, params, state = build_bench(n_agents, backend=backend)
    run = jax.jit(rollout, static_argnums=(3,))
    # Warmup / compile; the float() fetch forces completion.
    st, _ = run(params, state, 1.0 / 60.0, n_steps)
    assert float(st.sim_time) > 0.0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st, counters = run(params, state, 1.0 / 60.0, n_steps)
        _ = float(st.sim_time)
        times.append(time.perf_counter() - t0)
    best = min(times)
    return n_steps / best, (best / n_steps) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000,
                    help="headline agent count")
    ap.add_argument("--quick", action="store_true",
                    help="skip the secondary configs")
    ap.add_argument("--backend", default=None,
                    help="neighbor backend (grid_pallas | grid | brute)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    extra = {"backend": platform, "device": str(jax.devices()[0])}

    headline_n = args.n
    sps = p50 = None
    # Ladder: fused Pallas backend at full scale, then the pure-XLA grid
    # backend at reduced scales if the kernel path fails.
    if args.backend:
        ladder = [(headline_n, args.backend), (262_144, args.backend)]
    else:
        ladder = [(headline_n, "grid_pallas"), (headline_n, "grid"),
                  (262_144, "grid"), (65_536, "grid")]
    for attempt_n, be in ladder:
        try:
            sps, p50 = time_steps(attempt_n, n_steps=20, backend=be)
            headline_n = attempt_n
            extra["neighbor_backend"] = be
            break
        except Exception as e:  # OOM / worker crash: recover, shrink scale
            print(f"bench at n={attempt_n} ({be}) failed: {e!r}",
                  file=sys.stderr)
            extra["fallback"] = True
            time.sleep(75)  # TPU worker restart after a crash takes ~1 min
    if sps is None:
        print(json.dumps({"metric": "sim_steps_per_sec", "value": 0,
                          "unit": "steps/s", "vs_baseline": 0.0,
                          "extra": extra}))
        return
    extra["p50_step_ms"] = round(p50, 3)
    extra["agent_steps_per_sec"] = round(sps * headline_n)

    if not args.quick:
        for n in (1_000, 100_000):
            if n >= headline_n:
                continue
            try:
                s, p = time_steps(n, n_steps=50 if n <= 10_000 else 20,
                                  backend=extra.get("neighbor_backend",
                                                    "grid"))
                extra[f"steps_per_sec_{n}"] = round(s, 1)
                extra[f"p50_step_ms_{n}"] = round(p, 3)
            except Exception as e:
                extra[f"steps_per_sec_{n}"] = f"failed: {e!r}"

    result = {
        "metric": f"sim_steps_per_sec_{headline_n}_zanlungo_grid",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / 100.0, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
