"""Diagnose the bench compiled-parity failure (bench.py:225).

Runs the exact parity scene (4096 dense agents + a bucket-overflow
hotspot) through the brute oracle and the grid_pallas backend ONE STEP
AT A TIME, feeding each backend its own state forward, and reports the
per-step divergence growth plus the identity of the worst agents.

Interpretation guide:
  - step-1 diff ~1e-6 growing ~10x/step  -> f32 reduction-order noise
    amplified by chaotic dynamics (not a kernel bug; the gate needs a
    shorter horizon or a single-step velocity comparison).
  - step-1 diff large on a few agents    -> real kernel divergence;
    check whether they sit in the hotspot (spill path) region.

Usage:
  JAX_PLATFORMS=cpu python perf/parity_debug.py --platform cpu
  python perf/parity_debug.py --platform tpu          (compiled Mosaic)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build(backend: str, interpret: bool, n_agents: int):
    from bench import _bench_config, build_bench
    from rmf_crowdsim_tpu.core.step import build_rollout
    from rmf_crowdsim_tpu import ParityVelocity, Zanlungo, SimParams

    rollout, params, state = build_bench(n_agents, backend=backend)
    if interpret and backend == "grid_pallas":
        cfg = dataclasses.replace(
            _bench_config(n_agents, backend=backend), pallas_interpret=True
        )
        hl = ParityVelocity((1.0, 0.0))
        lp = Zanlungo(agent_scale=1.0, obstacle_scale=1.0, reaction_time=0.0,
                      force_distance=1.0, agent_mass=2.0, agent_radius=0.25,
                      force_cap=20.0)
        rollout = build_rollout(cfg, [hl], [lp])
    # Hotspot identical to bench.compiled_parity_check
    pos = np.asarray(state.position).copy()
    rng = np.random.default_rng(7)
    pos[:48] = rng.uniform(0.0, 2.0, (48, 2)) + 10.0
    state = state.replace(position=jnp.asarray(pos, pos.dtype))
    return jax.jit(rollout, static_argnums=(3,)), params, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="tpu")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), file=sys.stderr)

    run_b, params_b, st_b = build("brute", False, args.n)
    interpret = args.platform == "cpu"
    run_g, params_g, st_g = build("grid_pallas", interpret, args.n)

    hot0 = np.asarray(st_b.position)[:48]
    for step in range(1, args.steps + 1):
        st_b, cb = run_b(params_b, st_b, 1.0 / 60.0, 1)
        st_g, cg = run_g(params_g, st_g, 1.0 / 60.0, 1)
        ob = np.argsort(np.asarray(st_b.uid))
        og = np.argsort(np.asarray(st_g.uid))
        pb = np.asarray(st_b.position)[ob]
        pg = np.asarray(st_g.position)[og]
        vb = np.asarray(st_b.velocity)[ob]
        vg = np.asarray(st_g.velocity)[og]
        dp = np.abs(pb - pg).max(axis=-1)
        dv = np.abs(vb - vg).max(axis=-1)
        worst = np.argsort(dp)[::-1][:8]
        n_bad = int((dp > 2e-4).sum())
        tb = int(np.max(np.asarray(cb.neighbor_truncated)))
        tg = int(np.max(np.asarray(cg.neighbor_truncated)))
        print(f"step {step}: max|dpos|={dp.max():.3e} max|dvel|={dv.max():.3e}"
              f" n(dpos>2e-4)={n_bad} trunc(brute={tb},pallas={tg})")
        if dp.max() > 0:
            rows = ", ".join(
                f"#{i}(dp={dp[i]:.2e}, pos=({pb[i,0]:.1f},{pb[i,1]:.1f})"
                f"{' HOT' if i < 48 else ''})"
                for i in worst if dp[i] > 0
            )
            print(f"   worst: {rows}")
    # where is the hotspot now
    print("hotspot start:", hot0.mean(axis=0))


if __name__ == "__main__":
    main()
