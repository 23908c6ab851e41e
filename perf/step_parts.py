"""Scan-amortized decomposition of the 1M bench step (RTT-corrected).

Builds prefix-pipelines of the production grid_pallas step (presort ->
bucketize -> kernel -> unbucketize -> spill patch), runs each under
lax.scan at K=1 and K=21, and reports marginal per-step cost; consecutive
deltas give the true in-context cost of each stage.  The carry keeps the
state tile-sorted across iterations exactly like config.presort does, so
the sort sees production-realistic nearly-sorted keys.

Usage: python perf/step_parts.py [stage ...]   (stages: presort bucketize
kernel unbucket spill full)
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

from bench import build_bench, _bench_config  # noqa: E402
from rmf_crowdsim_tpu.models.local import ZanlungoParams  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    BucketConfig, bucketize, spill_patch, tile_key, zanlungo_forces_bucketed,
)

N = 1_000_000


def setup():
    cfg = _bench_config(N)
    bcfg = BucketConfig.create(
        cfg.grid.width, cfg.grid.height, cfg.grid.offset, cfg.max_eyesight,
        bucket=cfg.bucket_capacity, strip_tiles=cfg.strip_tiles,
        sub_tiles=cfg.sub_tiles, tile_size=cfg.bucket_tile_size or None,
    )
    rng = np.random.default_rng(0)
    side = cfg.grid.width
    lim = side / 2 - 1.0
    pos = jnp.asarray(rng.uniform(-lim, lim, (N, 2)), jnp.float32)
    vel = jnp.asarray(rng.standard_normal((N, 2)) * 0.3, jnp.float32)
    carry = {
        "pos": pos, "vel": vel, "pref": vel,
        "prio": jnp.arange(N, dtype=jnp.float32),
        "eye": jnp.full((N,), 2.0, jnp.float32),
        "alive": jnp.ones((N,), bool),
        "i32a": jnp.arange(N, dtype=jnp.int32),
        "i32b": jnp.zeros((N,), jnp.int32),
        "i32c": jnp.zeros((N,), jnp.int32),
        "i32d": jnp.zeros((N,), jnp.int32),
        "i32e": jnp.zeros((N,), jnp.int32),
        "boolb": jnp.zeros((N,), bool),
    }
    zp = ZanlungoParams(
        agent_scale=jnp.float32(1.0), obstacle_scale=jnp.float32(1.0),
        reaction_time=jnp.float32(0.0), force_distance=jnp.float32(1.0),
        agent_mass=jnp.float32(2.0), agent_radius=jnp.float32(0.25),
        force_cap=jnp.float32(20.0),
    )
    zp4 = jnp.asarray([1.0, 1.0, 2.0, 0.25, 20.0], jnp.float32)
    return cfg, bcfg, carry, zp, zp4


def make_body(stage: str, cfg, bcfg, zp, zp4):
    spill_cap = cfg.spill_capacity

    def presort(c):
        tkey = tile_key(bcfg, c["pos"], c["alive"])
        res = jax.lax.sort(
            (tkey, c["pos"][:, 0], c["pos"][:, 1], c["vel"][:, 0],
             c["vel"][:, 1], c["pref"][:, 0], c["pref"][:, 1], c["i32a"],
             c["eye"], c["alive"], c["i32b"], c["i32c"], c["i32d"],
             c["i32e"], c["prio"], c["boolb"]),
            num_keys=1, is_stable=True,
        )
        (_, px, py, vx, vy, fx, fy, i32a, eye, alive, i32b, i32c, i32d,
         i32e, prio, boolb) = res
        c = dict(c)
        c.update(pos=jnp.stack([px, py], -1), vel=jnp.stack([vx, vy], -1),
                 pref=jnp.stack([fx, fy], -1), i32a=i32a, eye=eye,
                 alive=alive, i32b=i32b, i32c=i32c, i32d=i32d, i32e=i32e,
                 prio=prio, boolb=boolb)
        return c

    def buck(c):
        return bucketize(
            bcfg, c["pos"], c["vel"], c["pref"], c["pref"], c["prio"],
            c["eye"], c["vel"], c["alive"], use_pack_kernel=True,
            presorted=True,
        )

    def body(c, _):
        if stage == "presort":
            c = presort(c)
            out = c["pos"][0, 0]
        elif stage == "bucketize":
            c = presort(c)
            packed_t, packed_T, bucket_pos, max_occ, dropped = buck(c)
            out = packed_t[0, 0] + packed_T[0, 0]
        elif stage == "kernel":
            c = presort(c)
            packed_t, packed_T, bucket_pos, max_occ, dropped = buck(c)
            o = zanlungo_forces_bucketed(bcfg, zp4, packed_t,
                                         packed_T=packed_T)
            out = o[0, 0]
        elif stage == "unbucket":
            c = presort(c)
            packed_t, packed_T, bucket_pos, max_occ, dropped = buck(c)
            o = zanlungo_forces_bucketed(bcfg, zp4, packed_t,
                                         packed_T=packed_T)
            ok = (bucket_pos < bcfg.slots) & c["alive"]
            v = jnp.where(ok[:, None],
                          o[jnp.clip(bucket_pos, 0, bcfg.slots - 1)],
                          c["vel"])
            out = v[0, 0]
            c = dict(c)
            c["vel"] = v * 0.999 + c["vel"] * 0.001
        elif stage == "spill":
            c = presort(c)
            packed_t, packed_T, bucket_pos, max_occ, dropped = buck(c)
            o = zanlungo_forces_bucketed(bcfg, zp4, packed_t,
                                         packed_T=packed_T)
            ok = (bucket_pos < bcfg.slots) & c["alive"]
            v = jnp.where(ok[:, None],
                          o[jnp.clip(bucket_pos, 0, bcfg.slots - 1)],
                          c["vel"])
            v, unresolved = spill_patch(
                bcfg, zp, c["pos"], c["vel"], c["pref"], c["pref"],
                c["prio"], c["eye"], c["alive"], c["vel"], packed_t,
                bucket_pos, v, spill_cap, packed_T=packed_T,
            )
            out = v[0, 0]
            c = dict(c)
            c["vel"] = v * 0.999 + c["vel"] * 0.001
        # integrate a hair so keys drift like production; fold the stage
        # product into the carry (ys is DISCARDED by timed_scan — without
        # this, XLA dead-code-eliminates the whole stage).
        c = dict(c)
        c["pos"] = (c["pos"] + c["vel"] * (1.0 / 60.0) * 0.01
                    + out * jnp.float32(1e-30))
        c["pos"] = jnp.clip(c["pos"], -cfg.grid.width / 2 + 1,
                            cfg.grid.width / 2 - 1)
        return c, out

    return body


def timed_scan(body, carry, k):
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
    t0 = time.time()
    out = f(carry)
    _ = float(out["pos"][0, 0])
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(carry)
        _ = float(out["pos"][0, 0])
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def run_full():
    from bench import time_steps
    sps, p50 = time_steps(N, n_steps=20)
    print(f"{'full step':12s}: {p50:7.3f} ms/step  ({sps:.2f} steps/s)",
          flush=True)


def main():
    stages = sys.argv[1:] or ["presort", "bucketize", "kernel", "unbucket",
                              "spill", "full"]
    cfg, bcfg, carry, zp, zp4 = setup()
    print(f"device: {jax.devices()[0]}  slots={bcfg.slots}", flush=True)
    prev = None
    for s in stages:
        if s == "full":
            run_full()
            continue
        body = make_body(s, cfg, bcfg, zp, zp4)
        t1, c1 = timed_scan(body, carry, 1)
        t21, c21 = timed_scan(body, carry, 21)
        per = (t21 - t1) / 20.0
        delta = "" if prev is None else f"  (+{(per - prev) * 1e3:.1f})"
        print(f"{s:12s}: {per * 1e3:7.3f} ms/step{delta}  "
              f"[K=1 {t1 * 1e3:6.1f}, K=21 {t21 * 1e3:7.1f}, "
              f"compiles {c1:.0f}/{c21:.0f}s]", flush=True)
        prev = per


if __name__ == "__main__":
    main()
