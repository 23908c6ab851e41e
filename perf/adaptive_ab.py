"""A/B the occupancy-adaptive kernel (per-sub-block live-count skip) vs
the always-execute kernel, standalone scan-amortized, int_prio.

Scenes:
  uniform — the 1M bench scene (every sub-block occupied: measures the
            adaptive guard's overhead, expected ~0)
  half    — 1M agents at the SAME local density in the left half of a
            2x-area world (half the sub-blocks empty: kernel work should
            scale with occupied area, ~2x)

Snapshot the pre-adaptive module first:
    git show <pre-adaptive-rev>:rmf_crowdsim_tpu/ops/zanlungo_pallas.py \
        > /tmp/zp_old.py
Without the snapshot, only the adaptive kernel is measured.
"""
import importlib.util
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import (  # noqa: E402
    BucketConfig, bucketize, tile_key,
)

N = 1_000_000


def make_scene(half: bool):
    area_per_agent = 1.6
    area = N * area_per_agent * (2.0 if half else 1.0)
    side = float(np.ceil(np.sqrt(area) / 2.0) * 2.0)
    bcfg = BucketConfig.create(side, side, (-side / 2, -side / 2), 2.0,
                               bucket=32, strip_tiles=96, sub_tiles=2,
                               tile_size=5.3)
    rng = np.random.default_rng(0)
    lim = side / 2 - 1.0
    x_hi = 0.0 if half else lim  # left half only when `half`
    pos = np.stack([
        rng.uniform(-lim, x_hi, N),
        rng.uniform(-lim, lim, N),
    ], axis=-1)
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(rng.standard_normal((N, 2)) * 0.3, jnp.float32)
    prio = jnp.arange(N, dtype=jnp.float32)
    eye = jnp.full((N,), 2.0, jnp.float32)
    alive = jnp.ones((N,), bool)
    key = tile_key(bcfg, pos, alive)
    order = jnp.argsort(key, stable=True)
    packed_t, packed_T, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, prio[order], eye[order],
            v, alive[order], use_pack_kernel=True, presorted=True)
    )(pos[order], vel[order])
    print(f"scene {'half' if half else 'uniform'}: side={side:.0f} "
          f"slots={bcfg.slots} occ={int(occ)} dropped={int(dropped)}",
          flush=True)
    return bcfg, packed_t, packed_T


def measure(tag, fn, packed_t, packed_T):
    def body(cr, _):
        p = cr["p"] * 1.0000001
        pT = cr["pT"] * 1.0000001
        o = fn(p, pT)
        return {"p": p + o[0, 0] * 1e-30, "pT": pT}, None

    def timed(k):
        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        t0 = time.time()
        out = f({"p": packed_t, "pT": packed_T})
        _ = float(out["p"][0, 0])
        comp = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f({"p": packed_t, "pT": packed_T})
            _ = float(out["p"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best, comp

    t1, c1 = timed(1)
    t21, c21 = timed(21)
    print(f"{tag:16s}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
          f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


def main():
    zp4 = jnp.asarray([1.0, 1.0, 2.0, 0.25, 20.0], jnp.float32)
    old = None
    if os.path.exists("/tmp/zp_old.py"):
        spec = importlib.util.spec_from_file_location(
            "rmf_crowdsim_tpu.ops.zp_old_ab", "/tmp/zp_old.py"
        )
        old = importlib.util.module_from_spec(spec)
        sys.modules["rmf_crowdsim_tpu.ops.zp_old_ab"] = old
        spec.loader.exec_module(old)

    for half in (False, True):
        bcfg, packed_t, packed_T = make_scene(half)
        new = jax.jit(lambda p, pT: zpal.zanlungo_forces_bucketed(
            bcfg, zp4, p, int_prio=True, packed_T=pT))
        if old is not None:
            obcfg = old.BucketConfig(**vars(bcfg))
            oldf = jax.jit(lambda p, pT: old.zanlungo_forces_bucketed(
                obcfg, zp4, p, int_prio=True, packed_T=pT))
            a = new(packed_t, packed_T)
            b = oldf(packed_t, packed_T)
            # Compare only live slots: the adaptive kernel leaves
            # garbage in empty sub-blocks' output rows by design.
            live = packed_t[:, zpal.ROW_ID] >= 0
            diff = float(jnp.max(jnp.where(live[:, None],
                                           jnp.abs(a - b), 0.0)))
            print(f"live-slot parity vs pre-adaptive: {diff:.3e}",
                  flush=True)
        measure("adaptive", lambda p, pT: zpal.zanlungo_forces_bucketed(
            bcfg, zp4, p, int_prio=True, packed_T=pT), packed_t, packed_T)
        if old is not None:
            measure("pre-adaptive",
                    lambda p, pT: old.zanlungo_forces_bucketed(
                        obcfg, zp4, p, int_prio=True, packed_T=pT),
                    packed_t, packed_T)


if __name__ == "__main__":
    main()
