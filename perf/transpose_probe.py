"""Probe: (a) does Mosaic lower an in-kernel [8, Q] -> [Q, 8] transpose,
and at what cost; (b) scan-amortized cost of refreshing K columns of a
[slots, 16] row-major plane from [slots] vectors (the resident-mode
query-plane update), vs rebuilding via jnp.stack (full transpose).

Motivation: resident mode (DESIGN_NOTES round-4) keeps state in slot
order so the force kernel needs NO pack/unbucket; the only question is
how queries get their fresh per-step features in SUBLANE orientation.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SLOTS = 1_835_520  # the 1M bench plane


def timed_scan(tag, body, carry0):
    def run(k):
        f = jax.jit(lambda c: jax.lax.scan(
            lambda cr, _: (body(cr), None), c, None, length=k)[0])
        t0 = time.time()
        out = f(carry0)
        s = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        comp = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(carry0)
            s = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best, comp

    t1, c1 = run(1)
    t21, c21 = run(21)
    print(f"{tag:28s}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op "
          f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


def probe_kernel_transpose():
    """One program: read [8, 128] block, transpose, write [128, 8]."""
    def kernel(x_ref, o_ref):
        x = x_ref[...]                      # [8, 128]
        o_ref[...] = x.T                    # [128, 8]

    x = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32),
        )(x)
        ok = bool(jnp.all(out == x.T))
        print(f"in-kernel [8,128].T: lowers, correct={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"in-kernel [8,128].T FAILED: {str(e)[:300]}", flush=True)

    def kernel2(x_ref, o_ref):
        x = x_ref[:, 0:64]                  # [8, 64] slice
        o_ref[...] = x.T                    # [64, 8]

    try:
        out = pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((64, 8), jnp.float32),
        )(x)
        ok = bool(jnp.all(out == x[:, :64].T))
        print(f"in-kernel [8,64].T:  lowers, correct={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"in-kernel [8,64].T FAILED: {str(e)[:300]}", flush=True)


def probe_column_updates():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((SLOTS, 16)), jnp.float32)
    cols = [jnp.asarray(rng.random(SLOTS), jnp.float32) for _ in range(8)]

    def upd8(cr):
        p = cr["p"]
        for j, c in enumerate(cr["cols"]):
            p = p.at[:, j].set(c * 1.0000001)
        return {"p": p, "cols": cr["cols"]}

    def upd4(cr):
        p = cr["p"]
        for j, c in enumerate(cr["cols"][:4]):
            p = p.at[:, j].set(c * 1.0000001)
        return {"p": p, "cols": cr["cols"]}

    def rebuild(cr):
        cs = [c * 1.0000001 for c in cr["cols"]]
        p = jnp.stack(cs + cs, axis=-1)  # 16 cols from [slots] vectors
        return {"p": p, "cols": cr["cols"]}

    def rows4_T(cr):
        # the transposed-plane analog: update 4 ROWS of [8, slots]
        t = cr["t"]
        for j, c in enumerate(cr["cols"][:4]):
            t = t.at[j, :].set(c * 1.0000001)
        return {"t": t, "cols": cr["cols"]}

    timed_scan("col-update x8 [slots,16]", upd8,
               {"p": plane, "cols": cols})
    timed_scan("col-update x4 [slots,16]", upd4,
               {"p": plane, "cols": cols})
    timed_scan("rebuild stack [slots,16]", rebuild,
               {"p": plane, "cols": cols})
    timed_scan("row-update x4 [8,slots]", rows4_T,
               {"t": jnp.asarray(rng.random((8, SLOTS)), jnp.float32),
                "cols": cols})


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    probe_kernel_transpose()
    probe_column_updates()
