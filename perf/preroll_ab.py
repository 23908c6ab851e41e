"""A/B the pre-rolled-strip-copies kernel (round 4) vs the per-sub-block
dynamic-roll kernel (round 3), standalone scan-amortized, int_prio like
the production 1M bench.  Snapshot the old module first:

    git show <old-rev>:rmf_crowdsim_tpu/ops/zanlungo_pallas.py \
        > /tmp/zp_old.py
"""
import importlib.util
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup  # noqa: E402
import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import bucketize, tile_key  # noqa: E402


def measure(tag, fn, packed_t, bcfg, zp4):
    def body(cr, _):
        p = cr["p"] * 1.0000001
        o = fn(bcfg, zp4, p, int_prio=True)
        return {"p": p + o[0, 0] * 1e-30}, None

    def timed(k):
        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        t0 = time.time()
        out = f({"p": packed_t})
        _ = float(out["p"][0, 0])
        comp = time.time() - t0
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = f({"p": packed_t})
            _ = float(out["p"][0, 0])
            best = min(best, time.perf_counter() - t0)
        return best, comp

    t1, c1 = timed(1)
    t21, c21 = timed(21)
    print(f"{tag:12s}: {(t21 - t1) / 20 * 1e3:7.3f} ms/op  "
          f"[compiles {c1:.0f}/{c21:.0f}s]", flush=True)


def main():
    cfg, bcfg, carry, zp, zp4 = setup()
    key = tile_key(bcfg, carry["pos"], carry["alive"])
    order = jnp.argsort(key, stable=True)
    packed_t, _pT, bpos, occ, dropped = jax.jit(
        lambda p, v: bucketize(
            bcfg, p, v, v, v, carry["prio"][order], carry["eye"][order],
            v, carry["alive"][order], use_pack_kernel=True, presorted=True)
    )(carry["pos"][order], carry["vel"][order])
    print(f"occ={int(occ)} dropped={int(dropped)}", flush=True)

    # Output parity on the real chip first (compiled, not interpret).
    new = jax.jit(lambda p: zpal.zanlungo_forces_bucketed(
        bcfg, zp4, p, int_prio=True))(packed_t)
    # Load the snapshot INSIDE the package namespace so its relative
    # imports (.compact, .pack_pallas) resolve.
    spec = importlib.util.spec_from_file_location(
        "rmf_crowdsim_tpu.ops.zp_old_ab", "/tmp/zp_old.py"
    )
    old = importlib.util.module_from_spec(spec)
    sys.modules["rmf_crowdsim_tpu.ops.zp_old_ab"] = old
    spec.loader.exec_module(old)
    obcfg = old.BucketConfig(**vars(bcfg))
    oldv = jax.jit(lambda p: old.zanlungo_forces_bucketed(
        obcfg, zp4, p, int_prio=True))(packed_t)
    import numpy as np
    diff = float(jnp.max(jnp.abs(new - oldv)))
    nf = np.asarray(jnp.isfinite(new)).all()
    print(f"compiled parity: max|new-old|={diff:.3e} finite={nf}",
          flush=True)

    measure("preroll", zpal.zanlungo_forces_bucketed, packed_t, bcfg, zp4)
    measure(
        "dynroll",
        lambda b, z, p, **kw: old.zanlungo_forces_bucketed(obcfg, z, p, **kw),
        packed_t, bcfg, zp4,
    )


if __name__ == "__main__":
    main()
