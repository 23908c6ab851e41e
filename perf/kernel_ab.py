"""A/B the round-3 pair-math diet: current kernel vs the pre-diet
_pair_ttc/_pair_force (git e200fd8), standalone scan-amortized.

Run `git show e200fd8:rmf_crowdsim_tpu/ops/zanlungo_pallas.py >
/tmp/zp_old.py` first.
"""
import importlib.util
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from perf.step_parts import setup, N  # noqa: E402
import rmf_crowdsim_tpu.ops.zanlungo_pallas as zpal  # noqa: E402
from rmf_crowdsim_tpu.ops.zanlungo_pallas import bucketize, tile_key  # noqa: E402


def load_old():
    spec = importlib.util.spec_from_file_location("zp_old", "/tmp/zp_old.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["zp_old"] = mod
    spec.loader.exec_module(mod)
    return mod


def measure(tag, packed_t, bcfg, zp4):
    def body(cr, _):
        p = cr["p"] * 1.0000001
        o = zpal.zanlungo_forces_bucketed(bcfg, zp4, p)
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

    measure("diet", packed_t, bcfg, zp4)
    old = load_old()
    zpal._pair_ttc = old._pair_ttc
    zpal._pair_force = old._pair_force
    measure("pre-diet", packed_t, bcfg, zp4)


if __name__ == "__main__":
    main()
