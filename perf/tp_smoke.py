import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from rmf_crowdsim_tpu.ops.transpose_pallas import plane_to_rowmajor
print("devices:", jax.devices())
for R in (1024, 131072, 1843200):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, R)), jnp.float32)
    fn = jax.jit(lambda a: plane_to_rowmajor(a))
    y = fn(x)
    _ = float(y[0, 0])
    ok = np.array_equal(np.asarray(y), np.asarray(x).T)
    t0 = time.perf_counter()
    for _ in range(20):
        y = fn(x)
    _ = float(y[0, 0])
    dt = (time.perf_counter() - t0) / 20
    print(f"R={R}: exact={ok} {dt*1e3:.3f} ms/call", flush=True)
