import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

x = jnp.ones((64 * 1024 * 1024,), jnp.float32)  # 256 MB
f = jax.jit(lambda a: a + 1.0)
y = f(x); _ = float(y[0])
best = 1e9
for _ in range(5):
    t0 = time.perf_counter(); y = f(x); _ = float(y[0])
    best = min(best, time.perf_counter() - t0)
print(f"elementwise 256MB in + 256MB out: {best*1e3:.2f} ms -> "
      f"{0.5/best:.0f} GB/s", flush=True)

# [slots,16] -> transpose-free stream: sum over lanes
p = jnp.ones((1_835_520, 16), jnp.float32)  # 117 MB
g = jax.jit(lambda a: jnp.sum(a, axis=1))
z = g(p); _ = float(z[0])
best = 1e9
for _ in range(5):
    t0 = time.perf_counter(); z = g(p); _ = float(z[0])
    best = min(best, time.perf_counter() - t0)
print(f"[1.8M,16] row-sum (117MB read): {best*1e3:.2f} ms -> "
      f"{0.117/best:.0f} GB/s", flush=True)
