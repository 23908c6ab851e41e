import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
t0 = time.time()
d = jax.devices()
print("devices:", d, "in", time.time() - t0, "s", flush=True)
x = jnp.ones((1024, 1024))
y = (x @ x)
print("matmul ok:", float(y[0, 0]), "in", time.time() - t0, "s", flush=True)
