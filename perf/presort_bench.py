"""1M fused-step timing: presort on/off."""
import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
import bench

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
for presort in (False, True):
    import bench as b
    orig = b._bench_config
    def patched(n_agents, dtype="float32", backend="grid_pallas",
                _orig=orig, _ps=presort):
        return dataclasses.replace(_orig(n_agents, dtype, backend),
                                   presort=_ps)
    b._bench_config = patched
    t0 = time.time()
    sps, p50 = b.time_steps(n, n_steps=20, reps=3)
    b._bench_config = orig
    print(f"presort={presort}: {sps:.2f} steps/s  p50 {p50:.2f} ms "
          f"(total {time.time()-t0:.0f}s incl compile)", flush=True)
