"""Microbenchmark: the full-K short-range pair sweep alone at the bench
config (256^3, mesh 512, unified cb=8: n=64 pencils, K=88 slots).

Run on TPU:  timeout 580 python scripts/prof_sweep.py [K]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from concept_tpu.forces.pallas_shortrange import sweep_pallas_pair

n = 64
K = int(sys.argv[1]) if len(sys.argv) > 1 else 88
C = n**3
box = 512.0
mesh = 2 * 256
scale = 1.25 * box / mesh
cutoff = 4.5 * scale
soft = 0.025 * box / 256

rng = np.random.default_rng(0)
# ~73% occupancy like the bench state (64/88)
valid = jnp.asarray(rng.uniform(size=(K, C)) < 64.0 / K)
cw = box / n
base = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"),
                0).reshape(3, C) * cw
pos = [jnp.asarray((base[d][None, :]
                    + rng.uniform(0, cw, (K, C))).astype(np.float32))
       for d in range(3)]

for kern in ("spline", "plummer"):
    acc = sweep_pallas_pair(pos[0], pos[1], pos[2], valid,
                            pos[0], pos[1], pos[2], valid,
                            n, jnp.float32(box), jnp.float32(scale),
                            jnp.float32(cutoff), jnp.float32(soft),
                            kernel=kern)
    _ = float(acc[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        acc = sweep_pallas_pair(pos[0], pos[1], pos[2], valid,
                                pos[0], pos[1], pos[2], valid,
                                n, jnp.float32(box), jnp.float32(scale),
                                jnp.float32(cutoff), jnp.float32(soft),
                                kernel=kern)
        _ = float(acc[0, 0, 0])
    dt = (time.perf_counter() - t0) / 3
    pairs = C * K * K * 27
    print(f"{kern}: {dt:.3f}s  {pairs/dt:.3g} pair-slots/s  K={K}",
          flush=True)
