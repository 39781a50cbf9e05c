"""Profile P3M pipeline components at the bench config (N=256^3, mesh 512).

Timings use value-readback syncs (axon gotcha: block_until_ready lies).
Run on the TPU:  timeout 580 python scripts/prof_p3m.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial

from concept_tpu.forces import pm as pm_force
from concept_tpu.forces.shortrange import (
    bucketize, cell_grid_shape, auto_capacity, shortrange_momentum_updates,
)
from concept_tpu.forces.pallas_shortrange import sweep_pallas

n_part = 256
box = 512.0
mesh = 2 * n_part
N = n_part**3
scale = 1.25 * box / mesh
cutoff = 4.5 * scale
nc = cell_grid_shape(box, cutoff)
K = auto_capacity(N, nc)
print(f"nc={nc} K={K} C={nc**3}", flush=True)

rng = np.random.default_rng(0)
lin = (np.arange(n_part, dtype=np.float32) + 0.5) * (box / n_part)
pos = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
pos += rng.standard_normal(pos.shape).astype(np.float32) * (0.3 * box / n_part)
pos = jnp.asarray(np.mod(pos, box))


def timeit(name, fn, sync, iters=3):
    out = fn()
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        _ = sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.1f} ms", flush=True)
    return out


# 1. SR bucketize
bjit = jax.jit(partial(bucketize, n_cells=nc, capacity=K))
b = timeit("SR bucketize (sort+scatter)", lambda: bjit(pos, box),
           lambda o: float(o["hx"][0, 0]))

# 2. Pallas sweep on the bucket arrays
dtype = jnp.float32
sw = jax.jit(lambda hx, hy, hz, v: sweep_pallas(
    hx, hy, hz, v, nc, jnp.asarray(box, dtype), jnp.asarray(scale, dtype),
    jnp.asarray(cutoff, dtype), jnp.asarray(0.0, dtype), interpret=False))
acc = timeit("Pallas SR sweep", lambda: sw(b["hx"], b["hy"], b["hz"], b["valid"]),
             lambda o: float(o[0, 0, 0]))

# 3. write-back: slot gather + unsort scatter
C = nc**3


@jax.jit
def writeback(acc, b):
    slot = jnp.where(b["rank"] < K, b["rank"] * C + b["cell"], 0)
    accf = acc.reshape(3, K * C)
    dm = accf[:, slot].T
    dm = jnp.where((b["rank"] < K)[:, None], dm, 0.0)
    return jnp.zeros((N, 3), dtype).at[b["order"]].set(dm)


timeit("write-back (slot gather + unsort)", lambda: writeback(acc, b),
       lambda o: float(o[0, 0]))

# 4. full SR update (bucketize+sweep+straggler+writeback)
timeit("full shortrange_momentum_updates", lambda: shortrange_momentum_updates(
    pos, 2.0, box, scale, cutoff, 1e-3, n_cells=nc, capacity=K, G=1.0,
    max_overflow=max(2048, N // 1024)),
    lambda o: float(o[0, 0]))

# 5. PM long-range (pallas deposit/gather, internal bucketize)
timeit("PM long-range (pallas path)", lambda: pm_force.pm_gravity_momentum_updates(
    [pos], [2.0], mesh, box, 1.0, kick_integral=1e-3, order=2,
    longrange_scale=scale, deposit_method="pallas")[0],
    lambda o: float(o[0, 0]))

# 6. PM long-range via plain scatter deposit
timeit("PM long-range (scatter path)", lambda: pm_force.pm_gravity_momentum_updates(
    [pos], [2.0], mesh, box, 1.0, kick_integral=1e-3, order=2,
    longrange_scale=scale, deposit_method="scatter")[0],
    lambda o: float(o[0, 0]))

# 7. raw lax.sort cost (the shared-sort candidate): 7 operands, N keys
iota = jnp.arange(N, dtype=jnp.int32)


@jax.jit
def rawsort(pos):
    cw = box / nc
    ijk = jnp.clip((pos / cw).astype(jnp.int32), 0, nc - 1)
    cell = (ijk[:, 0] * nc + ijk[:, 1]) * nc + ijk[:, 2]
    out = jax.lax.sort([cell, pos[:, 0], pos[:, 1], pos[:, 2],
                        iota.astype(jnp.float32), iota.astype(jnp.float32),
                        iota.astype(jnp.float32), iota], num_keys=1)
    return out[1]


timeit("raw lax.sort 8 operands", lambda: rawsort(pos), lambda o: float(o[0]))
