import sys; sys.path.insert(0, "/root/repo")
import os, time, json
import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from concept_tpu.bucketsim import BucketSimulation

n = 512
box = 512.0
N = n**3
# lattice + jitter ICs (realistic simulation start; near-uniform counts)
lin = (np.arange(n, dtype=np.float32) + 0.5) * (box / n)
rng = np.random.default_rng(0)


def make_pos():
    px = np.broadcast_to(lin[:, None, None], (n, n, n)).reshape(-1)
    py = np.broadcast_to(lin[None, :, None], (n, n, n)).reshape(-1)
    pz = np.broadcast_to(lin[None, None, :], (n, n, n)).reshape(-1)
    pos = np.stack([px, py, pz], axis=1)
    pos += rng.uniform(-0.3, 0.3, pos.shape).astype(np.float32) * (box / n)
    return np.mod(pos, box).astype(np.float32)


pos_np = make_pos()
pos = tuple(jnp.asarray(np.ascontiguousarray(pos_np[:, d])) for d in range(3))
mom = tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))
del pos_np
sim = BucketSimulation(n, box, 2.0, 1.0, capacity=8)
t0 = time.time()
state = sim.init_state(pos, mom)
nv = int(jnp.sum(state.valid))
print("bucketize done", time.time() - t0, "valid", nv, "of", N, flush=True)
del pos, mom
int1, int2 = 1e-3, 1e-3
t0 = time.time()
state, ns = sim.step(state, int1, int2)
_ = float(state.pos[0, 0, 0])
print("warmup step (incl compile):", time.time() - t0, "stragglers", int(ns), flush=True)
n_iter = 5
t0 = time.time()
for _ in range(n_iter):
    state, ns = sim.step(state, int1, int2)
_ = float(state.pos[0, 0, 0])
dt = (time.time() - t0) / n_iter
print(json.dumps({"n": n, "step_s": dt, "updates_per_s": N / dt}), flush=True)
