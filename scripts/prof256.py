import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial
from concept_tpu.bucketsim import BucketSimulation, bucket_pm_step
from concept_tpu.grid.pallas_pm import deposit_pallas_kc, gather_pallas_kc, LANES
from concept_tpu.grid.bucketed import _extract_local_T, _assemble_global_T, _block_count, L, LDIM
from concept_tpu.grid.fft import rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.forces.pm import gravity_potential_slab

n = 256
box = 512.0
N = n**3
K = 16
rng = np.random.default_rng(0)
lin = (np.arange(n, dtype=np.float32) + 0.5) * (box / n)
px = np.broadcast_to(lin[:, None, None], (n, n, n)).reshape(-1).copy()
py = np.broadcast_to(lin[None, :, None], (n, n, n)).reshape(-1).copy()
pz = np.broadcast_to(lin[None, None, :], (n, n, n)).reshape(-1).copy()
jit = 0.3 * (box / n)
pos = tuple(jnp.asarray(np.mod(c + rng.uniform(-jit, jit, N).astype(np.float32), box)) for c in (px, py, pz))
mom = tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))
sim = BucketSimulation(n, box, 2.0, 1.0, capacity=K)
state = sim.init_state(pos, mom)
print("valid", int(jnp.sum(state.valid)), "of", N, flush=True)

nb = _block_count(n)
C = nb**3
Cp = state.valid.shape[1]
h = box / n
dtype = jnp.float32

# precompute kernel inputs once (outside timing)
@jax.jit
def prep(state):
    cidx = jax.lax.broadcasted_iota(jnp.int32, (K, Cp), 1)
    origins = ((cidx // (nb * nb)) * B_, ((cidx // nb) % nb) * B_, (cidx % nb) * B_)
    fs, lrels = [], []
    for d in range(3):
        u = state.pos[d] / h - 0.5
        anchor = jnp.floor(u).astype(jnp.int32)
        fs.append((u - anchor).astype(dtype))
        lrels.append(anchor - origins[d] + 1)
    in_halo = ((lrels[0] >= 0) & (lrels[0] <= 2) & (lrels[1] >= 0) & (lrels[1] <= 2)
               & (lrels[2] >= 0) & (lrels[2] <= 2))
    handled = state.valid & in_halo
    lidx = (jnp.clip(lrels[0], 0, 2) * LDIM + jnp.clip(lrels[1], 0, 2)) * LDIM + jnp.clip(lrels[2], 0, 2)
    q = jnp.where(handled, 2.0, 0.0).astype(dtype)
    return lidx, fs[0], fs[1], fs[2], q, handled.astype(dtype)

from concept_tpu.grid.bucketed import B as B_

def sync(x):
    return float(jnp.real(x.reshape(-1)[0]))

def tick(fn, *a, label="", iters=5):
    out = fn(*a)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return out

lidx, fx, fy, fz, q, hmask = tick(prep, state, label="prep (fields from pos)")

dep = jax.jit(lambda *a: deposit_pallas_kc(*a, n))
grid = tick(dep, lidx, fx, fy, fz, q, label="deposit_pallas_kc (kernel+assemble)")

ext = jax.jit(lambda g: _extract_local_T(g, nb, n, pad_to=Cp))
mini = tick(ext, grid, label="extract_local_T (one grid)")

asmb = jax.jit(lambda m: _assemble_global_T(m, nb, n))
_ = tick(asmb, mini, label="assemble_global_T")

fftf = jax.jit(lambda g: gravity_potential_slab(rfft3(g / h**3), n, box, 1.0, deconv_order=4))
phi = tick(fftf, grid, label="rfft3+poisson")

gradf = jax.jit(lambda p: tuple(irfft3(fourier.fourier_diff(p, n, box, d), n) for d in range(3)))
grads = tick(gradf, phi, label="3x irfft3+diff")

gat1 = jax.jit(lambda *a: gather_pallas_kc(a[0], a[1], a[2], a[3], a[4], a[5], n))
_ = tick(gat1, lidx, fx, fy, fz, hmask, grads[0], label="gather D=1")

gat3 = jax.jit(lambda *a: gather_pallas_kc(a[0], a[1], a[2], a[3], a[4], (a[5], a[6], a[7]), n))
_ = tick(gat3, lidx, fx, fy, fz, hmask, grads[0], grads[1], grads[2], label="gather D=3")

# full step
int1 = jnp.asarray(1e-3); int2 = jnp.asarray(1e-3)
def step(st):
    return bucket_pm_step(st, 2.0, box, 1.0, int1, int2, n, max(1024, N // 64), False)
st, ns = step(state)
sync(st.pos)
t0 = time.perf_counter()
for _ in range(5):
    st, ns = step(st)
sync(st.pos)
print(f"full step: {(time.perf_counter()-t0)/5*1e3:.1f} ms -> {N/((time.perf_counter()-t0)/5)/1e6:.2f}M updates/s", flush=True)
