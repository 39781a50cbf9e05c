import sys; sys.path.insert(0, "/root/repo")
import os, time
import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial
from concept_tpu.bucketsim import BucketSimulation, bucket_pm_step, BucketState
from concept_tpu.grid.pallas_pm import deposit_pallas_kc, gather_pallas_kc
from concept_tpu.grid.bucketed import B, LDIM, _block_count
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
state0 = sim.init_state(pos, mom)

def sync(st):
    return float(st.pos[0, 0, 0])

int1 = jnp.asarray(1e-3, jnp.float32)
int2 = jnp.asarray(1e-3, jnp.float32)

def time_step(ms, label):
    st = BucketState(state0.pos.copy(), state0.mom.copy(), state0.valid.copy())
    st, _ = bucket_pm_step(st, 2.0, box, 1.0, int1, int2, n, ms, False)
    sync(st)
    t0 = time.perf_counter()
    for _ in range(5):
        st, _ = bucket_pm_step(st, 2.0, box, 1.0, int1, int2, n, ms, False)
    sync(st)
    dt = (time.perf_counter() - t0) / 5
    print(f"{label}: {dt*1e3:.1f} ms ({N/dt/1e6:.1f}M u/s)", flush=True)

time_step(8, "step max_straggler=8")
time_step(1024, "step max_straggler=1024")
time_step(N // 64, "step max_straggler=N/64 (262144)")

# stripped step: no straggler handling at all
nb = _block_count(n)
Cp = state0.valid.shape[1]
h = box / n

@partial(jax.jit, donate_argnums=0)
def step_nostrag(state):
    cidx = jax.lax.broadcasted_iota(jnp.int32, (K, Cp), 1)
    origins = ((cidx // (nb * nb)) * B, ((cidx // nb) % nb) * B, (cidx % nb) * B)
    fs, lrels = [], []
    for d in range(3):
        u = state.pos[d] / h - 0.5
        anchor = jnp.floor(u).astype(jnp.int32)
        fs.append(u - anchor)
        lrels.append(anchor - origins[d] + 1)
    in_halo = ((lrels[0] >= 0) & (lrels[0] <= 2) & (lrels[1] >= 0) & (lrels[1] <= 2)
               & (lrels[2] >= 0) & (lrels[2] <= 2))
    handled = state.valid & in_halo
    lidx = (jnp.clip(lrels[0], 0, 2) * LDIM + jnp.clip(lrels[1], 0, 2)) * LDIM + jnp.clip(lrels[2], 0, 2)
    q = jnp.where(handled, 2.0, 0.0)
    grid = deposit_pallas_kc(lidx, fs[0], fs[1], fs[2], q, n)
    slab = rfft3(grid / h**3)
    phi = gravity_potential_slab(slab, n, box, 1.0, deconv_order=4)
    hmask = handled.astype(jnp.float32)
    vmask = state.valid.astype(jnp.float32)
    grads = tuple(irfft3(fourier.fourier_diff(phi, n, box, d), n) for d in range(3))
    fds = gather_pallas_kc(lidx, fs[0], fs[1], fs[2], hmask, grads, n)
    new_pos, new_mom = [], []
    for d in range(3):
        md = state.mom[d] + (-2.0 * int1) * fds[d] * vmask
        pd = jnp.mod(state.pos[d] + md * (int2 / 2.0) * vmask, box)
        new_mom.append(md)
        new_pos.append(pd)
    return BucketState(jnp.stack(new_pos), jnp.stack(new_mom), state.valid)

st = BucketState(state0.pos.copy(), state0.mom.copy(), state0.valid.copy())
st = step_nostrag(st)
sync(st)
t0 = time.perf_counter()
for _ in range(5):
    st = step_nostrag(st)
sync(st)
dt = (time.perf_counter() - t0) / 5
print(f"stripped step (no straggler): {dt*1e3:.1f} ms ({N/dt/1e6:.1f}M u/s)", flush=True)
