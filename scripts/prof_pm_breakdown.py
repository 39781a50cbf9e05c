"""Break down the clustered PM step cost at 256^3: kernels, FFTs,
straggler machinery, elementwise — at a given capacity cap.

Run on TPU:  timeout 900 python scripts/prof_pm_breakdown.py [cap]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from concept_tpu.bucketsim import BucketSimulation
from concept_tpu.grid.pallas_pm import deposit_pallas_pos, gather_pallas_pos
from concept_tpu.grid.fft import rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.forces.pm import gravity_potential_slab
from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import particle_mass

cap = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n = 256
N = n**3
H0 = 67 * units.km / (units.s * units.Mpc)
bg = Background(H0=H0, Omega_m=0.319)
box = n * units.Mpc
mass = particle_mass(0.319, bg.rho_crit_of(constants.G_Newton), box, N)

with np.load("/root/repo/.bench_cache/pm_clustered_256_0.12.npz") as z:
    pos, mom = z["pos"], z["mom"]

sim = BucketSimulation(n, box, mass, constants.G_Newton, bg=bg,
                       capacity=min(16, cap), capacity_max=cap)
state = sim.init_state(
    tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
    tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
)
state = sim.maybe_rebucket(state)
print(f"cap {cap}: K={sim.capacity} spill={sim._n_spilled} "
      f"budget={sim._straggler_budget()}", flush=True)


def timeit(name, fn, sync, reps=3):
    r = fn()
    _ = sync(r)
    t0 = time.perf_counter()
    for _i in range(reps):
        r = fn()
    _ = sync(r)
    print(f"  {name}: {(time.perf_counter()-t0)/reps*1e3:.0f} ms", flush=True)
    return r


w = state.valid.astype(jnp.float32) * sim.mass
grid = timeit("deposit", lambda: deposit_pallas_pos(
    state.pos[0], state.pos[1], state.pos[2], w, n, box, nchunks=1),
    lambda g: float(g[0, 0, 0]))

slab = timeit("rfft3", lambda: rfft3(grid), lambda s: float(jnp.real(s[0, 0, 0])))


@jax.jit
def _phi(slab):
    return gravity_potential_slab(slab, n, box, sim.G, deconv_order=4)


@jax.jit
def _grads(phi):
    return tuple(
        irfft3(fourier.fourier_diff(phi, n, box, d), n) for d in range(3)
    )


phi = _phi(slab)
grads = timeit("3x(diff+irfft3)", lambda: _grads(phi),
               lambda g: float(g[0][0, 0, 0]))

fd = timeit("gather3", lambda: gather_pallas_pos(
    state.pos[0], state.pos[1], state.pos[2], w, grads, n, box, nchunks=1),
    lambda f: float(f[0][0, 0]))

# straggler pieces
K, Cp = state.valid.shape
M = K * Cp
S = sim._straggler_budget()
flat = state.valid.reshape(-1)


@jax.jit
def nz(v):
    return jnp.nonzero(v, size=S, fill_value=M)[0]


timeit(f"nonzero(M={M/1e6:.0f}M,size={S})", lambda: nz(flat),
       lambda x: int(x[0]))

t_now = float(bg.t_of_a_np(0.12))
int1 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-1)",))["a**(-1)"]
int2 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-2)",))["a**(-2)"]
state, ns = sim.step(state, int1, int2)
_ = float(state.pos[0, 0, 0])
t0 = time.perf_counter()
for _ in range(3):
    state, ns = sim.step(state, int1, int2)
_ = float(state.pos[0, 0, 0])
print(f"  full step: {(time.perf_counter()-t0)/3*1e3:.0f} ms "
      f"(stragglers={int(ns)})", flush=True)
