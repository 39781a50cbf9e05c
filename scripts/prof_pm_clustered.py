"""Profile the sustained PM bench segment: where does the clustered 256^3
step spend its time?  Run on TPU: timeout 580 python scripts/prof_pm_clustered.py
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
from concept_tpu.units import units
from concept_tpu.cosmology.background import Background

n_grid = 256
N = n_grid**3
H0 = 67 * units.km / (units.s * units.Mpc)
bg = Background(H0=H0, Omega_m=0.319)
box = n_grid * units.Mpc
from concept_tpu.components import particle_mass
from concept_tpu.units import constants
mass = particle_mass(0.319, bg.rho_crit_of(constants.G_Newton), box, N)
sim = BucketSimulation(n_grid, box, mass, constants.G_Newton, bg=bg,
                       capacity=16)

with np.load("/root/repo/.bench_cache/pm_clustered_256_0.12.npz") as z:
    pos, mom = z["pos"], z["mom"]
state = sim.init_state(
    tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
    tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
)
print(f"settled capacity K={sim.capacity} valid={int(jnp.sum(state.valid))}",
      flush=True)

t_now = float(bg.t_of_a_np(0.12))
int1 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-1)",))["a**(-1)"]
int2 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-2)",))["a**(-2)"]

# warm
state = sim.maybe_rebucket(state)
print(f"after rebucket: K={sim.capacity}", flush=True)
state, ns = sim.step(state, int1, int2)
_ = float(state.pos[0, 0, 0])
print(f"stragglers after 1 step: {int(ns)}", flush=True)

# individual steps
for i in range(6):
    t0 = time.perf_counter()
    state, ns = sim.step(state, int1, int2)
    _ = float(state.pos[0, 0, 0])
    print(f"step {i}: {time.perf_counter()-t0:.3f}s stragglers={int(ns)} "
          f"ups={N/(time.perf_counter()-t0):.3g}", flush=True)

t0 = time.perf_counter()
state = sim.maybe_rebucket(state)
_ = float(state.pos[0, 0, 0])
print(f"maybe_rebucket: {time.perf_counter()-t0:.3f}s K={sim.capacity}",
      flush=True)

t0 = time.perf_counter()
state = sim.maybe_rebucket(state)
_ = float(state.pos[0, 0, 0])
print(f"maybe_rebucket again (warm): {time.perf_counter()-t0:.3f}s "
      f"K={sim.capacity}", flush=True)
