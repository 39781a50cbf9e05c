"""Measure the clustered-PM capacity/spill tradeoff: step + rebucket
wall time at several capacity caps on the cached a=0.12 256^3 state.

Run on TPU:  timeout 580 python scripts/prof_pm_capacity.py [caps...]
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
from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import particle_mass

caps = [int(a) for a in sys.argv[1:]] or [16, 24, 32, 64]

n_grid = 256
N = n_grid**3
H0 = 67 * units.km / (units.s * units.Mpc)
bg = Background(H0=H0, Omega_m=0.319)
box = n_grid * units.Mpc
mass = particle_mass(0.319, bg.rho_crit_of(constants.G_Newton), box, N)

with np.load("/root/repo/.bench_cache/pm_clustered_256_0.12.npz") as z:
    pos, mom = z["pos"], z["mom"]

t_now = float(bg.t_of_a_np(0.12))
int1 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-1)",))["a**(-1)"]
int2 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-2)",))["a**(-2)"]

for cap in caps:
    sim = BucketSimulation(n_grid, box, mass, constants.G_Newton, bg=bg,
                           capacity=min(16, cap), capacity_max=cap)
    state = sim.init_state(
        tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
        tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
    )
    state = sim.maybe_rebucket(state)
    print(f"cap {cap}: K={sim.capacity} spill={sim._n_spilled} "
          f"budget={sim._straggler_budget()}", flush=True)
    state, ns = sim.step(state, int1, int2)   # warm step compile
    _ = float(state.pos[0, 0, 0])
    t0 = time.perf_counter()
    nst = 0
    for _ in range(4):
        state, ns = sim.step(state, int1, int2)
        nst = int(ns)
    _ = float(state.pos[0, 0, 0])
    dt = (time.perf_counter() - t0) / 4
    t0 = time.perf_counter()
    state = sim.maybe_rebucket(state)
    _ = float(state.pos[0, 0, 0])
    drb = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = sim.maybe_rebucket(state)
    _ = float(state.pos[0, 0, 0])
    drb2 = time.perf_counter() - t0
    amort = dt + drb2 / 16
    print(f"cap {cap}: step {dt:.3f}s stragglers={nst} rebucket {drb:.2f}s "
          f"(warm {drb2:.2f}s) amortized(16) {amort:.3f}s "
          f"ups={N/amort:.3g}", flush=True)
    del state, sim
