"""Profile the PRODUCTION P3M rung stepper (p3mrungs) at the bench
config (N=256^3, mesh=512, unified cb=8): per-phase wall times inside
base_step, rung population, substep counts.

Run on the TPU:  timeout 580 python scripts/prof_rungs.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
_cache = "/root/repo/.jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from concept_tpu.p3mrungs import P3MRungSimulation, rung_substep, pm_kick_rungs
from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import particle_mass

n_part = 256
H0 = 67 * units.km / (units.s * units.Mpc)
bg = Background(H0=H0, Omega_m=0.319)
box = n_part * 2 * units.Mpc
N = n_part**3
G = constants.G_Newton
mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
soft = 0.025 * box / n_part
sim = P3MRungSimulation(n_part, box, mass, G, mesh=2 * n_part, bg=bg,
                        N_rungs=8, softening=soft,
                        softening_kernel="spline")
print(f"unified={sim.unified} ucb={sim.ucb} nc={sim.nc} K0={sim.capacity}",
      flush=True)

if "--clustered" in sys.argv:
    # profile at the evolved clustered state instead of the jittered
    # lattice: load the bench-state cache (final or partial checkpoint)
    import os

    from bench import _BENCH_CACHE
    # the clustered cache is built in the BENCH geometry (box = n_part
    # Mpc, 1 Mpc mean separation) — rebuild the sim to match
    box = n_part * units.Mpc
    mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
    soft = 0.025 * box / n_part
    sim = P3MRungSimulation(n_part, box, mass, G, mesh=2 * n_part, bg=bg,
                            N_rungs=8, softening=soft,
                            softening_kernel="spline")
    key = "p3m_clustered_256_0.12"
    path = os.path.join(_BENCH_CACHE, key + ".npz")
    if not os.path.exists(path):
        path = os.path.join(_BENCH_CACHE, key + ".partial.npz")
    with np.load(path) as z:
        pos_np, mom_np = z["pos"], z["mom"]
    print(f"clustered state from {path}", flush=True)
    comps = [jnp.asarray(np.ascontiguousarray(pos_np[d])) for d in range(3)]
    mom = tuple(jnp.asarray(np.ascontiguousarray(mom_np[d])) for d in range(3))
else:
    rng = np.random.default_rng(0)
    lin = (np.arange(n_part, dtype=np.float32) + 0.5) * (box / n_part)
    comps = []
    for bshape in ((-1, 1, 1), (1, -1, 1), (1, 1, -1)):
        c = np.broadcast_to(lin.reshape(bshape), (n_part,) * 3).reshape(-1)
        comps.append(jnp.asarray(
            np.mod(c + rng.standard_normal(N).astype(np.float32)
                   * (0.3 * box / n_part), box)))
    mom = tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))

t0 = time.perf_counter()
state = sim.init_state(tuple(comps), mom)
_ = float(state.pos[0, 0, 0])
print(f"init_state {time.perf_counter()-t0:.1f}s  K={state.valid.shape[0]}",
      flush=True)

t0h = float(bg.t_of_a_np(0.1))
dt = sim._timestep(0.1, 0.0)
t0 = time.perf_counter()
state = sim.assign_initial_rungs(state, dt)
print(f"assign_initial_rungs {time.perf_counter()-t0:.1f}s "
      f"K_act={list(sim._K_act)}", flush=True)

t0 = time.perf_counter()
state = sim.warm_compiles(state)
_ = float(state.pos[0, 0, 0])
print(f"warm_compiles {time.perf_counter()-t0:.1f}s", flush=True)

# instrumented base steps (per-phase syncs: see P3MRungSimulation.profile)
t = t0h
vmax = 0.0
sim.profile = True
for step in range(4):
    if sim.needs_rebucket:
        tt = time.perf_counter()
        state = sim.rebucket(state)
        _ = float(state.pos[0, 0, 0])
        print(f"  rebucket {time.perf_counter()-tt:.2f}s", flush=True)
    dtn = min(sim._timestep(0.1, vmax / sim.mass), dt)
    sim.stats = {"substeps": 0, "receiver_rows": 0, "full_rows": 0,
                 "max_rung": 0}
    sim.phase_s = {}
    tt = time.perf_counter()
    state, vmax = sim.base_step(state, t, dtn, t)
    _ = float(state.pos[0, 0, 0])
    wall = time.perf_counter() - tt
    s = sim.stats
    print(f"step {step}: {wall:.2f}s  max_rung={s['max_rung']} "
          f"substeps={s['substeps']} recv_rows={s['receiver_rows']} "
          f"full_rows={s['full_rows']} K_act={list(sim._K_act)} "
          f"ups={N/wall:.3g}", flush=True)
    print("  phases: " + "  ".join(
        f"{k}={v:.2f}s" for k, v in sorted(sim.phase_s.items())), flush=True)
    t += dtn
sim.profile = False

# isolate: one full-K sweep (assign) and one PM kick
K = state.valid.shape[0]
dtype = state.pos.dtype
zero = jnp.asarray(0.0, dtype)
zkick = jnp.zeros((sim.NR,), dtype)


def full_sweep(st):
    return rung_substep(
        st, sim.mass, sim.G, zero, zkick, sim.boxsize, sim.nc,
        jnp.asarray(sim.scale, dtype), jnp.asarray(sim.cutoff, dtype),
        jnp.asarray(sim.softening, dtype), K_r=K, interpret=sim.interpret,
        softening_kernel=sim.softening_kernel, NR=sim.NR, assign=False,
        unified=sim.ucb == 4,
    )


st2, _ = full_sweep(state)
_ = float(st2.pos[0, 0, 0])
tt = time.perf_counter()
for _ in range(3):
    st2, _ = full_sweep(st2)
    _ = float(st2.pos[0, 0, 0])
print(f"full-K sweep alone: {(time.perf_counter()-tt)/3:.2f}s", flush=True)


def pm_only(st):
    st, n_over, ms = pm_kick_rungs(
        st, sim.mass, sim.G, jnp.asarray(1e-3, dtype), sim.boxsize,
        sim.mesh, jnp.asarray(sim.scale, dtype), k_pm=sim.k_pm,
        pm_max_overflow=sim.pm_max_overflow, interpret=sim.interpret,
        cells_cb=sim.ucb)
    return st


st3 = pm_only(st2)
_ = float(st3.pos[0, 0, 0])
tt = time.perf_counter()
for _ in range(3):
    st3 = pm_only(st3)
    _ = float(st3.pos[0, 0, 0])
print(f"PM kick alone: {(time.perf_counter()-tt)/3:.2f}s", flush=True)
