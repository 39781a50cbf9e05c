"""Build the clustered bench states (.bench_cache/*.npz) RESUMABLY.

bench.py's clustered extras need a 2LPT state evolved to z ≈ 7; building
it cold takes ~30-50 min on the chip, and the round-4/5 attempts showed
a single monolithic evolve() loses everything to an outer timeout.  This
script steps the same evolution with a progress print per step and a
(pos, mom, t) checkpoint every CHECKPOINT_EVERY base steps — a killed
run resumes from the last checkpoint instead of starting over.

Run on the TPU (repeat until it prints DONE):
    timeout 580 python scripts/prepare_clustered.py p3m
    timeout 580 python scripts/prepare_clustered.py pm
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import _BENCH_CACHE

CHECKPOINT_EVERY = 10


def _ckpt_path(key):
    return os.path.join(_BENCH_CACHE, key + ".partial.npz")


def _final_path(key):
    return os.path.join(_BENCH_CACHE, key + ".npz")


def _save(path, pos, mom, t):
    os.makedirs(_BENCH_CACHE, exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, pos=pos, mom=mom, t=np.float64(t))
    os.replace(tmp, path)


def _build_2lpt(lin, box, N, mass, a0=0.02, seed=0):
    from concept_tpu.components import ComponentSpec
    from concept_tpu.ic import realize_particles

    spec = ComponentSpec(name="m", species="matter", N=N, mass=mass)
    st0 = realize_particles(lin, spec, box, a0, seed=seed, lpt_order=2)
    return np.asarray(st0.pos), np.asarray(st0.mom)  # (N, 3)


def _cosmo(n_part):
    from concept_tpu.units import units, constants
    from concept_tpu.cosmology.background import Background
    from concept_tpu.cosmology.primordial import PrimordialSpectrum
    from concept_tpu.cosmology.linear import LinearCosmology
    from concept_tpu.components import particle_mass

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    lin = LinearCosmology(
        bg, PrimordialSpectrum(A_s=2.1e-9, n_s=0.96), Omega_b=0.049,
        Omega_cdm=0.27, light_speed=constants.light_speed, Mpc=units.Mpc,
    )
    box = n_part * units.Mpc
    N = n_part**3
    G = constants.G_Newton
    mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
    return bg, lin, box, N, G, mass


def prepare_p3m(n_part=256, a_end=0.12):
    from concept_tpu.p3mrungs import P3MRungSimulation, extract_flat

    key = f"p3m_clustered_{n_part}_{a_end}"
    if os.path.exists(_final_path(key)):
        print(f"DONE (already built): {_final_path(key)}", flush=True)
        return
    bg, lin, box, N, G, mass = _cosmo(n_part)
    sim = P3MRungSimulation(n_part, box, mass, G, mesh=2 * n_part, bg=bg,
                            N_rungs=8, softening=0.025 * box / n_part,
                            softening_kernel="spline")
    ck = _ckpt_path(key)
    if os.path.exists(ck):
        with np.load(ck) as z:
            pos, mom, t = z["pos"], z["mom"], float(z["t"])
        print(f"resume from t={t:.4g} a={float(bg.a_of_t_np(t)):.4f}",
              flush=True)
    else:
        p0, m0 = _build_2lpt(lin, box, N, mass)
        pos, mom = p0.T.copy(), m0.T.copy()  # (3, N)
        t = float(bg.t_of_a_np(0.02))
        _save(ck, pos, mom, t)
        print("2LPT ICs built + checkpointed", flush=True)
    state = sim.init_state(
        tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
        tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
    )
    t1 = float(bg.t_of_a_np(a_end))
    a = float(bg.a_of_t_np(t))
    state = sim.assign_initial_rungs(state, sim._timestep(a, 0.0))
    vmax, steps, t_mom = 0.0, 0, t
    while t < t1 - 1e-12 * abs(t1):
        a = float(bg.a_of_t_np(t))
        dt = min(sim._timestep(a, vmax / (a * sim.mass)), t1 - t)
        tw = time.perf_counter()
        state, vmax = sim.base_step(state, t, dt, t_mom)
        if sim.needs_rebucket or (steps + 1) % sim.rebucket_every_max == 0:
            state = sim.rebucket(state)
        t_mom = min(t + 0.5 * dt, t1)
        t += dt
        steps += 1
        print(f"step {steps}: a={float(bg.a_of_t_np(t)):.4f} "
              f"{time.perf_counter()-tw:.1f}s", flush=True)
        if steps % CHECKPOINT_EVERY == 0:
            pf, mf, _ = extract_flat(state, N)
            _save(ck, np.asarray(pf).T, np.asarray(mf).T, t)
            print("  checkpointed", flush=True)
    pf, mf, _ = extract_flat(state, N)
    np.savez(_final_path(key), pos=np.asarray(pf).T, mom=np.asarray(mf).T)
    os.remove(ck)
    print(f"DONE: {_final_path(key)}", flush=True)


def prepare_pm(n_grid=256, a_end=0.12):
    from concept_tpu.bucketsim import BucketSimulation, flatten_state

    key = f"pm_clustered_{n_grid}_{a_end}"
    if os.path.exists(_final_path(key)):
        print(f"DONE (already built): {_final_path(key)}", flush=True)
        return
    bg, lin, box, N, G, mass = _cosmo(n_grid)
    sim = BucketSimulation(n_grid, box, mass, G, bg=bg, capacity=16)
    ck = _ckpt_path(key)
    if os.path.exists(ck):
        with np.load(ck) as z:
            pos, mom, t = z["pos"], z["mom"], float(z["t"])
        print(f"resume from t={t:.4g} a={float(bg.a_of_t_np(t)):.4f}",
              flush=True)
    else:
        p0, m0 = _build_2lpt(lin, box, N, mass)
        pos, mom = p0.T.copy(), m0.T.copy()
        t = float(bg.t_of_a_np(0.02))
        _save(ck, pos, mom, t)
        print("2LPT ICs built + checkpointed", flush=True)
    state = sim.init_state(
        tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
        tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
    )
    # mirror BucketSimulation.evolve's leapfrog cadence exactly
    # (t_mom half-step kick bounds + straggler-triggered rebucket)
    t1 = float(bg.t_of_a_np(a_end))
    t_mom, steps = t, 0
    max_straggler = sim._straggler_budget()
    while t < t1 - 1e-12 * abs(t1):
        a = float(bg.a_of_t_np(t))
        dt = min(sim._timestep(a), t1 - t)
        t_mid = min(t + 0.5 * dt, t1)
        int1 = bg.integrals_np(t_mom, t_mid, keys=("a**(-1)",))["a**(-1)"]
        int2 = bg.integrals_np(t, t + dt, keys=("a**(-2)",))["a**(-2)"]
        tw = time.perf_counter()
        state, ns = sim.step(state, int1, int2)
        steps += 1
        max_straggler = sim._straggler_budget()
        if steps % sim.rebucket_every == 0 or int(ns) > max_straggler // 2:
            state = sim.maybe_rebucket(state)
        t_mom = t_mid
        t += dt
        print(f"step {steps}: a={float(bg.a_of_t_np(t)):.4f} "
              f"{time.perf_counter()-tw:.1f}s", flush=True)
        if steps % CHECKPOINT_EVERY == 0:
            pf, mf = flatten_state(state)
            _save(ck, np.asarray(pf).T, np.asarray(mf).T, t)
            print("  checkpointed", flush=True)
    pf, mf = flatten_state(state)
    np.savez(_final_path(key), pos=np.asarray(pf).T, mom=np.asarray(mf).T)
    os.remove(ck)
    print(f"DONE: {_final_path(key)}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "p3m"
    if which == "p3m":
        prepare_p3m()
    else:
        prepare_pm()
