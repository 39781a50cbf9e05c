"""Adaptive per-particle rungs: short-range kicks at power-of-two
sub-cadences of the base step.

TPU-native counterpart of the reference's rung machinery
(species.py:2340-2597 rung bookkeeping; main.py:1347-1443 driftkick
cadence; main.py:2433 fac_softening rung criterion; N_rungs default 8,
param/example_explanatory:385).

Design: the reference walks per-rung particle index lists; TPU keeps a
dense (N,) int8 rung array and applies *masked* kicks — every substep
evaluates the short-range kernel once and applies it to the rungs whose
cadence fires, scaled by each particle's own sub-interval.  The drift is
split into 2^(max_rung) equal substeps (reference cadence: rung k kicks
when (i+1) mod 2^(max_rung−k) == 0).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

FAC_SOFTENING = 0.025  # reference main.py:2433 (GADGET ErrTolIntAccuracy analogue)


@partial(jax.jit, static_argnames=("N_rungs",))
def assign_rungs(dmom_short, mass, kick_integral, dt_base, softening: float,
                 N_rungs: int = 8, fac: float = FAC_SOFTENING):
    """Per-particle rung from the short-range acceleration:
    Δt_i = fac·√(ε/|ẍ_i|), rung_i = max(0, ⌈log2(Δt_base/Δt_i)⌉).

    dmom_short: (N,3) short-range momentum updates over kick_integral.
    """
    acc = jnp.sqrt(jnp.sum(dmom_short * dmom_short, axis=1)) / (
        mass * jnp.maximum(kick_integral, 1e-30)
    )
    dt_i = fac * jnp.sqrt(softening / jnp.maximum(acc, 1e-30))
    rung = jnp.ceil(jnp.log2(jnp.maximum(dt_base / dt_i, 1e-30)))
    return jnp.clip(rung, 0, N_rungs - 1).astype(jnp.int8)


def rung_kick_schedule(max_rung: int):
    """Substep boundaries and the rungs kicked at each: at boundary i+1
    (i = 0..2^max_rung−1), rungs {k : (i+1) mod 2^(max_rung−k) == 0}."""
    n_sub = 1 << max_rung
    schedule = []
    for i in range(n_sub):
        fired = [k for k in range(max_rung + 1) if (i + 1) % (1 << (max_rung - k)) == 0]
        schedule.append(fired)
    return schedule


def evolve_rungs_p3m(sim, state, a_begin: float, a_end: float,
                     N_rungs: int = 4, max_steps: int = 10000):
    """Evolve with P³M gravity using adaptive rungs.

    Long-range PM kicks at the base cadence; short-range kicks subcycled.
    Host-driven schedule (rung populations update each base step); all
    heavy work in jitted kernels.  Returns (state_with_rungs, a).
    """
    from concept_tpu.forces import pm as pm_force
    from concept_tpu.forces.shortrange import shortrange_momentum_updates

    cfg = sim.config
    bg = sim.bg
    spec = sim.spec
    t = float(bg.t_of_a_np(a_begin))
    t_end = float(bg.t_of_a_np(a_end))
    a = a_begin

    def short_dmom(pos, kick_int):
        return shortrange_momentum_updates(
            pos, spec.mass, cfg.boxsize, sim._sr_scale, sim._sr_range,
            kick_int, n_cells=sim._sr_ncells, capacity=sim._sr_capacity,
            softening=cfg.softening, G=cfg.G,
        )

    def long_dmom(pos, kick_int):
        (dmom,) = pm_force.pm_gravity_momentum_updates(
            [pos], [spec.mass], cfg.potential_gridsize, cfg.boxsize, cfg.G,
            kick_integral=kick_int, order=cfg.interpolation_order,
            deconvolve=cfg.deconvolve, differentiation=cfg.differentiation,
            deposit_method=cfg.deposit_method, longrange_scale=sim._sr_scale,
            interlace=cfg.interlace,
        )
        return dmom

    rungs = state.rungs
    steps = 0
    while t < t_end - 1e-12 * abs(t_end):
        dt = min(sim.timestep_size(a), t_end - t)
        # long-range kick over the full base step (base cadence)
        int_long = bg.integrals_np(t, t + dt, keys=("a**(-1)",))["a**(-1)"]
        state = state._replace(mom=state.mom + long_dmom(state.pos, int_long))
        # rung (re)assignment from the current short-range field
        probe_int = bg.integrals_np(t, t + 0.01 * dt, keys=("a**(-1)",))["a**(-1)"]
        dm_probe = short_dmom(state.pos, probe_int)
        rungs = assign_rungs(dm_probe, spec.mass, probe_int, dt,
                             cfg.softening if cfg.softening > 0 else cfg.boxsize / cfg.potential_gridsize,
                             N_rungs=N_rungs)
        max_rung = int(jnp.max(rungs))
        n_sub = 1 << max_rung
        sub_edges = np.linspace(t, t + dt, n_sub + 1)
        schedule = rung_kick_schedule(max_rung)
        # interlaced drift/kick: drift each substep, kick fired rungs over
        # their own straddling interval
        for i in range(n_sub):
            int_drift = bg.integrals_np(sub_edges[i], sub_edges[i + 1],
                                        keys=("a**(-2)",))["a**(-2)"]
            state = sim._drift(state, jnp.asarray(int_drift, cfg.dtype))
            fired = schedule[i]
            if fired:
                kmin = min(fired)
                span = 1 << (max_rung - kmin)
                lo_edge = sub_edges[i + 1 - span]
                # kick intervals per rung: rung k spans 2^(max_rung−k) substeps
                ints = {}
                for k in fired:
                    spank = 1 << (max_rung - k)
                    lo = sub_edges[i + 1 - spank]
                    ints[k] = bg.integrals_np(lo, sub_edges[i + 1],
                                              keys=("a**(-1)",))["a**(-1)"]
                dm_unit = short_dmom(state.pos, 1.0)
                per_rung = np.zeros(N_rungs, dtype=np.float64)
                for k, v in ints.items():
                    per_rung[k] = v
                scale = jnp.asarray(per_rung, cfg.dtype)[rungs.astype(jnp.int32)]
                state = state._replace(mom=state.mom + dm_unit * scale[:, None])
        t += dt
        a = float(bg.a_of_t_np(t))
        steps += 1
        if steps >= max_steps:
            raise RuntimeError("max_steps exceeded")
    return state._replace(rungs=rungs), a
