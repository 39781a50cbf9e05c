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


def _pad_suffix(m: int, n: int, quantum: int = 256) -> int:
    """Round the active-suffix size up to a quantum (bounds the number of
    distinct jit specializations as rung populations drift)."""
    return min(n, ((m + quantum - 1) // quantum) * quantum) if m else 0


def evolve_rungs_p3m(sim, state, a_begin: float, a_end: float,
                     N_rungs: int = 4, max_steps: int = 10000,
                     stats: dict | None = None):
    """Evolve with P³M gravity using adaptive rungs.

    Long-range PM kicks at the base cadence; short-range kicks subcycled
    with PER-RUNG COMPACTION: the state is kept sorted by rung during a
    base step, so the particles whose rungs fire at a substep form a
    contiguous suffix.  Only that (padded) suffix is bucketized as the
    RECEIVER set of a one-sided pair sweep against all particles — substep
    cost scales with the active population, the reference's rung economics
    (main.py:1347-1443; round 1 evaluated the FULL force every substep).
    Returns (state_with_rungs, a).
    """
    from concept_tpu.forces import pm as pm_force
    from concept_tpu.forces.shortrange import (
        shortrange_momentum_updates, shortrange_momentum_updates_on_subset,
        cell_counts,
    )

    cfg = sim.config
    bg = sim.bg
    spec = sim.spec
    N = state.pos.shape[0]
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

    def cap_of(pos_subset) -> int:
        counts = np.asarray(cell_counts(pos_subset, cfg.boxsize, sim._sr_ncells))
        return max(8, int(math.ceil((counts.max() + 1) / 8)) * 8)

    rungs = state.rungs
    steps = 0
    if stats is not None:
        stats.setdefault("receiver_rows", 0)  # Σ substep receiver rows
        stats.setdefault("full_rows", 0)      # what round-1 masking paid
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
        if stats is not None:
            stats["max_rung"] = max(stats.get("max_rung", 0), max_rung)
        # sort the state by rung: active sets become suffixes
        order = jnp.argsort(rungs)
        state = state._replace(
            pos=state.pos[order], mom=state.mom[order],
            ids=None if state.ids is None else state.ids[order],
        )
        rungs = rungs[order]
        rungs_np = np.asarray(rungs)
        n_ge = [int((rungs_np >= k).sum()) for k in range(max_rung + 1)]
        m_pad = [_pad_suffix(m, N) for m in n_ge]
        sup_cap = cap_of(state.pos)

        n_sub = 1 << max_rung
        sub_edges = np.linspace(t, t + dt, n_sub + 1)
        schedule = rung_kick_schedule(max_rung)
        rungs_i32 = rungs.astype(jnp.int32)
        for i in range(n_sub):
            int_drift = bg.integrals_np(sub_edges[i], sub_edges[i + 1],
                                        keys=("a**(-2)",))["a**(-2)"]
            state = sim._drift(state, jnp.asarray(int_drift, cfg.dtype))
            fired = schedule[i]
            if not fired:
                continue
            kmin = min(fired)
            per_rung = np.zeros(N_rungs, dtype=np.float64)
            for k in fired:
                spank = 1 << (max_rung - k)
                lo = sub_edges[i + 1 - spank]
                per_rung[k] = bg.integrals_np(lo, sub_edges[i + 1],
                                              keys=("a**(-1)",))["a**(-1)"]
            Mp = m_pad[kmin]
            if stats is not None:
                stats["receiver_rows"] += Mp
                stats["full_rows"] += N
            if Mp == 0:
                continue
            recv = state.pos[N - Mp:]
            recv_cap = min(sup_cap, cap_of(recv))
            dm_unit = shortrange_momentum_updates_on_subset(
                recv, state.pos, spec.mass, cfg.boxsize,
                sim._sr_scale, sim._sr_range, n_cells=sim._sr_ncells,
                capacity_recv=recv_cap, capacity_sup=sup_cap,
                softening=cfg.softening, G=cfg.G,
            )
            # per-rung kick interval; padding rows (rung < kmin) get 0
            scale = jnp.asarray(per_rung, cfg.dtype)[rungs_i32[N - Mp:]]
            state = state._replace(
                mom=state.mom.at[N - Mp:].add(dm_unit * scale[:, None])
            )
        t += dt
        a = float(bg.a_of_t_np(t))
        steps += 1
        if steps >= max_steps:
            raise RuntimeError("max_steps exceeded")
    return state._replace(rungs=rungs), a
