"""Component measurements used by time-step limiters, sanity checks and
the info/measure outputs.  Counterpart of reference analysis.py:3860-4231
(measure: v_max, v_rms, momentum, ϱ min/max/sum, mass, discontinuity)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def measure_particles(pos, mom, mass, a):
    """Returns dict of scalars: v_max, v_rms (peculiar ẋ·a = mom/(a m)),
    total momentum, CoM velocity."""
    v = mom / (a * mass)  # peculiar velocity
    v2 = jnp.sum(v * v, axis=1)
    return {
        "v_max": jnp.sqrt(jnp.max(v2)),
        "v_rms": jnp.sqrt(jnp.mean(v2)),
        "mom_total": jnp.sum(mom, axis=0),
        "mass_total": mass * pos.shape[0],
    }


@partial(jax.jit, static_argnames=())
def measure_fluid(varrho, J):
    """ϱ statistics + max |u| estimate (reference uses these for the
    Courant limiter and vacuum detection)."""
    rho_min = jnp.min(varrho)
    rho_max = jnp.max(varrho)
    rho_sum = jnp.sum(varrho)
    u_max = jnp.max(
        jnp.sqrt(jnp.sum(J * J, axis=0)) / jnp.maximum(varrho, 1e-30)
    )
    return {
        "rho_min": rho_min,
        "rho_max": rho_max,
        "rho_sum": rho_sum,
        "u_max": u_max,
        "vacuum_imminent": rho_min <= 0,
    }
