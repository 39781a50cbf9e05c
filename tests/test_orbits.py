"""Closed-form orbit tests in a static universe — the analogues of
reference test/kick_pp_without_ewald and test/kick_pp_with_ewald
(two-particle orbits vs analytic, test/drift analytic drift)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import ComponentSpec, ParticleState
from concept_tpu.sim import Simulation, SimConfig

G = constants.G_Newton
H0 = 67 * units.km / (units.s * units.Mpc)


def test_two_body_circular_orbit_nonperiodic():
    """Two equal masses on a circular orbit (non-periodic PP): after one
    analytic period they return to the start (reference
    test/kick_pp_without_ewald)."""
    box = 100 * units.Mpc
    m = 1e6  # internal mass units (1e10 m_sun each → huge; fine)
    r = 1 * units.Mpc
    # circular: v = sqrt(G m / (2 r)), ω = sqrt(2 G m / r³)
    v = math.sqrt(G * m / (2 * r))
    T = 2 * math.pi / math.sqrt(2 * G * m / r**3)
    c = box / 2
    pos = jnp.asarray(
        [[c - r / 2, c, c], [c + r / 2, c, c]], jnp.float32
    )
    mom = jnp.asarray([[0, -v * m, 0], [0, v * m, 0]], jnp.float32)
    pos0 = np.asarray(pos).copy()
    mom0 = np.asarray(mom).copy()
    state = ParticleState(pos=pos, mom=mom)

    bg = Background(H0=H0, Omega_m=1.0, enable_Hubble=False)
    spec = ComponentSpec(name="pair", species="matter", N=2, mass=m)
    sim = Simulation(
        spec, SimConfig(boxsize=box, potential_gridsize=8, G=G,
                        method="ppnonperiodic"), bg,
    )
    out = sim.evolve_static(state, T, n_steps=2000)
    np.testing.assert_allclose(np.asarray(out.pos), pos0, atol=0.02 * r)
    np.testing.assert_allclose(np.asarray(out.mom), mom0, atol=0.02 * v * m)


def test_two_body_half_period():
    """After half a period the two particles must have swapped positions."""
    box = 100 * units.Mpc
    m = 1e6
    r = 1 * units.Mpc
    v = math.sqrt(G * m / (2 * r))
    T = 2 * math.pi / math.sqrt(2 * G * m / r**3)
    c = box / 2
    pos = jnp.asarray([[c - r / 2, c, c], [c + r / 2, c, c]], jnp.float32)
    mom = jnp.asarray([[0, -v * m, 0], [0, v * m, 0]], jnp.float32)
    bg = Background(H0=H0, Omega_m=1.0, enable_Hubble=False)
    spec = ComponentSpec(name="pair", species="matter", N=2, mass=m)
    sim = Simulation(
        spec, SimConfig(boxsize=box, potential_gridsize=8, G=G,
                        method="ppnonperiodic"), bg,
    )
    pos0 = np.asarray(pos).copy()
    out = sim.evolve_static(ParticleState(pos=pos, mom=mom), T / 2, n_steps=1000)
    swapped = pos0[[1, 0]]
    np.testing.assert_allclose(np.asarray(out.pos), swapped, atol=0.02 * r)


def test_static_free_drift():
    """No interactions (zero mass): uniform momentum drifts positions by
    (mom/m)·t (reference test/drift_nohubble)."""
    box = 10.0
    bg = Background(H0=H0, Omega_m=1.0, enable_Hubble=False)
    spec = ComponentSpec(name="p", species="matter", N=4, mass=1.0)
    sim = Simulation(
        spec, SimConfig(boxsize=box, potential_gridsize=8, G=0.0,
                        method="pm"), bg,
    )
    pos = jnp.asarray(np.random.default_rng(0).uniform(0, box, (4, 3)),
                      jnp.float32)
    mom = jnp.full((4, 3), 0.25, jnp.float32)
    pos0 = np.asarray(pos).copy()
    out = sim.evolve_static(ParticleState(pos=pos, mom=mom), 4.0, n_steps=10)
    expected = np.mod(pos0 + 0.25 * 4.0, box)
    np.testing.assert_allclose(np.asarray(out.pos), expected, atol=1e-3)


def test_two_body_orbit_periodic_ewald():
    """Same circular orbit with the periodic (Ewald) PP method: at
    separation ≪ box the correction is tiny, so the analytic orbit still
    holds (reference test/kick_pp_with_ewald)."""
    box = 100 * units.Mpc
    m = 1e6
    r = 1 * units.Mpc
    v = math.sqrt(G * m / (2 * r))
    T = 2 * math.pi / math.sqrt(2 * G * m / r**3)
    c = box / 2
    pos = jnp.asarray([[c - r / 2, c, c], [c + r / 2, c, c]], jnp.float32)
    mom = jnp.asarray([[0, -v * m, 0], [0, v * m, 0]], jnp.float32)
    pos0 = np.asarray(pos).copy()
    bg = Background(H0=H0, Omega_m=1.0, enable_Hubble=False)
    spec = ComponentSpec(name="pair", species="matter", N=2, mass=m)
    sim = Simulation(
        spec, SimConfig(boxsize=box, potential_gridsize=8, G=G,
                        method="pp", ewald_gridsize=32), bg,
    )
    out = sim.evolve_static(ParticleState(pos=pos, mom=mom), T, n_steps=2000)
    np.testing.assert_allclose(np.asarray(out.pos), pos0, atol=0.03 * r)
