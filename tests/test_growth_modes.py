"""Plane-wave (single-mode) growth test: for a 1D sinusoidal perturbation
the Zel'dovich solution is exact, so the PM-evolved fundamental mode must
grow precisely as D1(a).  This is the sharpest available test of the PM
force normalisation + leapfrog integrator (analogue of the reference's
drift/kick/lpt closed-form tests, SURVEY.md §4)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import ComponentSpec, particle_mass, lattice_positions, ParticleState
from concept_tpu.sim import Simulation, SimConfig

H0 = 67 * units.km / (units.s * units.Mpc)
OM = 0.319
BOX = 256 * units.Mpc
NG = 32
N = NG**3


def make_planewave_state(bg, mass, a0, m_mode=2, eps=0.005):
    kx = 2 * math.pi * m_mode / BOX
    q = np.asarray(lattice_positions(NG, BOX), dtype=np.float64)
    psi = -(eps / kx) * np.sin(kx * q[:, 0])
    H = float(bg.hubble_np(a0))
    f1 = float(bg.growth_np("f1", a0))
    pos = q.copy()
    pos[:, 0] = (q[:, 0] + psi) % BOX
    mom = np.zeros_like(q)
    mom[:, 0] = a0 * a0 * mass * H * f1 * psi
    return (
        ParticleState(pos=jnp.asarray(pos, jnp.float32), mom=jnp.asarray(mom, jnp.float32)),
        kx,
    )


def mode_amplitude(state, kx):
    """Exact (windowless) fundamental-mode amplitude from positions."""
    x = np.asarray(state.pos[:, 0], dtype=np.float64)
    return 2 * abs(np.exp(-1j * kx * x).sum()) / len(x)


@pytest.mark.parametrize("interlace,order,tol", [(True, 2, 5e-3), (False, 4, 5e-3)])
def test_planewave_linear_growth(interlace, order, tol):
    bg = Background(H0=H0, Omega_m=OM)
    G = constants.G_Newton
    mass = particle_mass(OM, bg.rho_crit_of(G), BOX, N)
    spec = ComponentSpec(name="m", species="matter", N=N, mass=mass)
    sim = Simulation(
        spec,
        SimConfig(boxsize=BOX, potential_gridsize=NG, G=G,
                  interlace=interlace, interpolation_order=order),
        bg,
    )
    a0, a1 = 0.02, 0.3
    eps = 0.005
    state, kx = make_planewave_state(bg, mass, a0, eps=eps)
    assert math.isclose(mode_amplitude(state, kx), eps, rel_tol=1e-3)
    state, _ = sim.evolve(state, a0, a1)
    D = float(bg.growth_np("D1", a1) / bg.growth_np("D1", a0))
    ratio = mode_amplitude(state, kx) / (eps * D)
    assert abs(ratio - 1) < tol, f"growth ratio = {ratio}"


def test_pure_drift():
    """No perturbation, uniform momentum: particles drift by
    (mom/m)·∫a⁻²dt exactly (analogue of reference test/drift)."""
    bg = Background(H0=H0, Omega_m=OM)
    G = constants.G_Newton
    mass = particle_mass(OM, bg.rho_crit_of(G), BOX, N)
    spec = ComponentSpec(name="m", species="matter", N=N, mass=mass)
    sim = Simulation(
        spec, SimConfig(boxsize=BOX, potential_gridsize=NG, G=G), bg,
    )
    a0, a1 = 0.1, 0.5
    q = np.asarray(lattice_positions(NG, BOX), dtype=np.float64)
    v = 100 * units.km / units.s  # peculiar velocity today-ish scale
    mom0 = a0 * mass * v  # mom = a²·m·ẋ with ẋ = v/a
    state = ParticleState(
        pos=jnp.asarray(q, jnp.float32),
        mom=jnp.full((N, 3), mom0, dtype=jnp.float32),
    )
    state, _ = sim.evolve(state, a0, a1)
    t0, t1 = bg.t_of_a_np(a0), bg.t_of_a_np(a1)
    expected_shift = mom0 / mass * bg.integrals_np(t0, t1, keys=("a**(-2)",))["a**(-2)"]
    shift = (np.asarray(state.pos[:, 0], dtype=np.float64) - q[:, 0]) % BOX
    np.testing.assert_allclose(shift, expected_shift, rtol=2e-3)
