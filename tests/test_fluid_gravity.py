"""Self-gravitating fluid tests — analogues of reference test/fluid_gravity
and test/fluid_vs_particles: a dust (w=0) fluid plane wave must grow with
D1, matching the particle result."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import ComponentSpec, FluidState
from concept_tpu.sim import SimConfig
from concept_tpu.sim_multi import MultiSimulation, MultiState

H0 = 67 * units.km / (units.s * units.Mpc)
OM = 0.319
BOX = 1024 * units.Mpc
NG = 32


@pytest.fixture(scope="module")
def setup():
    bg = Background(H0=H0, Omega_m=OM)
    G = constants.G_Newton
    rho_crit = bg.rho_crit_of(G)
    rho_mean = OM * rho_crit  # comoving matter density
    spec = ComponentSpec(
        name="dust", species="matter", representation="fluid",
        gridsize=NG, w=0.0, boltzmann_order=1,
    )
    config = SimConfig(boxsize=BOX, potential_gridsize=NG, G=G)
    sim = MultiSimulation(
        None, [spec], config, bg, light_speed=constants.light_speed,
    )
    return bg, sim, spec, rho_mean


def make_planewave_fluid(bg, rho_mean, a0, m_mode=2, eps=0.005):
    kx = 2 * math.pi * m_mode / BOX
    x = (np.arange(NG) + 0.5) * BOX / NG
    delta = eps * np.cos(kx * x)[:, None, None] * np.ones((1, NG, NG))
    varrho = rho_mean * (1 + delta)
    H = float(bg.hubble_np(a0))
    f1 = float(bg.growth_np("f1", a0))
    # J = ϱ̄ a² H f₁ ψ, ψ_x = −(ε/kx) sin(kx x)
    psi = -(eps / kx) * np.sin(kx * x)[:, None, None] * np.ones((1, NG, NG))
    J = np.zeros((3, NG, NG, NG))
    J[0] = rho_mean * a0**2 * H * f1 * psi
    return FluidState(
        varrho=jnp.asarray(varrho, jnp.float32),
        J=jnp.asarray(J, jnp.float32),
        P=jnp.zeros((NG, NG, NG), jnp.float32),
    ), kx


def mode_amp(varrho, kx):
    rho = np.asarray(varrho, dtype=np.float64)
    prof = rho.mean(axis=(1, 2))
    prof = prof / prof.mean() - 1
    return 2 * abs(np.fft.rfft(prof)[2]) / NG


def test_fluid_planewave_growth(setup):
    bg, sim, spec, rho_mean = setup
    a0, a1 = 0.02, 0.3
    eps = 0.005
    fl, kx = make_planewave_fluid(bg, rho_mean, a0, eps=eps)
    state = MultiState(particles={}, fluids={"dust": fl})
    assert math.isclose(mode_amp(fl.varrho, kx), eps, rel_tol=1e-3)
    state, a = sim.evolve(state, a0, a1)
    D = float(bg.growth_np("D1", a1) / bg.growth_np("D1", a0))
    ratio = mode_amp(state.fluids["dust"].varrho, kx) / (eps * D)
    assert abs(ratio - 1) < 0.02, f"fluid growth ratio {ratio}"


def test_fluid_mass_conserved_under_gravity(setup):
    bg, sim, spec, rho_mean = setup
    a0, a1 = 0.02, 0.1
    fl, kx = make_planewave_fluid(bg, rho_mean, a0)
    state = MultiState(particles={}, fluids={"dust": fl})
    total0 = float(jnp.sum(fl.varrho))
    state, _ = sim.evolve(state, a0, a1)
    total1 = float(jnp.sum(state.fluids["dust"].varrho))
    # flux-form scheme is exactly conservative; the residual is f32
    # per-cell rounding accumulated over ~40 steps (reference runs f64)
    assert np.isclose(total0, total1, rtol=1e-3)


def test_two_particle_components_match_one(setup):
    """Two particle components (half mass each) must evolve identically to
    one combined component — the analogue of reference
    test/multicomponent."""
    import jax
    from concept_tpu.components import ParticleState, lattice_positions, particle_mass
    from concept_tpu.sim_multi import MultiSimulation, MultiState
    from concept_tpu.sim import SimConfig
    from concept_tpu.units import constants

    bg, _, _, rho_mean = setup
    G = constants.G_Newton
    NGp = 16
    N = NGp**3
    mass = rho_mean * BOX**3 / N
    config = SimConfig(boxsize=BOX, potential_gridsize=NGp, G=G)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        (np.asarray(lattice_positions(NGp, BOX))
         + rng.normal(0, 0.05 * BOX / NGp, (N, 3))) % BOX, jnp.float32)
    mom = jnp.zeros((N, 3), jnp.float32)

    spec1 = ComponentSpec(name="all", species="matter", N=N, mass=mass)
    sim1 = MultiSimulation([spec1], [], config, bg)
    st1 = MultiState(particles={"all": ParticleState(pos=pos, mom=mom)}, fluids={})
    out1, _ = sim1.evolve(st1, 0.05, 0.1)

    # same particles split into two half-mass components at the same
    # positions (each particle duplicated with mass/2)
    specA = ComponentSpec(name="A", species="cdm", N=N, mass=mass / 2)
    specB = ComponentSpec(name="B", species="baryon", N=N, mass=mass / 2)
    sim2 = MultiSimulation([specA, specB], [], config, bg)
    st2 = MultiState(
        particles={
            "A": ParticleState(pos=jnp.copy(pos), mom=jnp.copy(mom)),
            "B": ParticleState(pos=jnp.copy(pos), mom=jnp.copy(mom)),
        },
        fluids={},
    )
    out2, _ = sim2.evolve(st2, 0.05, 0.1)
    np.testing.assert_allclose(
        np.asarray(out2.particles["A"].pos), np.asarray(out1.particles["all"].pos),
        atol=1e-4 * BOX / NGp,
    )
    np.testing.assert_allclose(
        np.asarray(out2.particles["B"].pos), np.asarray(out2.particles["A"].pos),
        atol=1e-6 * BOX,
    )


def test_realize_sigma_grids_traceless():
    """ς realization from σ tables (reference ic.py:670 rank-2 kernel):
    the realized shear is traceless (K(k)'s trace is 3/2·(1 − 1) = 0)
    and symmetric-packed; without σ tables it degrades to None."""
    import numpy as np
    import jax.numpy as jnp
    from concept_tpu.units import units, constants
    from concept_tpu.cosmology.background import Background
    from concept_tpu.cosmology.primordial import PrimordialSpectrum
    from concept_tpu.cosmology.linear import LinearCosmology
    from concept_tpu.cosmology.boltzmann import TransferTables
    from concept_tpu.ic import realize_sigma_grids

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96, pivot=0.05 / units.Mpc)
    lin = LinearCosmology(bg, prim, Omega_b=0.049, Omega_cdm=0.27,
                          light_speed=constants.light_speed, Mpc=units.Mpc)
    assert realize_sigma_grids(lin, 8, 64 * units.Mpc, 0.1, 1.0) is None

    k = np.logspace(-4, 1, 32) / units.Mpc
    a = np.logspace(-3, 0, 16)
    sig = np.outer(a, 1e-2 / (1 + (k * units.Mpc) ** 2))
    lin.tables = TransferTables(
        k=k, a=a, tables={("nu", "sigma"): sig,
                          ("nu", "delta"): sig.copy()},
        aux={}, gauge="synchronous",
    )
    out = realize_sigma_grids(lin, 8, 64 * units.Mpc, 0.1, 2.5, seed=3)
    assert out is not None and out.shape == (6, 8, 8, 8)
    assert bool(jnp.all(jnp.isfinite(out)))
    trace = out[0] + out[3] + out[5]  # xx + yy + zz
    scale = float(jnp.max(jnp.abs(out)))
    assert float(jnp.max(jnp.abs(trace))) < 1e-5 * max(scale, 1e-30)
