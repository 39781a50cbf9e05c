"""w(a)/w_eff(a) wiring + continuous linear re-realization.

Covers reference species.py:2940-3526 (per-component EoS splines into the
step integrals), main.py:1002-1025 (per-component integrand keys — the
round-1 bug used the first fluid's w for every fluid), and
species.py:2101 realize_if_linear (boltzmann_order −1/0 with 'class'
closure: grids re-realized from linear theory each kick).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.cosmology.neutrino import NeutrinoBackground
from concept_tpu.components import ComponentSpec, EquationOfState, FluidState
from concept_tpu.sim import SimConfig
from concept_tpu.sim_multi import MultiSimulation, MultiState


@pytest.fixture(scope="module")
def cosmo():
    bg = Background(H0=67 * units.km / (units.s * units.Mpc), Omega_m=0.31)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96)
    lin = LinearCosmology(bg=bg, primordial=prim, Omega_b=0.049,
                          Omega_cdm=0.261,
                          light_speed=constants.light_speed, Mpc=units.Mpc)
    return bg, lin


def _fluid_spec(name, w, n=8, border=1, closure="truncate"):
    return ComponentSpec(name=name, species="dark energy" if w else "matter",
                         representation="fluid", gridsize=n, w=w,
                         boltzmann_order=border, boltzmann_closure=closure)


def test_per_fluid_coefficients_differ(cosmo):
    """Two fluids with different w must get different flux/pressure
    coefficients (the round-1 bug gave everyone the first fluid's)."""
    bg, lin = cosmo
    specs = [_fluid_spec("a", 0.0), _fluid_spec("b", 1 / 3)]
    cfg = SimConfig(boxsize=100 * units.Mpc, potential_gridsize=8,
                    G=constants.G_Newton)
    sim = MultiSimulation(None, specs, cfg, bg, lin,
                          light_speed=constants.light_speed)
    t1 = float(bg.t_of_a_np(0.5))
    t2 = float(bg.t_of_a_np(0.52))
    cf, cp, weff, w = sim.fluid_step_scalars(t1, t2, 0.51, t2 - t1)
    assert not np.isclose(float(cf["a"]), float(cf["b"]))
    assert not np.isclose(float(cp["a"]), float(cp["b"]))
    # constant-w cross-check against the direct power integral
    expect_a = bg.integral_power_np(t1, t2, -2.0) / (t2 - t1)
    assert np.isclose(float(cf["a"]), expect_a, rtol=1e-6)


def test_neutrino_eos_spline_in_coefficients(cosmo):
    """A ν fluid with the exact Fermi-Dirac EoS gets coefficients computed
    with w_eff(a) inside the integrand — early: radiation-like, late:
    matter-like."""
    bg, lin = cosmo
    nubg = NeutrinoBackground(m_nu_eV=0.05)
    eos = EquationOfState.from_neutrino(nubg)
    assert abs(eos.w_np(1e-6) - 1 / 3) < 0.01
    assert eos.w_np(1.0) < 0.02
    spec = _fluid_spec("nu", 0.0)
    cfg = SimConfig(boxsize=100 * units.Mpc, potential_gridsize=8,
                    G=constants.G_Newton)
    sim = MultiSimulation(None, [spec], cfg, bg, lin,
                          light_speed=constants.light_speed,
                          eos={"nu": eos})
    # late times: ν is matter-like → coefficient ≈ the w=0 one
    t1 = float(bg.t_of_a_np(0.8))
    t2 = float(bg.t_of_a_np(0.81))
    cf, _, weff, w = sim.fluid_step_scalars(t1, t2, 0.805, t2 - t1)
    w0_coef = bg.integral_power_np(t1, t2, -2.0) / (t2 - t1)
    assert np.isclose(float(cf["nu"]), w0_coef, rtol=0.02)
    assert 0 < float(weff["nu"]) < 0.05  # small but nonzero memory of w>0


def test_realize_if_linear_tracks_linear_growth(cosmo):
    """A boltzmann_order = −1, 'class'-closure fluid is re-realized each
    kick: after 'evolving' between two epochs its δ field equals a fresh
    realization at the later epoch (reference species.py:2101)."""
    bg, lin = cosmo
    n = 16
    box = 200 * units.Mpc
    G = constants.G_Newton
    rho_crit = bg.rho_crit_of(G)
    spec = ComponentSpec(name="lin", species="matter", representation="fluid",
                         gridsize=n, w=0.0, boltzmann_order=-1,
                         boltzmann_closure="class")
    cfg = SimConfig(boxsize=box, potential_gridsize=n, G=G)
    sim = MultiSimulation(None, [spec], cfg, bg, lin,
                          light_speed=constants.light_speed,
                          fluid_Omegas={"lin": 0.31}, rho_crit=rho_crit,
                          fluid_seeds={"lin": 7})
    rho_mean = 0.31 * rho_crit
    # start from a WRONG field (zeros) — re-realization must fix it
    f0 = FluidState(varrho=jnp.full((n, n, n), rho_mean, jnp.float32))
    state = MultiState(particles={}, fluids={"lin": f0})
    a = 0.5
    _, _, weff, w = sim.fluid_step_scalars(
        float(bg.t_of_a_np(a)), float(bg.t_of_a_np(a)) * (1 + 1e-9), a, 1e-9)
    out = sim._apply_realize_if_linear(state, jnp.float32(a), weff, w)
    rho = np.asarray(out.fluids["lin"].varrho)
    delta = rho / rho_mean - 1
    assert delta.std() > 1e-4  # actually realized
    # re-realizing at a later epoch grows by D1 ratio (linear theory)
    out2 = sim._apply_realize_if_linear(state, jnp.float32(1.0), weff, w)
    delta2 = np.asarray(out2.fluids["lin"].varrho) / rho_mean - 1
    growth = float(bg.growth_np("D1", 1.0) / bg.growth_np("D1", 0.5))
    np.testing.assert_allclose(delta2, delta * growth, rtol=0.05, atol=1e-6)


def test_order0_class_realizes_J(cosmo):
    bg, lin = cosmo
    n = 8
    box = 100 * units.Mpc
    G = constants.G_Newton
    rho_crit = bg.rho_crit_of(G)
    spec = ComponentSpec(name="f", species="matter", representation="fluid",
                         gridsize=n, w=0.0, boltzmann_order=0,
                         boltzmann_closure="class")
    cfg = SimConfig(boxsize=box, potential_gridsize=n, G=G)
    sim = MultiSimulation(None, [spec], cfg, bg, lin,
                          light_speed=constants.light_speed,
                          fluid_Omegas={"f": 0.31}, rho_crit=rho_crit)
    rho_mean = 0.31 * rho_crit
    f0 = FluidState(varrho=jnp.full((n, n, n), rho_mean, jnp.float32),
                    J=jnp.zeros((3, n, n, n), jnp.float32))
    state = MultiState(particles={}, fluids={"f": f0})
    _, _, weff, w = sim.fluid_step_scalars(
        float(bg.t_of_a_np(0.5)), float(bg.t_of_a_np(0.5)) * (1 + 1e-9),
        0.5, 1e-9)
    out = sim._apply_realize_if_linear(state, jnp.float32(0.5), weff, w)
    J = np.asarray(out.fluids["f"].J)
    assert np.abs(J).max() > 0  # J realized, not left at zero


def test_dcdm_decay_conserves_energy_books(cosmo):
    """Decaying dark matter: ϱ_dcdm decays exactly as e^{−ΓΔt} and the
    companion radiation fluid gains the a-weighted energy (reference
    apply_internal_sources, species.py:2812)."""
    bg, lin = cosmo
    n = 8
    G = constants.G_Newton
    rho_crit = bg.rho_crit_of(G)
    gamma = 0.5 / float(bg.t_of_a_np(1.0))  # decays on ~2 Hubble times
    dcdm = ComponentSpec(name="dcdm", species="dcdm", representation="fluid",
                         gridsize=n, w=0.0, boltzmann_order=1,
                         decay_rate=gamma, decay_to="dr")
    dr = ComponentSpec(name="dr", species="radiation", representation="fluid",
                       gridsize=n, w=1 / 3, boltzmann_order=-1)
    cfg = SimConfig(boxsize=100 * units.Mpc, potential_gridsize=n, G=G)
    sim = MultiSimulation(None, [dcdm, dr], cfg, bg, lin,
                          light_speed=constants.light_speed,
                          fluid_Omegas={"dcdm": 0.27, "dr": 1e-5},
                          rho_crit=rho_crit)
    t0 = float(bg.t_of_a_np(0.5))
    t1 = float(bg.t_of_a_np(0.55))
    fac, gain = sim.decay_step_scalars(t0, t1)
    assert np.isclose(float(fac["dcdm"]), math.exp(-gamma * (t1 - t0)),
                      rtol=1e-6)
    assert float(gain["dcdm"]) > 0
    # applying the sources moves comoving density dcdm → dr
    f_d = FluidState(varrho=jnp.full((n, n, n), 2.0, jnp.float32),
                     J=jnp.zeros((3, n, n, n), jnp.float32))
    f_r = FluidState(varrho=jnp.full((n, n, n), 0.1, jnp.float32))
    state = MultiState(particles={}, fluids={"dcdm": f_d, "dr": f_r})
    out = sim._apply_internal_sources(state, fac, gain)
    assert float(out.fluids["dcdm"].varrho[0, 0, 0]) < 2.0
    assert float(out.fluids["dr"].varrho[0, 0, 0]) > 0.1


def test_vacuum_redistribute_conserves_mass():
    from concept_tpu.fluid import vacuum_redistribute

    rng = np.random.default_rng(2)
    n = 16
    rho = jnp.asarray(rng.uniform(0.5, 2.0, (n, n, n)).astype(np.float32))
    rho = rho.at[3, 4, 5].set(-0.3)  # a vacuum cell
    J = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    total0 = float(jnp.sum(rho))
    rho2, J2 = vacuum_redistribute(rho, J, rho_vacuum=0.01)
    assert np.isclose(float(jnp.sum(rho2)), total0, rtol=1e-5)
    assert float(rho2[3, 4, 5]) > float(rho[3, 4, 5])  # filled toward ok

def test_sigma_rerealized_order1_frozen_order2(cosmo):
    """ς cadence parity with the reference (species.py:880-928 table):

    boltzmann_order = 1, closure 'class':  linear ς realised CONTINUOUSLY
      — after stepping to a later epoch the stored ς equals a fresh
      realization there (it tracks the linear σ(k, a) tables);
    boltzmann_order = 2: ς "non-linear" but FROZEN — the reference has no
      ς evolution equation (species.py:917-928: "frozen in time ...
      realised only at the beginning"), so neither do we.
    """
    bg, lin = cosmo
    n = 8
    box = 100 * units.Mpc
    G = constants.G_Newton
    rho_crit = bg.rho_crit_of(G)
    # synthetic σ(k, a) transfer with a strong a-dependence so the
    # re-realized path measurably moves between epochs
    def transfer_sigma(k, a, species="nu"):
        return 1e-5 * float(a) ** 2 * jnp.exp(-jnp.asarray(k) * box / 50.0)

    lin.transfer_sigma = transfer_sigma
    try:
        def build(border):
            spec = ComponentSpec(
                name="nu", species="neutrino", representation="fluid",
                gridsize=n, w=1 / 3, boltzmann_order=border,
                boltzmann_closure="class" if border == 1 else "truncate")
            cfg = SimConfig(boxsize=box, potential_gridsize=n, G=G)
            return spec, MultiSimulation(
                None, [spec], cfg, bg, lin,
                light_speed=constants.light_speed,
                fluid_Omegas={"nu": 0.01}, rho_crit=rho_crit)

        from concept_tpu.ic import realize_sigma_grids

        rho_mean = 0.01 * rho_crit
        a1, a2 = 0.25, 1.0
        fresh1 = realize_sigma_grids(lin, n, box, a1, rho_mean * (1 + 1 / 3))
        fresh2 = realize_sigma_grids(lin, n, box, a2, rho_mean * (1 + 1 / 3))
        assert fresh1 is not None
        # frozen ς would be wrong at a2 by the a² factor — they differ
        assert not np.allclose(np.asarray(fresh1), np.asarray(fresh2),
                               rtol=1e-3, atol=0.0)

        # order 1 + class: _apply_realize_if_linear refreshes ς to the
        # current epoch
        spec, sim = build(1)
        f0 = FluidState(
            varrho=jnp.full((n, n, n), rho_mean, jnp.float32),
            J=jnp.zeros((3, n, n, n), jnp.float32),
            P=jnp.full((n, n, n), rho_mean / 3, jnp.float32),
            sigma=fresh1,
        )
        state = MultiState(particles={}, fluids={"nu": f0})
        _, _, weff, w = sim.fluid_step_scalars(
            float(bg.t_of_a_np(a2)), float(bg.t_of_a_np(a2)) * (1 + 1e-9),
            a2, 1e-9)
        out = sim._apply_realize_if_linear(state, jnp.float32(a2), weff, w)
        np.testing.assert_allclose(
            np.asarray(out.fluids["nu"].sigma), np.asarray(fresh2),
            rtol=1e-4, atol=float(np.abs(np.asarray(fresh2)).max()) * 1e-4)

        # order 2: ς untouched (reference freeze)
        spec2, sim2 = build(2)
        out2 = sim2._apply_realize_if_linear(
            MultiState(particles={}, fluids={"nu": f0}),
            jnp.float32(a2), weff, w)
        np.testing.assert_array_equal(
            np.asarray(out2.fluids["nu"].sigma), np.asarray(fresh1))
    finally:
        del lin.transfer_sigma
