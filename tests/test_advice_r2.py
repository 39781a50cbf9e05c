"""Regression tests for the round-2 advisor findings (ADVICE.md r2):
downstream interlacing on the stencil-differentiation path, bispectrum
shot-noise correction and distinct shape families, exact neutrino
background in the Friedmann equation, and overflow-budget guarding.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units


BOX = 64.0


def _lattice_jitter(n, box, seed=0, amp=0.1):
    from concept_tpu.components import lattice_positions

    pos = np.asarray(lattice_positions(n, box))
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.mod(pos + rng.standard_normal(pos.shape) * amp * box / n, box),
        jnp.float32,
    )


def test_downstream_interlace_stencil_applied():
    """Stencil differentiation must honor a requested downstream lattice
    (previously silently ignored): the bcc-downstream force differs from
    sc-downstream and stays close to it on a smooth field."""
    from concept_tpu.forces.pm import pm_gravity_momentum_updates

    n = 16
    pos = _lattice_jitter(n, BOX)
    kw = dict(
        kick_integral=1.0, order=2, deconvolve=(True, True),
        differentiation=4, deposit_method="scatter",
    )
    (d_sc,) = pm_gravity_momentum_updates(
        [pos], [1.0], n, BOX, 1.0, interlace=("sc", "sc"), **kw
    )
    (d_bcc,) = pm_gravity_momentum_updates(
        [pos], [1.0], n, BOX, 1.0, interlace=("sc", "bcc"), **kw
    )

    def rms(x):
        return float(jnp.sqrt(jnp.mean(x * x)))

    assert rms(d_sc - d_bcc) > 1e-6 * rms(d_sc)  # actually applied
    # semantics: the stencil-path downstream interlacing must track the
    # (already-validated) Fourier-path one up to differentiation error
    kw_f = dict(kw, differentiation="fourier")
    (d_bcc_f,) = pm_gravity_momentum_updates(
        [pos], [1.0], n, BOX, 1.0, interlace=("sc", "bcc"), **kw_f
    )
    (d_sc_f,) = pm_gravity_momentum_updates(
        [pos], [1.0], n, BOX, 1.0, interlace=("sc", "sc"), **kw_f
    )
    # the interlace CORRECTION itself (bcc − sc) agrees between the two
    # differentiation schemes in direction and order of magnitude (the
    # correction lives near Nyquist, where an order-4 stencil and the
    # spectral derivative legitimately differ in detail)
    corr_stencil = np.asarray(d_bcc - d_sc).ravel()
    corr_fourier = np.asarray(d_bcc_f - d_sc_f).ravel()
    cos = float(
        corr_stencil @ corr_fourier
        / (np.linalg.norm(corr_stencil) * np.linalg.norm(corr_fourier))
    )
    assert cos > 0.7, cos
    ratio = np.linalg.norm(corr_stencil) / np.linalg.norm(corr_fourier)
    assert 0.3 < ratio < 1.5, ratio


def test_bispec_shape_families_distinct():
    """stretched / elongated / S-isosceles / squeezed must produce
    DISTINCT triangle sets (reference analysis.py:1540-1760); previously
    several collapsed to (k, k/2, k/2)."""
    from concept_tpu.analysis.bispec import triangle_configurations

    k_min, k_max = 0.1, 2.0
    tri = {
        name: np.asarray(triangle_configurations(f"{name} 6", k_min, k_max))
        for name in (
            "equilateral", "stretched", "squeezed", "s-isosceles",
            "l-isosceles", "elongated", "right", "isosceles-right",
        )
    }
    # stretched: collapsed (k, k/2, k/2)
    assert np.allclose(tri["stretched"][:, 1], tri["stretched"][:, 0] / 2)
    assert np.allclose(tri["stretched"][:, 2], tri["stretched"][:, 0] / 2)
    # squeezed: k1 = k2, k3 = k1·sqrt(2(1-0.99)) — a RATIO, not k_min
    sq = tri["squeezed"]
    assert np.allclose(sq[:, 0], sq[:, 1])
    assert np.allclose(sq[:, 2] / sq[:, 0], math.sqrt(2 * (1 - 0.99)), rtol=1e-6)
    assert sq[:, 2].min() >= k_min * (1 - 1e-9)
    # S-isosceles: k2 = k3, with varying ratio t ∈ [1/2, 1] (2D family)
    si = tri["s-isosceles"]
    assert np.allclose(si[:, 1], si[:, 2], rtol=1e-6)
    ratios = np.unique(np.round(si[:, 1] / si[:, 0], 6))
    assert len(ratios) > 3  # genuinely 2D
    # elongated: k1 = k2 + k3
    el = tri["elongated"]
    assert np.allclose(el[:, 0], el[:, 1] + el[:, 2], rtol=1e-5)
    # right: k1² = k2² + k3²
    ri = tri["right"]
    assert np.allclose(ri[:, 0] ** 2, ri[:, 1] ** 2 + ri[:, 2] ** 2, rtol=1e-5)
    # isosceles right: 1D, k2 = k3 = k1/sqrt(2)
    ir = tri["isosceles-right"]
    assert np.allclose(ir[:, 1], ir[:, 0] / math.sqrt(2), rtol=1e-6)
    # the families are pairwise distinct
    flat = {k: set(map(tuple, np.round(v, 5))) for k, v in tri.items()}
    assert flat["stretched"] != flat["elongated"]
    assert flat["stretched"] != flat["s-isosceles"]
    assert flat["elongated"] != flat["s-isosceles"]


def test_bispec_shotnoise_correction_used():
    """shotnoise_correction=True must change B and Q (Poisson subtraction),
    and reduce the measured B of an UNCLUSTERED (pure shot noise) field
    toward zero."""
    from concept_tpu.analysis.bispec import bispec

    n = 16
    N = 512
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(0, BOX, (N, 3)), jnp.float32)
    raw = bispec([pos], [1.0], n, BOX, configuration="equilateral 4")
    cor = bispec([pos], [1.0], n, BOX, configuration="equilateral 4",
                 shotnoise_correction=True, n_particles=N)
    assert not np.allclose(raw["B"], cor["B"])
    # Poisson field: ⟨B_raw⟩ = (P1+P2+P3)/n̄ + 1/n̄² > 0; corrected ≈ 0
    assert np.nanmean(np.abs(cor["B"])) < np.nanmean(np.abs(raw["B"]))
    with pytest.raises(ValueError):
        bispec([pos], [1.0], n, BOX, shotnoise_correction=True)


def test_neutrino_background_in_friedmann():
    """Background with massive ν: ρ_ν ∝ a⁻⁴ at early times (relativistic),
    ∝ a⁻³ late — H(a) must NOT treat ν as pressureless matter."""
    from concept_tpu.cosmology.background import Background
    from concept_tpu.cosmology.neutrino import NeutrinoBackground

    H0 = 67 * units.km / (units.s * units.Mpc)
    nubg = NeutrinoBackground(m_nu_eV=0.1, N_nu=3)
    h = 0.67
    Omega_nu = nubg.omega_nu_h2() / h**2
    bg_nu = Background(H0=H0, Omega_m=0.3, Omega_nu=Omega_nu,
                       nu_background=nubg)
    bg_lump = Background(H0=H0, Omega_m=0.3 + Omega_nu)
    # early times: exact ρ_ν ∝ a⁻⁴ (ρ·a⁴ constant), NOT the lumped a⁻³
    a = 1e-5
    plateau = float(nubg.rho_ratio_np(a)) * a**4
    plateau2 = float(nubg.rho_ratio_np(a / 10)) * (a / 10) ** 4
    assert np.isclose(plateau, plateau2, rtol=0.05)
    assert bg_nu.hubble_np(a) > bg_lump.hubble_np(a)
    # today both match (≲ relativistic leftovers)
    assert np.isclose(bg_nu.hubble_np(1.0), bg_lump.hubble_np(1.0), rtol=1e-3)
    # late times: ν behaves as matter — rho_ratio ≈ a⁻³ at a = 1 vicinity
    assert np.isclose(
        float(nubg.rho_ratio_np(0.9)) / 0.9**-3, 1.0, rtol=0.05
    )
    # ä consistency: finite-difference of ȧ matches addot
    eps = 1e-4
    a0 = 0.01
    t0 = float(bg_nu.t_of_a_np(a0))
    adot = lambda t: float(bg_nu.adot_np(bg_nu.a_of_t_np(t)))  # noqa: E731
    dt = eps * t0
    addot_fd = (adot(t0 + dt) - adot(t0 - dt)) / (2 * dt)
    assert np.isclose(addot_fd, float(bg_nu.addot_np(a0)), rtol=1e-3)


def test_overflow_budget_guard_grows():
    """Simulation._check_overflow_budgets must react to counters beyond
    the static budgets (previously discarded)."""
    from concept_tpu.sim import Simulation, SimConfig
    from concept_tpu.components import ComponentSpec
    from concept_tpu.cosmology.background import Background

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.3)
    spec = ComponentSpec(name="m", species="matter", N=64, mass=1.0,
                         forces=(("gravity", "p3m"),))
    sim = Simulation(spec, SimConfig(boxsize=BOX, potential_gridsize=8,
                                     method="p3m"), bg)
    budget_sr = sim._sr_max_overflow
    sim._pending_aux = (jnp.asarray(budget_sr + 5), jnp.asarray(0))
    sim._check_overflow_budgets()
    assert sim._sr_max_overflow > budget_sr
    budget_pm = sim._pm_max_overflow
    sim._pending_aux = (jnp.asarray(0), jnp.asarray(budget_pm + 7))
    sim._check_overflow_budgets()
    assert sim._pm_max_overflow > budget_pm
