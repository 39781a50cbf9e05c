"""Massive-ν background thermodynamics tests (Fermi-Dirac integrals —
the reference gets these from CLASS)."""

import math

import numpy as np
import pytest

from concept_tpu.cosmology.neutrino import (
    NeutrinoBackground, fermi_dirac_F, fermi_dirac_G, K_B_EV, T_NU0,
)


def test_massless_limits():
    # F(0) = 7π⁴/120, G(0) = F(0) → w = 1/3
    F0 = float(fermi_dirac_F(0.0))
    G0 = float(fermi_dirac_G(0.0))
    assert math.isclose(F0, 7 * math.pi**4 / 120, rel_tol=1e-5)
    assert math.isclose(G0 / (3 * F0), 1 / 3, rel_tol=1e-6)


def test_w_evolution():
    nu = NeutrinoBackground(m_nu_eV=0.1)
    # deep radiation era: w = 1/3
    assert math.isclose(nu.w(1e-7), 1 / 3, rel_tol=1e-3)
    # today, 0.1 eV is very non-relativistic: w ≪ 1
    assert nu.w(1.0) < 5e-3
    # w decreases monotonically
    a = np.logspace(-6, 0, 50)
    w = nu.w(a)
    assert np.all(np.diff(w) <= 1e-10)


def test_w_eff_defining_identity():
    """w_eff is defined so ϱ ≡ a^{3(1+w_eff)}ρ is constant (anchored at
    a=1): a^{−3(1+w_eff(a))} must reproduce ρ(a)/ρ(1) from the exact FD
    integrals (reference species.py:2940-3526 semantics)."""
    m = 0.05
    nu = NeutrinoBackground(m_nu_eV=m)
    for a in (1e-3, 1e-2, 0.1, 0.5):
        y_a = m * a / (K_B_EV * T_NU0)
        y_1 = m / (K_B_EV * T_NU0)
        rho_ratio = a**-4 * float(fermi_dirac_F(y_a)) / float(fermi_dirac_F(y_1))
        model = a ** (-3 * (1 + nu.w_eff(a)))
        assert math.isclose(model, rho_ratio, rel_tol=2e-2), (a, model, rho_ratio)
    # and w_eff ≤ w for a decreasing w(a) (it averages the later, smaller w)
    for a in (1e-4, 1e-2, 0.5):
        assert nu.w_eff(a) <= nu.w(a) + 1e-6


def test_omega_nu_nonrelativistic():
    # Ω_ν h² → Σm/93.14 eV for heavy ν (standard cosmology result)
    nu = NeutrinoBackground(m_nu_eV=0.3, N_nu=1)
    expected = 0.3 / 93.14
    assert math.isclose(nu.omega_nu_h2(), expected, rel_tol=0.03)
    nu3 = NeutrinoBackground(m_nu_eV=0.1, N_nu=3)
    assert math.isclose(nu3.omega_nu_h2(), 0.3 / 93.14, rel_tol=0.05)
