"""Background / Friedmann tests — the analogue of the reference's
``friedmann`` test (reference test/friedmann)."""

import math

import numpy as np
import pytest

from concept_tpu.units import units
from concept_tpu.cosmology.background import Background


H0 = 67 * units.km / (units.s * units.Mpc)


@pytest.fixture(scope="module")
def eds():
    return Background(H0=H0, Omega_m=1.0)


@pytest.fixture(scope="module")
def lcdm():
    return Background(H0=H0, Omega_m=0.319)


def test_eds_age(eds):
    # Einstein-de Sitter: t(a=1) = 2/(3 H0)
    assert math.isclose(eds.t_today, 2 / (3 * H0), rel_tol=1e-8)


def test_eds_a_of_t(eds):
    # a(t) = (3 H0 t / 2)^(2/3)
    t = 0.3 * eds.t_today
    a_expected = (1.5 * H0 * t) ** (2 / 3)
    assert math.isclose(float(eds.a_of_t_np(t)), a_expected, rel_tol=1e-6)
    # Round trip
    assert math.isclose(float(eds.t_of_a_np(a_expected)), t, rel_tol=1e-6)


def test_eds_growth(eds):
    # D1 ∝ a in EdS; normalised D1(1)=1 → D1(a)=a
    for a in (0.01, 0.1, 0.5, 1.0):
        assert math.isclose(float(eds.growth_np("D1", a)), a, rel_tol=1e-5)
    # f1 = 1 in EdS
    assert math.isclose(float(eds.growth_np("f1", 0.3)), 1.0, rel_tol=1e-5)
    # 2LPT: D2 = 3/7 a² (with the reference's sign convention D2 > 0,
    # reference integration.py:1215-1222)
    assert math.isclose(float(eds.growth_np("D2", 0.5)), 3 / 7 * 0.25, rel_tol=1e-4)


def test_lcdm_growth_rate(lcdm):
    # Ωm=0.319 ΛCDM: f1(a=1) ≈ Ωm(a=1)^0.55 ≈ 0.525
    f1 = float(lcdm.growth_np("f1", 1.0))
    assert math.isclose(f1, 0.319**0.55, rel_tol=2e-2)


def test_lcdm_hubble(lcdm):
    a = 0.5
    expected = H0 * math.sqrt(0.319 / a**3 + 1 - 0.319)
    assert math.isclose(float(lcdm.hubble_np(a)), expected, rel_tol=1e-12)


def test_integrals_eds(eds):
    # In EdS, with a = (3H0 t/2)^(2/3):
    # ∫ a^-2 dt over [t1,t2] = ∫ (3H0t/2)^(-4/3) dt  — closed form.
    t1 = 0.1 * eds.t_today
    t2 = 0.11 * eds.t_today
    k = (1.5 * H0) ** (-4 / 3)
    exact = k * (-3) * (t2 ** (-1 / 3) - t1 ** (-1 / 3))
    got = eds.integrals_np(t1, t2)["a**(-2)"]
    assert math.isclose(got, exact, rel_tol=1e-9)
    # trivial key
    assert math.isclose(eds.integrals_np(t1, t2)["1"], t2 - t1, rel_tol=1e-12)


def test_integrals_jax_matches_np(lcdm):
    t1 = 0.2 * lcdm.t_today
    t2 = 0.21 * lcdm.t_today
    jx = lcdm.integrals(t1, t2)
    np_ = lcdm.integrals_np(t1, t2)
    for key in np_:
        # Device default is float32: spline evaluation agrees to ~1e-4
        assert np.isclose(float(jx[key]), np_[key], rtol=2e-4)


def test_static_universe():
    bg = Background(H0=H0, Omega_m=1.0, enable_Hubble=False)
    out = bg.integrals_np(1.0, 3.5)
    assert math.isclose(out["a**(-2)"], 2.5, rel_tol=1e-12)
    assert out["ȧ/a"] == 0.0
