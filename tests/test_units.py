"""Unit-system tests (reference parity: src/commons.py:1826-1905)."""

import math

from concept_tpu.units import UnitSystem


def test_default_basis():
    u = UnitSystem()
    assert math.isclose(u.Mpc, 1.0)
    assert math.isclose(u.Gyr, 1.0)
    assert math.isclose(10**10 * u.m_sun, 1.0)


def test_hubble_time():
    u = UnitSystem()
    H0 = 67 * u.km / (u.s * u.Mpc)
    # 1/H0 = 9.78/h Gyr ≈ 14.60 Gyr for h = 0.67
    assert math.isclose(1 / H0, 9.778 / 0.67, rel_tol=1e-3)


def test_G_newton():
    u = UnitSystem()
    G = u.constants().G_Newton
    # G = 4.30091e-9 Mpc (km/s)^2 / m_sun
    G_check = 4.30091e-9 * u.Mpc * (u.km / u.s) ** 2 / u.m_sun
    assert math.isclose(G, G_check, rel_tol=1e-4)


def test_alternate_basis():
    u = UnitSystem(unit_length="kpc", unit_time="Myr", unit_mass="m_sun")
    assert math.isclose(u.kpc, 1.0)
    assert math.isclose(u.Myr, 1.0)
    assert math.isclose(u.m_sun, 1.0)
    # Speed of light ≈ 306.6 kpc/Myr
    c = u.constants().light_speed
    assert math.isclose(c, 306.6, rel_tol=1e-3)


def test_unicode_unit_strings():
    u = UnitSystem(unit_mass="10¹⁰ m☉")
    assert math.isclose(10**10 * u.m_sun, 1.0)
