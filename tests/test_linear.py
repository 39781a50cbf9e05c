"""Linear cosmology layer tests (analogue of reference test/realize and
σ-based checks in test/powerspec)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology


@pytest.fixture(scope="module")
def lin():
    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96, pivot=0.05 / units.Mpc)
    return LinearCosmology(
        bg, prim, Omega_b=0.049, Omega_cdm=0.27,
        light_speed=constants.light_speed, Mpc=units.Mpc,
    )


def test_h_inference(lin):
    assert math.isclose(lin.h_value, 0.67, rel_tol=1e-10)


def test_transfer_normalisation(lin):
    # T(k) → 1 for k → 0
    T = float(lin.transfer_T(jnp.asarray(1e-5 / units.Mpc)))
    assert math.isclose(T, 1.0, rel_tol=1e-3)
    # monotone suppression at high k
    T_hi = float(lin.transfer_T(jnp.asarray(10.0 / units.Mpc)))
    assert 0 < T_hi < 1e-3


def test_sigma8_planck_like(lin):
    # CLASS/CAMB give σ8 ≈ 0.83 for these parameters; EH98 is good to a few %.
    s8 = lin.sigma8()
    assert 0.78 < s8 < 0.89


def test_power_growth_scaling(lin):
    # P(k, a) ∝ D1(a)² at fixed k
    k = jnp.asarray(0.1 / units.Mpc)
    P1 = float(lin.power_delta(k, 1.0))
    P05 = float(lin.power_delta(k, 0.5))
    D1 = float(lin.bg.growth_np("D1", 0.5))
    assert math.isclose(P05 / P1, D1**2, rel_tol=1e-3)


def test_theta_relation(lin):
    # θ = -a H f1 δ
    k = jnp.asarray(0.05 / units.Mpc)
    a = 0.3
    ratio = float(lin.transfer_theta(k, a) / lin.transfer_delta(k, a))
    expected = -a * float(lin.bg.hubble_np(a)) * float(lin.bg.growth_np("f1", a))
    assert math.isclose(ratio, expected, rel_tol=1e-4)


def test_bao_wiggles_present(lin):
    # The full EH transfer has acoustic oscillations: the ratio to the
    # no-wiggle form must cross 1 several times in 0.05-0.3 Mpc^-1.
    from concept_tpu.cosmology.transfer import EisensteinHuNoWiggle

    nw = EisensteinHuNoWiggle(0.319, 0.049, 0.67, Mpc=units.Mpc)
    k = jnp.asarray(np.linspace(0.05, 0.3, 200) / units.Mpc)
    ratio = np.asarray(lin.transfer_T(k)) / np.asarray(nw(k))
    crossings = np.sum(np.diff(np.sign(ratio - np.mean(ratio))) != 0)
    assert crossings >= 4
