"""Massive-neutrino linear theory — the analogue of reference
test/neutrino (P(k) suppression vs expectation, rel_tol 0.04-0.11,
test/neutrino/analyze.py:165-203)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology


H0 = 67 * units.km / (units.s * units.Mpc)


def make_lin(Omega_nu):
    Ob, Ocdm = 0.049, 0.27 - Omega_nu
    bg = Background(H0=H0, Omega_m=Ob + Ocdm + Omega_nu)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96, pivot=0.05 / units.Mpc)
    return LinearCosmology(
        bg, prim, Omega_b=Ob, Omega_cdm=Ocdm, Omega_nu=Omega_nu,
        light_speed=constants.light_speed, Mpc=units.Mpc,
    )


def test_nu_suppression_small_scales():
    """Total-matter P(k) suppression at small scales ≈ −8 f_ν (linear,
    standard result; the EH99 fit reproduces it)."""
    f_nu = 0.02 / 0.319
    lin0 = make_lin(0.0)
    lin1 = make_lin(0.02)
    k = jnp.asarray(1.0 / units.Mpc)
    a = 1.0
    P0 = float(lin0.power_delta(k, a))
    P1 = float(lin1.power_delta(k, a, "matter"))
    suppression = 1 - P1 / P0
    assert 0.6 * 8 * f_nu < suppression < 1.2 * 8 * f_nu, suppression


def test_nu_no_suppression_large_scales():
    lin0 = make_lin(0.0)
    lin1 = make_lin(0.02)
    k = jnp.asarray(1e-4 / units.Mpc)
    P0 = float(lin0.power_delta(k, 1.0))
    P1 = float(lin1.power_delta(k, 1.0))
    assert abs(P1 / P0 - 1) < 0.05


def test_species_decomposition():
    """f_cb δ_cb + f_ν δ_ν = δ_m exactly (by construction) and
    δ_ν < δ_cb at small scales (free streaming)."""
    lin = make_lin(0.02)
    t = lin._transfer_nu
    k = jnp.asarray([0.01, 0.1, 1.0]) / units.Mpc
    a = 1.0
    d_m = np.asarray(lin.transfer_delta(k, a, "matter"))
    d_cb = np.asarray(lin.transfer_delta(k, a, "cb"))
    d_nu = np.asarray(lin.transfer_delta(k, a, "nu"))
    np.testing.assert_allclose(t.f_cb * d_cb + t.f_nu * d_nu, d_m, rtol=1e-5)
    assert d_nu[-1] < 0.5 * d_cb[-1]


def test_zero_nu_matches_base():
    lin0 = make_lin(0.0)
    k = jnp.asarray(0.1 / units.Mpc)
    # species argument is a no-op without neutrinos
    assert np.isclose(
        float(lin0.power_delta(k, 1.0)),
        float(lin0.power_delta(k, 1.0, "matter")),
    )
