"""Paired-and-fixed simulations: variance suppression check (reference
primordial_amplitude_fixed / primordial_phase_shift, ic.py:1058-1105).

The mean of the power spectra of a fixed-amplitude pair (phases φ and
φ+π) has dramatically reduced realization scatter relative to a single
Gaussian realization — at the IC level the fixed-amplitude spectrum is
exactly the ensemble mean (no |R|² fluctuations at all)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.ic import realize_delta_slab
from concept_tpu.grid import fourier


@pytest.fixture(scope="module")
def lin():
    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96, pivot=0.05 / units.Mpc)
    return LinearCosmology(bg, prim, Omega_b=0.049, Omega_cdm=0.27,
                           light_speed=constants.light_speed, Mpc=units.Mpc)


def mode_power(slab, n, box):
    k2 = np.asarray(fourier.k2_int_grid(n))
    p2 = np.abs(np.asarray(slab)) ** 2
    sel = (k2 > 4) & (k2 < 64)
    return p2[sel], k2[sel]


def test_fixed_amplitude_zero_scatter(lin):
    """Fixed-amplitude δ(k): |δ| is deterministic per mode → the binned
    spectrum has no realization scatter."""
    n, box = 32, 512 * units.Mpc
    a = 0.1
    s1 = realize_delta_slab(lin, n, box, a, seed=1, fixed_amplitude=True)
    s2 = realize_delta_slab(lin, n, box, a, seed=2, fixed_amplitude=True)
    p1, _ = mode_power(s1, n, box)
    p2, _ = mode_power(s2, n, box)
    np.testing.assert_allclose(p1, p2, rtol=1e-3)
    # whereas Gaussian realizations fluctuate strongly per mode
    g1 = realize_delta_slab(lin, n, box, a, seed=1)
    g2 = realize_delta_slab(lin, n, box, a, seed=2)
    q1, _ = mode_power(g1, n, box)
    q2, _ = mode_power(g2, n, box)
    assert np.std(q1 / q2) > 0.5


def test_pair_is_anticorrelated(lin):
    """The π-shifted partner has δ_pair(k) = −δ(k): the cross spectrum is
    exactly −P (maximal anticorrelation — the variance-cancellation
    mechanism)."""
    n, box = 32, 512 * units.Mpc
    a = 0.1
    s1 = realize_delta_slab(lin, n, box, a, seed=3, fixed_amplitude=True)
    s2 = realize_delta_slab(lin, n, box, a, seed=3, fixed_amplitude=True,
                            phase_shift=math.pi)
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    k2 = np.asarray(fourier.k2_int_grid(n))
    sel = (k2 > 4) & (k2 < 64)
    cross = np.real(s1[sel] * np.conj(s2[sel]))
    auto = np.abs(s1[sel]) ** 2
    np.testing.assert_allclose(cross, -auto, rtol=1e-3)
