"""3LPT + Orszag dealiasing tests (reference ic.py:1621-1845, test/lpt).

Validation strategy (non-circular where feasible):
  * 1D purity: for a single plane wave the Zel'dovich solution is exact,
    so ALL higher-order displacements must vanish identically.
  * amplitude scaling: Ψ³ = pos(3LPT) − pos(2LPT) is cubic in the IC
    amplitude — doubling the amplitude must scale the residual by 8.
  * dealiasing: the (previously ignored) flag changes the realized
    positions and leaves the fundamental modes intact.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.components import ComponentSpec
from concept_tpu.ic import realize_particles

H0 = 67 * units.km / (units.s * units.Mpc)
BOX = 100 * units.Mpc
NG = 16
N = NG**3


@pytest.fixture(scope="module")
def lin_eds():
    bg = Background(H0=H0, Omega_m=1.0)
    prim = PrimordialSpectrum(pivot=0.05 / units.Mpc)
    return LinearCosmology(bg, prim, Omega_b=0.049, Omega_cdm=0.951,
                           light_speed=constants.light_speed, Mpc=units.Mpc)


def plane_wave_delta_k(d1, m1=2, axis=0):
    n = NG
    slab = np.zeros((n, n, n // 2 + 1), dtype=np.complex64)
    idx = [0, 0, 0]
    idx[axis] = m1
    slab[tuple(idx)] = 0.5 * d1 * n**3
    if axis != 2:
        idx[axis] = n - m1
        slab[tuple(idx)] = 0.5 * d1 * n**3
    return jnp.asarray(slab)


def crossed_wave_delta_k(d1, d2, m1=2, m2=3):
    n = NG
    slab = np.zeros((n, n, n // 2 + 1), dtype=np.complex64)
    slab[m1, 0, 0] = 0.5 * d1 * n**3
    slab[0, m2, 0] = 0.5 * d2 * n**3
    slab[n - m1, 0, 0] = 0.5 * d1 * n**3
    slab[0, n - m2, 0] = 0.5 * d2 * n**3
    return jnp.asarray(slab)


def _realize(lin, delta_k, lpt_order, dealias=False, a=0.1):
    spec = ComponentSpec(name="m", species="matter", N=N, mass=1.0)
    return realize_particles(lin, spec, BOX, a, lpt_order=lpt_order,
                             delta_k=delta_k, dealias=dealias)


def test_3lpt_vanishes_for_plane_wave(lin_eds):
    """Zel'dovich is exact in 1D: 2LPT and 3LPT corrections ≡ 0."""
    dk = plane_wave_delta_k(0.05)
    p1 = np.asarray(_realize(lin_eds, dk, 1).pos)
    p3 = np.asarray(_realize(lin_eds, dk, 3).pos)
    assert np.abs(p3 - p1).max() < 1e-4 * BOX / NG


def test_3lpt_scaling_is_cubic(lin_eds):
    """pos(3LPT) − pos(2LPT) scales as amplitude³.

    Amplitudes are chosen so the cubic displacement sits well above the
    float32 position quantum (BOX·2⁻²³ ≈ 1e-5·BOX) yet stays perturbative.
    """
    m1, m2 = 2, 3
    res = {}
    for eps in (0.06, 0.12):
        dk = crossed_wave_delta_k(eps, eps, m1, m2)
        p2 = np.asarray(_realize(lin_eds, dk, 2).pos)
        p3 = np.asarray(_realize(lin_eds, dk, 3).pos)
        r = p3 - p2
        r -= BOX * np.round(r / BOX)
        res[eps] = np.sqrt((r**2).mean())
    assert res[0.12] > 10 * BOX / 2**23  # resolvable 3rd-order signal
    ratio = res[0.12] / res[0.06]
    assert 6.5 < ratio < 9.5, ratio  # ε³ scaling (8 exactly)


def test_3lpt_preserves_fundamental_modes(lin_eds):
    """3LPT only adds higher-order couplings: the linear modes stay."""
    d1, d2, m1, m2 = 0.01, 0.012, 2, 3
    dk = crossed_wave_delta_k(d1, d2, m1, m2)
    st = _realize(lin_eds, dk, 3)
    x = np.asarray(st.pos, np.float64)
    k1 = 2 * math.pi * m1 / BOX
    amp = 2 * abs(np.exp(-1j * (x @ np.array([k1, 0, 0]))).sum()) / len(x)
    assert math.isclose(amp, d1, rel_tol=2e-2)


def test_dealias_flag_is_honored(lin_eds):
    """dealias=True runs the padded-product path and changes the result
    (the flag was parsed-and-ignored in round 1); fundamental modes are
    unaffected (dealiasing only removes spurious high-k products)."""
    rng = np.random.default_rng(3)
    n = NG
    # broadband small-amplitude noise field
    grid = 0.02 * rng.standard_normal((n, n, n)).astype(np.float32)
    dk = jnp.asarray(np.fft.rfftn(grid))
    p_off = np.asarray(_realize(lin_eds, dk, 2, dealias=False).pos)
    p_on = np.asarray(_realize(lin_eds, dk, 2, dealias=True).pos)
    diff = np.abs(p_on - p_off)
    diff = np.minimum(diff, BOX - diff)
    assert diff.max() > 0  # changed something
    # but the two agree to leading order (the aliased power is a small
    # correction for a small-amplitude field)
    assert diff.max() < 0.1 * BOX / NG
