"""PP and P³M force tests — analogues of reference test/kick_pp_without_ewald,
test/kick_pp_with_ewald and the P³M-vs-PP consistency implied by
test/concept_vs_gadget_p3m."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.forces.pp import pp_momentum_updates, make_ewald_table
from concept_tpu.forces.shortrange import (
    shortrange_momentum_updates, cell_grid_shape,
)
from concept_tpu.forces import pm as pm_force

G = constants.G_Newton
BOX = 100 * units.Mpc


def test_two_particle_direct_force():
    """Non-periodic PP: Δmom = G m²/r²·ᔑdt along the separation."""
    m = 5.0
    r = 10 * units.Mpc
    pos = jnp.asarray([[10.0, 50.0, 50.0], [10.0 + r, 50.0, 50.0]], jnp.float32)
    dt = 0.1
    dmom = pp_momentum_updates(pos, m, BOX, dt, G, periodic=False)
    expected = G * m * m / r**2 * dt
    assert np.isclose(float(dmom[0, 0]), expected, rtol=1e-5)
    assert np.isclose(float(dmom[1, 0]), -expected, rtol=1e-5)
    assert np.allclose(np.asarray(dmom[:, 1:]), 0.0, atol=1e-12)


def test_two_particle_ewald_force():
    """Periodic PP: for small separation the Ewald correction is small but
    nonzero; total attraction slightly weaker than direct (images pull
    back symmetrically)."""
    table = make_ewald_table(32)
    m = 1.0
    r = 5 * units.Mpc
    pos = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]], jnp.float32)
    dmom = pp_momentum_updates(pos, m, BOX, 1.0, G, ewald_table=table, periodic=True)
    direct = G * m * m / r**2
    ratio = float(dmom[0, 0]) / direct
    # Known Ewald behavior: correction ~ +(4π/3)(r³/L³)-ish reduction
    assert 0.9 < ratio < 1.0
    # Newton's 3rd law incl. correction
    np.testing.assert_allclose(
        np.asarray(dmom[0]), -np.asarray(dmom[1]),
        atol=1e-5 * abs(float(dmom[0, 0])),
    )


def test_ewald_force_antisymmetric_across_box():
    """A particle at exactly half-box separation feels zero net force."""
    table = make_ewald_table(32)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [BOX / 2, 0.0, 0.0]], jnp.float32)
    dmom = pp_momentum_updates(pos, 1.0, BOX, 1.0, G, ewald_table=table, periodic=True)
    fmax = G / (BOX / 2) ** 2
    assert abs(float(dmom[0, 0])) < 0.05 * fmax


def test_p3m_matches_pp():
    """P³M (PM long-range + cell-list short-range) must reproduce the exact
    Ewald PP force for a random configuration — the backbone of P³M
    correctness (reference gravity split, gravity.py:263 +
    interactions.py:2102-2113)."""
    rng = np.random.default_rng(11)
    N = 2048
    pos = jnp.asarray(rng.uniform(0, BOX, (N, 3)).astype(np.float32))
    m = 3.0
    gridsize = 32
    scale = 1.25 * BOX / gridsize
    cutoff = 4.5 * scale
    # PP exact
    table = make_ewald_table(64)
    dmom_pp = pp_momentum_updates(pos, m, BOX, 1.0, G, ewald_table=table, periodic=True)
    # P3M long
    (dmom_long,) = pm_force.pm_gravity_momentum_updates(
        [pos], [m], gridsize, BOX, G, kick_integral=1.0,
        order=2, longrange_scale=scale, interlace=True,
    )
    # P3M short
    n_cells = cell_grid_shape(BOX, cutoff)
    capacity = max(32, int(8 * N / n_cells**3))
    dmom_short = shortrange_momentum_updates(
        pos, m, BOX, scale, cutoff, 1.0,
        n_cells=n_cells, capacity=capacity, G=G,
    )
    dmom_p3m = np.asarray(dmom_long) + np.asarray(dmom_short)
    dmom_pp = np.asarray(dmom_pp)
    # rms force error relative to rms force (PM mesh error dominates)
    rms_err = np.sqrt(np.mean((dmom_p3m - dmom_pp) ** 2))
    rms = np.sqrt(np.mean(dmom_pp**2))
    assert rms_err / rms < 0.05, f"P3M vs PP rms error {rms_err/rms:.3f}"


def test_shortrange_newton3():
    rng = np.random.default_rng(3)
    N = 512
    pos = jnp.asarray(rng.uniform(0, BOX, (N, 3)).astype(np.float32))
    scale = 5 * units.Mpc
    dmom = shortrange_momentum_updates(
        pos, 1.0, BOX, scale, 4.5 * scale, 1.0,
        n_cells=cell_grid_shape(BOX, 4.5 * scale), capacity=256, G=G,
    )
    total = np.asarray(jnp.sum(dmom, axis=0))
    scale_f = float(jnp.mean(jnp.abs(dmom))) * N
    assert np.all(np.abs(total) < 1e-3 * scale_f)


def test_native_ewald_matches_numpy():
    """Native (C++/OpenMP) Ewald tabulator agrees with the NumPy reference
    implementation when built (csrc/ewald.cpp)."""
    from concept_tpu.native import have_native, ewald_acceleration
    from concept_tpu.forces.ewald import ewald_acceleration_np

    if not have_native():
        pytest.skip("native library not built (run `make native`)")
    pts = np.random.default_rng(1).uniform(-0.5, 0.5, (64, 3))
    a1 = ewald_acceleration(pts, 2.0, 4, 40)
    a2 = ewald_acceleration_np(pts, 2.0, 4, 40)
    np.testing.assert_allclose(a1, a2, rtol=1e-10)
