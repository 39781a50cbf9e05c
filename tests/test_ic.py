"""IC generator tests — the analogue of reference test/lpt: LPT orders
validated against closed-form perturbation theory.

The 2LPT check is non-circular: for two orthogonal plane waves
δ₁ = d₁cos(k₁x) + d₂cos(k₂y), second-order PT gives the cross mode
δ₂(k₁±k₂) with the standard F2 kernel, F2(k⊥k', |k|=|k'|) = 5/7 in EdS
— so the measured (k₁,k₂,0) mode amplitude of the displaced particles
must be (5/7)d₁d₂ (it would be d₁d₂/2 for 1LPT-only and (2/7)d₁d₂ for a
sign-flipped Ψ²)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.components import ComponentSpec
from concept_tpu.ic import realize_particles, generate_primordial_noise

H0 = 67 * units.km / (units.s * units.Mpc)
BOX = 100 * units.Mpc
NG = 32
N = NG**3


@pytest.fixture(scope="module")
def lin_eds():
    # EdS: D2/D1² = 3/7 exactly
    bg = Background(H0=H0, Omega_m=1.0)
    prim = PrimordialSpectrum(pivot=0.05 / units.Mpc)
    return LinearCosmology(bg, prim, Omega_b=0.049, Omega_cdm=0.951,
                           light_speed=constants.light_speed, Mpc=units.Mpc)


def crossed_wave_delta_k(d1, d2, m1=2, m2=3):
    """δ(k) (DFT normalisation) of d1·cos(k1·x)+d2·cos(k2·y) sampled at
    cell centers."""
    n = NG
    slab = np.zeros((n, n, n // 2 + 1), dtype=np.complex64)
    # cos(k x) at cell centers x=(i+½)h: DFT coefficient at mode m is
    # (N/2)·e^{i·π·m/n} per full-axis pair; with our index↔cell-center
    # labeling the realize machinery treats index i as the sample point, so
    # a pure cos in 'index space' is what displacement_from_delta expects.
    slab[m1, 0, 0] = 0.5 * d1 * n**3
    slab[-m1, 0, 0] = 0.0  # not stored in rfft layout (kk=0, ki>0 row holds it)
    slab[0, m2, 0] = 0.5 * d2 * n**3
    # Hermitian counterparts on the kk=0 plane:
    slab[n - m1, 0, 0] = 0.5 * d1 * n**3
    slab[0, n - m2, 0] = 0.5 * d2 * n**3
    return jnp.asarray(slab)


def mode_amplitude(pos, kvec):
    x = np.asarray(pos, dtype=np.float64)
    phase = x @ np.asarray(kvec)
    return 2 * abs(np.exp(-1j * phase).sum()) / len(x)


@pytest.mark.parametrize("lpt_order,expected_frac", [(1, 0.5), (2, 5 / 7)])
def test_lpt_cross_mode(lin_eds, lpt_order, expected_frac):
    d1, d2 = 0.01, 0.012
    m1, m2 = 2, 3
    delta_k = crossed_wave_delta_k(d1, d2, m1, m2)
    spec = ComponentSpec(name="m", species="matter", N=N, mass=1.0)
    a = 0.1
    state = realize_particles(
        lin_eds, spec, BOX, a, lpt_order=lpt_order, delta_k=delta_k,
    )
    k1 = 2 * math.pi * m1 / BOX
    k2 = 2 * math.pi * m2 / BOX
    # fundamental modes present at right amplitude
    assert math.isclose(
        mode_amplitude(state.pos, [k1, 0, 0]), d1, rel_tol=2e-2
    )
    # cross mode (k1, k2, 0)
    amp = mode_amplitude(state.pos, [k1, k2, 0])
    assert math.isclose(amp, expected_frac * d1 * d2, rel_tol=8e-2), (
        lpt_order, amp / (d1 * d2)
    )


def test_noise_statistics():
    """White primordial noise: ⟨|R(k)|²⟩ = N_cells (reference deterministic
    PRNG streams, ic.py:928-1198)."""
    R = generate_primordial_noise(32, seed=3)
    power = float(jnp.mean(jnp.abs(R[1:, 1:, 1:]) ** 2))
    assert abs(power / 32**3 - 1) < 0.05


def test_noise_deterministic():
    R1 = generate_primordial_noise(16, seed=5)
    R2 = generate_primordial_noise(16, seed=5)
    np.testing.assert_array_equal(np.asarray(R1), np.asarray(R2))
    R3 = generate_primordial_noise(16, seed=6)
    assert not np.allclose(np.asarray(R1), np.asarray(R3))


def test_fixed_amplitude():
    R = generate_primordial_noise(16, seed=1, fixed_amplitude=True)
    mags = np.abs(np.asarray(R))
    inner = mags[1:8, 1:8, 1:7]
    np.testing.assert_allclose(inner, math.sqrt(16**3), rtol=1e-5)


def test_paired_phase_shift():
    R1 = generate_primordial_noise(16, seed=1, fixed_amplitude=True)
    R2 = generate_primordial_noise(16, seed=1, fixed_amplitude=True,
                                   phase_shift=math.pi)
    np.testing.assert_allclose(
        np.asarray(R1[2, 3, 4]), -np.asarray(R2[2, 3, 4]), rtol=1e-4
    )


def test_bcc_lattice_count():
    from concept_tpu.components import lattice_positions

    pos = lattice_positions(8, BOX, "bcc")
    assert pos.shape == (2 * 8**3, 3)
    pos_fcc = lattice_positions(8, BOX, "fcc")
    assert pos_fcc.shape == (4 * 8**3, 3)


def test_distributed_noise_gridsize_invariant():
    """Mode-indexed ('distributed') noise: shared integer modes identical
    across grid sizes (the reference's gridsize/nprocs-invariant
    imprinting, ic.py:928-1198)."""
    from concept_tpu.ic import generate_primordial_noise

    R16 = np.asarray(generate_primordial_noise(16, seed=4, scheme="distributed"))
    R32 = np.asarray(generate_primordial_noise(32, seed=4, scheme="distributed"))
    # compare a set of low-k modes (ki,kj in [-4,4], kk in [0,4]);
    # R carries the √(n³) DFT normalisation (⟨|R|²⟩ = n³), so the
    # gridsize-invariant quantity is R/√(n³)
    for ki in range(-4, 5):
        for kj in range(-4, 5):
            for kk in range(0, 5):
                v16 = R16[ki % 16, kj % 16, kk] / 16**1.5
                v32 = R32[ki % 32, kj % 32, kk] / 32**1.5
                assert np.allclose(v16, v32, rtol=1e-4), (ki, kj, kk, v16, v32)
    # normalisation differs: ⟨|R|²⟩ = n³ each — rescale check
    np.testing.assert_allclose(
        np.mean(np.abs(R16[1:8, 1:8, 1:7]) ** 2) / 16**3, 1.0, rtol=0.2
    )


def test_distributed_noise_hermitian():
    """kk=0 plane must satisfy R(-k) = conj(R(k)) so the field is real."""
    from concept_tpu.ic import generate_primordial_noise
    from concept_tpu.grid.fft import irfft3, rfft3
    import jax.numpy as jnp

    n = 16
    R = generate_primordial_noise(n, seed=2, scheme="distributed")
    Rn = np.asarray(R)
    for ki in range(1, n // 2):
        for kj in range(1, n // 2):
            assert np.allclose(
                Rn[(-ki) % n, (-kj) % n, 0], np.conj(Rn[ki, kj, 0]), rtol=1e-5
            ), (ki, kj)
    # round trip through real space preserves the field (true Hermitian)
    field = irfft3(R, n)
    R2 = rfft3(field)
    np.testing.assert_allclose(np.asarray(R2), Rn, atol=1e-2 * np.abs(Rn).max())


def test_distributed_noise_statistics():
    from concept_tpu.ic import generate_primordial_noise

    n = 32
    R = np.asarray(generate_primordial_noise(n, seed=7, scheme="distributed"))
    inner = R[:, :, 1:15]  # away from self-conjugate planes
    power = np.mean(np.abs(inner) ** 2) / n**3
    assert abs(power - 1) < 0.05
    # phases uniform: mean ≈ 0
    assert abs(np.mean(inner.real)) < 0.05 * np.sqrt(n**3)


class TestNoiseSpectralQuality:
    """Spectral whiteness of the counter-based hash noise (VERDICT weak
    12: a weak hash RNG can imprint lattice artifacts in the ICs; the
    reference uses PCG64DXSM streams).  The primordial unit-noise field
    must be white: flat band power with no axis anisotropy."""

    def test_noise_is_white_and_isotropic(self):
        import jax.numpy as jnp
        import numpy as np
        from concept_tpu.ic import generate_primordial_noise
        from concept_tpu.grid import fourier

        n = 48
        slab = generate_primordial_noise(n, seed=3, scheme='distributed')
        slab = slab / jnp.sqrt(jnp.asarray(float(n**3)))  # ⟨|R|²⟩ = N_cells
        p2 = np.asarray(jnp.abs(slab) ** 2)
        mult = np.broadcast_to(
            np.asarray(fourier.hermitian_multiplicity(n)), p2.shape
        )
        k2 = np.broadcast_to(np.asarray(fourier.k2_int_grid(n)), p2.shape)
        sel = (k2 > 0)
        # ⟨|δ|²⟩ = 1 per mode: global mean within chi2 scatter
        mean = np.average(p2[sel], weights=mult[sel])
        n_modes = mult[sel].sum()
        assert abs(mean - 1.0) < 5 / np.sqrt(n_modes), mean
        # band flatness: 4 radial bands each consistent with white
        kmag = np.sqrt(k2)
        for lo, hi in [(1, 8), (8, 16), (16, 24), (24, 33)]:
            bsel = sel & (kmag >= lo) & (kmag < hi)
            w = mult[bsel]
            m = np.average(p2[bsel], weights=w)
            assert abs(m - 1.0) < 6 / np.sqrt(w.sum()), (lo, hi, m)
        # axis anisotropy: power on each coordinate axis matches the
        # global mean (a weak hash correlates along the packing axes)
        ki, kj, kk = (np.asarray(v) for v in fourier.k_int_vectors(n))
        KI = np.broadcast_to(ki, p2.shape)
        KJ = np.broadcast_to(kj, p2.shape)
        KK = np.broadcast_to(kk, p2.shape)
        for axis_sel in (
            (KJ == 0) & (KK == 0) & (KI != 0),
            (KI == 0) & (KK == 0) & (KJ != 0),
            (KI == 0) & (KJ == 0) & (KK != 0),
        ):
            w = mult[axis_sel]
            m = np.average(p2[axis_sel], weights=w)
            assert abs(m - 1.0) < 6 / np.sqrt(w.sum()), m

    def test_neighbor_mode_correlation_negligible(self):
        import jax.numpy as jnp
        import numpy as np
        from concept_tpu.ic import generate_primordial_noise

        n = 48
        slab = np.asarray(generate_primordial_noise(n, seed=5, scheme='distributed')) / np.sqrt(float(n**3))
        # correlation of adjacent modes along the fastest-varying packing
        # axis (where multiplicative hash streaks would show)
        a = slab[..., :-1].reshape(-1)
        b = slab[..., 1:].reshape(-1)
        num = np.abs(np.mean(a * np.conj(b)))
        den = np.sqrt(np.mean(np.abs(a) ** 2) * np.mean(np.abs(b) ** 2))
        assert num / den < 0.01, num / den


def test_backscale_realization():
    """realization_options 'backscale': z=0 spectrum scaled back by
    D1(a)/D1(1).  On the scale-independent-growth EH backend this must
    reproduce the a-epoch realization to roundoff — validating both the
    plumbing and the D1(a_today)=1 normalization (reference
    realization_options 'backscale', ic.py:1199)."""
    from concept_tpu.units import units, constants
    from concept_tpu.cosmology.background import Background
    from concept_tpu.cosmology.primordial import PrimordialSpectrum
    from concept_tpu.cosmology.linear import LinearCosmology
    from concept_tpu.components import ComponentSpec
    from concept_tpu.ic import realize_particles

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    lin = LinearCosmology(
        bg, PrimordialSpectrum(A_s=2.1e-9, n_s=0.96), Omega_b=0.049,
        Omega_cdm=0.27, light_speed=constants.light_speed, Mpc=units.Mpc,
    )
    box = 64 * units.Mpc
    spec = ComponentSpec(name="m", species="matter", N=8**3, mass=1.0)
    st0 = realize_particles(lin, spec, box, 0.02, seed=0)
    st1 = realize_particles(lin, spec, box, 0.02, seed=0, backscale=True)
    d = np.abs(np.asarray(st0.pos) - np.asarray(st1.pos))
    d = np.minimum(d, box - d)
    assert d.max() / box < 1e-6, d.max()
