"""Mesh-core tests — FFT round trip, distributed-vs-single-device FFT
equivalence (analogue of the reference's nprocs-invariance tests),
Fourier ops, deposit/gather.  Reference test strategy: SURVEY.md §4."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from concept_tpu.grid.fft import GridDistribution, rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.grid.interp import deposit, gather


def random_grid(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))


def test_fft_roundtrip_single():
    g = random_grid(16)
    back = irfft3(rfft3(g), 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g), atol=1e-5)


def test_fft_matches_numpy():
    g = random_grid(16)
    np.testing.assert_allclose(
        np.asarray(rfft3(g)), np.fft.rfftn(np.asarray(g)), rtol=1e-4, atol=1e-3
    )


@pytest.fixture(scope="module")
def dist8():
    devices = np.array(jax.devices()[:8])
    return GridDistribution(mesh=Mesh(devices, ("x",)), axis="x")


def test_fft_distributed_matches_single(dist8):
    n = 32
    g = random_grid(n, seed=1)
    g_sharded = jax.device_put(g, dist8.real_sharding())
    f_dist = rfft3(g_sharded, dist8)
    f_single = rfft3(g)
    np.testing.assert_allclose(
        np.asarray(f_dist), np.asarray(f_single), rtol=1e-4, atol=1e-3
    )
    back = irfft3(f_dist, n, dist8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g), atol=1e-5)


def test_laplacian_inverse():
    # ∇²φ = ρ with ρ a single mode → φ = -ρ/k²
    n, box = 32, 2.0
    kx = 2 * np.pi / box * 3  # mode ki=3
    x = (np.arange(n) + 0.5) * box / n
    rho = np.cos(kx * x)[:, None, None] * np.ones((1, n, n))
    slab = rfft3(jnp.asarray(rho, dtype=jnp.float32))
    inv = fourier.laplacian_inverse_factor(n, box)
    phi = irfft3(slab * (-inv), n)
    expected = -rho / kx**2
    np.testing.assert_allclose(np.asarray(phi), expected, atol=1e-4)


def test_fourier_diff():
    n, box = 32, 2.0
    kx = 2 * np.pi / box * 2
    x = (np.arange(n) + 0.5) * box / n
    f = np.sin(kx * x)[:, None, None] * np.ones((1, n, n))
    slab = rfft3(jnp.asarray(f, dtype=jnp.float32))
    df = irfft3(fourier.fourier_diff(slab, n, box, dim=0), n)
    expected = kx * np.cos(kx * x)[:, None, None] * np.ones((1, n, n))
    np.testing.assert_allclose(np.asarray(df), expected, atol=1e-3)


def test_copy_modes_upscale_preserves_field():
    # A smooth (low-k) field upscaled in k-space must reproduce the same
    # physical field sampled on the finer grid.
    n1, n2, box = 16, 32, 1.0
    kx = 2 * np.pi / box
    x1 = (np.arange(n1) + 0.5) * box / n1
    x2 = (np.arange(n2) + 0.5) * box / n2
    f1 = np.cos(kx * x1)[:, None, None] * np.ones((1, n1, n1))
    f2_expected = np.cos(kx * x2)[:, None, None] * np.ones((1, n2, n2))
    slab1 = rfft3(jnp.asarray(f1, dtype=jnp.float32))
    slab2 = fourier.copy_modes(slab1, n1, n2)
    f2 = irfft3(slab2, n2)
    np.testing.assert_allclose(np.asarray(f2), f2_expected, atol=1e-4)


def test_hermitian_multiplicity_counts_all_modes():
    n = 8
    w = fourier.hermitian_multiplicity(n)
    total = float(jnp.sum(jnp.broadcast_to(w, (n, n, n // 2 + 1))))
    assert total == n**3


@pytest.mark.parametrize("order", [1, 2, 3, 4])
@pytest.mark.parametrize("method", ["scatter", "sort", "sorted"])
def test_deposit_mass_conservation(order, method):
    n, box = 16, 100.0
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(0, box, (1000, 3)).astype(np.float32))
    grid = deposit(pos, 1.0, n, box, order=order, method=method)
    assert np.isclose(float(jnp.sum(grid)), 1000.0, rtol=1e-4)
    assert float(jnp.min(grid)) >= -1e-5


@pytest.mark.parametrize("order", [2, 3, 4])
def test_gather_exact_for_linear_field(order):
    # Interpolation of order ≥ 2 reproduces a linear function exactly
    # (away from the periodic wrap).
    n, box = 32, 1.0
    xg = (np.arange(n) + 0.5) * box / n
    grid = jnp.asarray(np.broadcast_to(xg[:, None, None], (n, n, n)).copy(), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0.2 * box, 0.8 * box, (200, 3)).astype(np.float32))
    vals = gather(grid, pos, box, order=order)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(pos[:, 0]), atol=2e-4)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_deposit_sorted_matches_scatter(order):
    """The scatter-free sorted-segment deposit must agree with the XLA
    scatter-add path to f32 roundoff for clustered particles too."""
    n, box = 16, 30.0
    rng = np.random.default_rng(9)
    # clustered: half uniform, half in one corner cell region
    pos = np.concatenate([
        rng.uniform(0, box, (3000, 3)),
        rng.normal(5.0, 0.3, (3000, 3)) % box,
    ]).astype(np.float32)
    q = rng.uniform(0.5, 2.0, (6000,)).astype(np.float32)
    g1 = np.asarray(deposit(jnp.asarray(pos), jnp.asarray(q), n, box, order=order, method="scatter"))
    g2 = np.asarray(deposit(jnp.asarray(pos), jnp.asarray(q), n, box, order=order, method="sorted"))
    np.testing.assert_allclose(g2, g1, atol=3e-3 * g1.max())


def test_deposit_gather_adjoint():
    # <deposit(p, q), g> == <q, gather(g, p)> — deposit and gather are
    # adjoint linear maps (same kernel), a strong correctness invariant.
    n, box = 8, 1.0
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(0, box, (50, 3)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal(50).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    lhs = float(jnp.sum(deposit(pos, q, n, box, order=2) * g))
    rhs = float(jnp.sum(q * gather(g, pos, box, order=2)))
    assert np.isclose(lhs, rhs, rtol=1e-3)


def test_check_hermitian():
    g = random_grid(16, seed=9)
    slab = rfft3(g)
    assert float(fourier.check_hermitian(slab, 16)) < 1e-4
    bad = slab.at[3, 5, 0].add(1.0)
    assert float(fourier.check_hermitian(bad, 16)) > 0.4
