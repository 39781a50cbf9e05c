"""Initial-condition generation: primordial noise and LPT realization.

TPU-native redesign of reference src/ic.py:
  * generate_primordial_noise (ic.py:928-1198): here counter-based JAX PRNG
    on the full grid — deterministic and device-count-invariant by
    construction (the array is generated identically regardless of
    sharding; the reference needed an elaborate Fourier space-filling-curve
    scheme to achieve nprocs-invariance under MPI).
  * fixed-amplitude & paired-phase primordial modes
    (reference ic.py:1058-1105; params primordial_amplitude_fixed,
    primordial_phase_shift).
  * realize_particles (ic.py:1199-1446): sc/bcc/fcc lattices + 1/2LPT
    displacements (3LPT grids planned, reference ic.py:1447-2058).

Conventions:
  DFT normalisation: δ_dft(k) = Σ_x δ(x) e^{-ikx} (NumPy forward),
  ⟨|δ_dft(k)|²⟩ = N_cells²/V · P(k), so the realization amplitude is
  √(N/V)·√P(k) on unit-variance white noise.
  Zel'dovich: x = q + ψ(q), ψ(k) = i k/k² δ(k),
  mom = a²·m·ẋ = a²·m·H·f1·ψ.
  2LPT: x += ψ²(q), ψ²(k) = -(D2/D1²)·i k/k²·S(k),
  S = Σ_{i<j}(ψ¹ᵢ,ᵢψ¹ⱼ,ⱼ - (ψ¹ᵢ,ⱼ)²)  (reference growth convention
  D2 = +3/7 a² in EdS, integration.py:1215-1222).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from concept_tpu.components import ComponentSpec, ParticleState, lattice_positions
from concept_tpu.grid.fft import GridDistribution, rfft3, irfft3
from concept_tpu.grid import fourier


def generate_primordial_noise(
    gridsize: int,
    seed: int = 0,
    fixed_amplitude: bool = False,
    phase_shift: float = 0.0,
    dist: GridDistribution | None = None,
    dtype=jnp.float32,
    scheme: str = "simple",
):
    """Unit white noise in Fourier (rfft) layout with exact Hermitian
    symmetry; ⟨|R(k)|²⟩ = N_cells.

    scheme='simple': real-space i.i.d. N(0,1) transformed — deterministic
    and device-count invariant, but ties mode values to the grid size.
    scheme='distributed': mode-indexed counter-based RNG — each integer
    mode (ki,kj,kk) derives its value from a hash of its own coordinates,
    making the noise gridsize- AND device-count-invariant (the reference's
    'distributed' primordial_noise_imprinting, ic.py:928-1198, which needs
    a Fourier space-filling curve under MPI; counter-based RNG achieves the
    same invariance directly).

    fixed_amplitude: |R(k)| := √N_cells, keeping only the phase
    (paired-and-fixed simulations, reference ic.py:1058-1105);
    phase_shift is added to every mode's phase (π for the pair partner).
    """
    n = gridsize
    if scheme == "simple":
        key = jax.random.key(seed)
        white = jax.random.normal(key, (n, n, n), dtype=dtype)
        if dist is not None and dist.mesh is not None:
            white = jax.device_put(white, dist.real_sharding())
        R = rfft3(white, dist)
    elif scheme == "distributed":
        R = _modewise_noise(n, seed, dtype)
    else:
        raise ValueError(f"unknown noise scheme {scheme!r}")
    if fixed_amplitude or phase_shift != 0.0:
        mag = jnp.abs(R)
        phase = jnp.angle(R) + phase_shift
        amp = jnp.where(fixed_amplitude, math.sqrt(n**3), mag)
        R = amp * jnp.exp(1j * phase)
        # self-conjugate modes (origin handled by amplitude code later)
    return R


def _modewise_noise(gridsize: int, seed: int, dtype=jnp.float32):
    """Mode-indexed Gaussian noise over the rfft layout.

    Each mode's complex value is a pure function of (seed, ki, kj, kk)
    with ki,kj signed integers — identical for every grid size that
    contains the mode.  Hermitian symmetry: modes on the kk ∈ {0, n/2}
    self-conjugate planes take the value of their canonical representative
    (lexicographically positive) with conjugation; purely real on
    self-conjugate points.  Normalised to ⟨|R|²⟩ = n³.
    """
    n = gridsize
    ki, kj, kk = fourier.k_int_vectors(n)
    ki = jnp.broadcast_to(ki, (n, n, n // 2 + 1))
    kj = jnp.broadcast_to(kj, (n, n, n // 2 + 1))
    kk = jnp.broadcast_to(kk, (n, n, n // 2 + 1))
    # canonical representative for self-conjugate planes (kk = 0 or n/2
    # in integer mode space — kk = n/2 occurs only at this grid size's
    # Nyquist, which is nulled in realizations anyway)
    on_plane = (kk == 0) | (kk == n // 2)
    # conjugate partner with Nyquist aliasing: −(−n/2) ≡ −n/2
    def _alias_neg(k):
        mk = -k
        return jnp.where(mk == n // 2, -(n // 2), mk)

    pi = _alias_neg(ki)
    pj = _alias_neg(kj)
    # canonical representative = lexicographic max of ((kj,ki),(pj,pi))
    flip = on_plane & ((kj < pj) | ((kj == pj) & (ki < pi)))
    ki_c = jnp.where(flip, pi, ki)
    kj_c = jnp.where(flip, pj, kj)
    kk_c = kk  # kk ∈ {0, n/2} on the flip plane; -0 = 0 and Nyq ≡ -Nyq

    # counter-based bits: hash the packed mode coordinates with threefry
    base = jax.random.key_data(jax.random.key(seed)).astype(jnp.uint32)
    OFF = jnp.uint32(1 << 15)

    def bits(salt):
        cnt = (
            (ki_c.astype(jnp.uint32) + OFF)
            ^ ((kj_c.astype(jnp.uint32) + OFF) << 11)
            ^ ((kk_c.astype(jnp.uint32) + OFF) << 22)
            ^ jnp.uint32(salt)
        )
        # two threefry-style mixing rounds via JAX's random_bits on a
        # folded key would be per-mode keys (expensive); a Philox-like
        # integer hash gives high-quality bits for this purpose:
        x = cnt * jnp.uint32(0x9E3779B9) + base[0]
        x ^= x >> 16
        x = x * jnp.uint32(0x85EBCA6B) + base[1]
        x ^= x >> 13
        x = x * jnp.uint32(0xC2B2AE35)
        x ^= x >> 16
        return x

    def uniform(salt):
        return (bits(salt).astype(jnp.float32) + 0.5) / jnp.float32(2**32)

    # Box-Muller → complex standard normal (variance 1/2 per part)
    u1 = jnp.clip(uniform(0x1234ABCD), 1e-7, 1 - 1e-7)
    u2 = uniform(0x5678EF01)
    r = jnp.sqrt(-jnp.log(u1))
    theta = (2 * math.pi) * u2
    re = r * jnp.cos(theta)
    im = r * jnp.sin(theta)
    # conjugate for flipped (non-canonical) plane entries
    im = jnp.where(flip, -im, im)
    # self-conjugate points must be real with variance 1
    selfconj = on_plane & (ki == pi) & (kj == pj)
    re = jnp.where(selfconj, re * math.sqrt(2), re)
    im = jnp.where(selfconj, 0.0, im)
    R = (re + 1j * im) * math.sqrt(n**3)
    return R.astype(jnp.complex64 if dtype == jnp.float32 else jnp.complex128)


def _tracing() -> bool:
    """True when called inside a jit/vmap trace (then don't re-jit)."""
    return isinstance(jnp.zeros(()), jax.core.Tracer)


def _k_magnitude_grid(gridsize: int, boxsize: float, dtype=jnp.float32):
    k2 = fourier.k2_int_grid(gridsize).astype(dtype)
    return (2 * math.pi / boxsize) * jnp.sqrt(k2)


def realize_delta_slab(
    lin,
    gridsize: int,
    boxsize: float,
    a: float,
    seed: int = 0,
    fixed_amplitude: bool = False,
    phase_shift: float = 0.0,
    dist: GridDistribution | None = None,
    dtype=jnp.float32,
    nongaussianity: float = 0.0,
    species: str = "matter",
    scheme: str = "simple",
    backscale: bool = False,
):
    """δ(k) in DFT normalisation at scale factor a.

    Reference: ic.py:542 (get_amplitudes = √P_prim·T) + ic.py:670
    (realize_grid).  Optional local-type non-Gaussianity f_NL applied to
    the primordial potential (reference realization_options
    'nongaussianity').  species selects the transfer function (matter /
    cb / nu — reference TransferFunction species, linear.py:3517).
    ``backscale``: realize with the z = 0 spectrum scaled back by
    D1(a)/D1(1) instead of the a-epoch transfer function (the classic
    N-body IC convention; reference realization_options 'backscale').
    """
    n = gridsize
    V = boxsize**3
    bs_fac = float(lin.bg.growth_np("D1", a)) if backscale else 1.0
    a_amp = 1.0 if backscale else a

    # One jitted program: eager per-op dispatch of complex arithmetic is
    # not supported on all TPU runtimes (and is slow anyway).
    def _core():
        R = generate_primordial_noise(
            n, seed, fixed_amplitude, phase_shift, dist, dtype, scheme
        )
        kmag = _k_magnitude_grid(n, boxsize, dtype)
        kmag_safe = jnp.where(kmag > 0, kmag, 1.0)
        if nongaussianity != 0.0:
            # ζ → ζ + (3/5) f_NL ζ² (local type, on the Bardeen potential
            # Φ = 3/5 ζ): build ζ(x), square, re-transform.
            zeta_amp = lin.primordial.zeta_amplitude(kmag_safe) * math.sqrt(n**3 / V)
            zeta_k = jnp.where(kmag > 0, R * zeta_amp, 0.0)
            zeta_x = irfft3(zeta_k, n, dist)
            fnl_term = (3.0 / 5.0) * nongaussianity * (zeta_x**2 - jnp.mean(zeta_x**2))
            zeta_k = zeta_k + rfft3(fnl_term.astype(dtype), dist)
            Tdelta = lin.transfer_delta(kmag_safe, a_amp, species) * bs_fac
            return jnp.where(kmag > 0, zeta_k * Tdelta, 0.0)
        amp = (lin.delta_amplitude(kmag_safe, a_amp, species) * bs_fac
               * math.sqrt(n**3 / V))
        return jnp.where(kmag > 0, R * amp, 0.0)

    if _tracing():
        return _core()  # already inside a trace
    return jax.jit(_core)()


def realize_sigma_grids(
    lin,
    gridsize: int,
    boxsize: float,
    a: float,
    rho_plus_P: float,
    seed: int = 0,
    dist: GridDistribution | None = None,
    dtype=jnp.float32,
    species: str = "nu",
):
    """Realize the shear tensor ςⁱⱼ = (ϱ̄ + c⁻²𝒫̄)·σⁱⱼ from the linear σ
    transfer function (reference ic.py:670 realize_grid rank-2 kernel
    K(k⃗) = (3/2)(δⁱⱼ/3 − kⁱkⱼ/k²), ic.py:466 ς scaling).

    Uses the same counter-based primordial noise as realize_delta_slab
    (same seed ⇒ shared phases with the component's δ/J realizations).
    rho_plus_P: the ϱ̄(1 + w)-like prefactor.  Returns packed
    (6, n, n, n) components (xx, xy, xz, yy, yz, zz), or None when the
    linear layer has no σ tables (analytic EH backend)."""
    Tsig = getattr(lin, "transfer_sigma", None)
    if Tsig is None or Tsig(jnp.asarray([1.0]), a, species) is None:
        return None
    n = gridsize
    V = boxsize**3
    pairs = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))

    def _core():
        R = generate_primordial_noise(n, seed, False, 0.0, dist, dtype,
                                      "simple")
        kmag = _k_magnitude_grid(n, boxsize, dtype)
        kmag_safe = jnp.where(kmag > 0, kmag, 1.0)
        sig = Tsig(kmag_safe, a, species)
        amp = (
            jnp.asarray(sig, dtype)
            * lin.primordial.zeta_amplitude(kmag_safe)
            * math.sqrt(n**3 / V)
        )
        base_k = jnp.where(kmag > 0, R * amp, 0.0)
        kfac = 2 * math.pi / boxsize
        kvecs = [
            fourier.k_int_vectors(n)[d].astype(dtype) * kfac for d in range(3)
        ]
        inv_k2 = jnp.where(kmag > 0, 1.0 / kmag_safe**2, 0.0)
        grids = []
        for (i, j) in pairs:
            delta_ij = 1.0 if i == j else 0.0
            Kij = 1.5 * (delta_ij / 3.0 - kvecs[i] * kvecs[j] * inv_k2)
            grids.append(irfft3(Kij * base_k, n, dist))
        return rho_plus_P * jnp.stack(grids).astype(dtype)

    if _tracing():
        return _core()
    return jax.jit(_core)()


def displacement_from_delta(delta_slab, gridsize: int, boxsize: float, dist=None):
    """ψ_d(x) grids from δ(k): ψ(k) = i k_d/k² δ(k).  Returns (3,n,n,n)."""
    n = gridsize
    kfac = 2 * math.pi / boxsize
    k2 = fourier.k2_int_grid(n).astype(delta_slab.real.dtype) * kfac**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / k2, 0.0)
    psis = []
    for d in range(3):
        kd = fourier.k_int_vectors(n)[d].astype(delta_slab.real.dtype) * kfac
        psi_k = (1j * kd) * inv_k2 * delta_slab
        psis.append(irfft3(psi_k, n, dist))
    return jnp.stack(psis)


def dealias_gridsize(n: int) -> int:
    """Orszag 3/2-rule padded grid size (even; reference ic.py:1322-1323)."""
    m = (n * 3) // 2
    return m + (m & 1)


def _hessian_real(pot_psi_k, gridsize: int, boxsize: float, dist=None,
                  m: int | None = None):
    """The 6 unique ∂ᵢψⱼ real grids from the 3 Fourier ψ-components
    (ψ = ∇Φ, so ∂ᵢψⱼ = Φ,ᵢⱼ), optionally zero-padded to an m-grid for
    dealiased products."""
    n = gridsize
    m = m or n
    out = {}
    for i in range(3):
        for j in range(i, 3):
            dk = fourier.fourier_diff(pot_psi_k[i], n, boxsize, j)
            if m != n:
                dk = fourier.copy_modes(dk, n, m)
            out[(i, j)] = irfft3(dk, m, dist)
    return out


def _truncate_product(S_m, n: int, m: int, dist=None):
    """Real m-grid product → n-grid real field (drop aliased modes)."""
    if m == n:
        return S_m
    return irfft3(fourier.copy_modes(rfft3(S_m, dist), m, n), n, dist)


def lpt2_source(psi_slabs_k, gridsize: int, boxsize: float, dist=None, dealias: bool = False):
    """2LPT source S(x) = Σ_{i<j} (ψᵢ,ᵢψⱼ,ⱼ − ψᵢ,ⱼ²) from ψ¹(k) grids.

    psi_slabs_k: list of 3 Fourier ψ-components.  Reference:
    ic.py:1546-1718 (carryout_2lpt) with optional Orszag 3/2 dealiasing
    (quadratic products evaluated on the padded grid, then truncated —
    reference ic.py:1316-1325).
    """
    n = gridsize
    m = dealias_gridsize(n) if dealias else n
    d = _hessian_real(psi_slabs_k, n, boxsize, dist, m)
    S = (
        d[(0, 0)] * d[(1, 1)] + d[(0, 0)] * d[(2, 2)] + d[(1, 1)] * d[(2, 2)]
        - d[(0, 1)] ** 2 - d[(0, 2)] ** 2 - d[(1, 2)] ** 2
    )
    return _truncate_product(S, n, m, dist)


def lpt3_sources(psi_slabs_k, S2_k, fac2, gridsize: int, boxsize: float,
                 dist=None, dealias: bool = False):
    """3LPT sources from ψ¹(k) and the 2LPT source S₂(k).

    Returns (S3a(x), S3b(x), [A3c sources (x) for i = 0,1,2]) with the
    reference's exact term lists (ic.py:1630-1645 '3a', 1708-1741 '3b',
    1799-1830 '3c'):
      ∇²Φ³ᵃ ∝ Φ¹,₂₀²Φ¹,₁₁ − Φ¹,₁₁Φ¹,₂₂Φ¹,₀₀ + Φ¹,₀₀Φ¹,₁₂²
              − 2Φ¹,₁₂Φ¹,₂₀Φ¹,₀₁ + Φ¹,₀₁²Φ¹,₂₂
      ∇²Φ³ᵇ ∝ −½Σ(Φ¹,ᵢᵢΦ²,ⱼⱼ pairs) + Σ Φ²,ᵢⱼΦ¹,ᵢⱼ (i<j)
      ∇²Aᵢ³ᶜ ∝ Φ²,ⱼⱼΦ¹,ⱼₖ − Φ¹,ⱼₖΦ²,ₖₖ − Φ¹,ᵢⱼΦ²,ᵢₖ − Φ¹,ⱼⱼΦ²,ⱼₖ
               + Φ²,ⱼₖΦ¹,ₖₖ + Φ²,ᵢⱼΦ¹,ᵢₖ     (j,k) = ((i+1)%3, (i+2)%3)
    Here Φ² is the FULL 2LPT potential at the realization epoch
    (fac2·∇⁻²S₂, matching realize_particles), so the external growth
    ratios are D3a/D1³ and D3b/(D1·D2), D3c/(D1·D2) — the reference's
    potential_factor conventions.
    """
    n = gridsize
    m = dealias_gridsize(n) if dealias else n
    kfac = 2 * math.pi / boxsize
    dtype = jnp.asarray(psi_slabs_k[0]).real.dtype
    k2 = fourier.k2_int_grid(n).astype(dtype) * kfac**2
    inv_k2 = jnp.where(k2 > 0, 1.0 / k2, 0.0)
    # Ψ² Fourier components (full epoch-a 2LPT displacement potential grad)
    psi2_k = [
        (1j * (fourier.k_int_vectors(n)[d].astype(dtype) * kfac))
        * inv_k2 * (fac2 * S2_k)
        for d in range(3)
    ]
    d1 = _hessian_real(psi_slabs_k, n, boxsize, dist, m)
    d2 = _hessian_real(psi2_k, n, boxsize, dist, m)

    def g(d, i, j):
        return d[(min(i, j), max(i, j))]

    S3a = (
        g(d1, 2, 0) ** 2 * g(d1, 1, 1)
        - g(d1, 1, 1) * g(d1, 2, 2) * g(d1, 0, 0)
        + g(d1, 0, 0) * g(d1, 1, 2) ** 2
        - 2 * g(d1, 1, 2) * g(d1, 2, 0) * g(d1, 0, 1)
        + g(d1, 0, 1) ** 2 * g(d1, 2, 2)
    )
    S3b = (
        -0.5 * (
            g(d1, 2, 2) * g(d2, 0, 0) + g(d2, 0, 0) * g(d1, 1, 1)
            + g(d1, 1, 1) * g(d2, 2, 2) + g(d2, 2, 2) * g(d1, 0, 0)
            + g(d1, 0, 0) * g(d2, 1, 1) + g(d2, 1, 1) * g(d1, 2, 2)
        )
        + g(d2, 2, 0) * g(d1, 2, 0)
        + g(d2, 0, 1) * g(d1, 0, 1)
        + g(d2, 1, 2) * g(d1, 1, 2)
    )
    A3c = []
    for i in range(3):
        j = (i + 1) % 3
        k = (i + 2) % 3
        A3c.append(
            g(d2, j, j) * g(d1, j, k)
            - g(d1, j, k) * g(d2, k, k)
            - g(d1, i, j) * g(d2, i, k)
            - g(d1, j, j) * g(d2, j, k)
            + g(d2, j, k) * g(d1, k, k)
            + g(d2, i, j) * g(d1, i, k)
        )
    S3a = _truncate_product(S3a, n, m, dist)
    S3b = _truncate_product(S3b, n, m, dist)
    A3c = [_truncate_product(A, n, m, dist) for A in A3c]
    return S3a, S3b, A3c


def preic_lattice_of(N: int) -> str:
    """Pre-IC lattice implied by the particle count (reference
    species.py:1107-1117): n³ → sc, 2n³ → bcc, 4n³ → fcc."""
    def _iscube(m: int) -> bool:
        r = round(m ** (1 / 3))
        return r**3 == m

    if _iscube(N):
        return "sc"
    if N % 2 == 0 and _iscube(N // 2):
        return "bcc"
    if N % 4 == 0 and _iscube(N // 4):
        return "fcc"
    raise ValueError(
        f"N = {N} matches no pre-IC lattice (needs n**3, 2*n**3 "
        f"or 4*n**3 for sc/bcc/fcc)"
    )


def realize_particles(
    lin,
    spec: ComponentSpec,
    boxsize: float,
    a: float,
    seed: int = 0,
    lpt_order: int = 1,
    lattice: str | None = None,
    fixed_amplitude: bool = False,
    phase_shift: float = 0.0,
    dist: GridDistribution | None = None,
    dtype=jnp.float32,
    with_ids: bool = False,
    nongaussianity: float = 0.0,
    species: str = "matter",
    delta_k=None,
    scheme: str = "simple",
    dealias: bool = False,
    backscale: bool = False,
) -> ParticleState:
    """Generate particle ICs for a matter-like component at scale factor a.

    Reference: ic.py:1199-1446 (realize_particles) + LPT grids
    (ic.py:1447-2058).  ``delta_k`` overrides the realized density (used
    for deterministic closed-form tests).
    """
    if lattice is None:
        # auto: derive the lattice from N as the reference does
        # (species.py:1107-1117) — cubes get sc, 2n³ bcc, 4n³ fcc
        lattice = preic_lattice_of(spec.N)
    n_per_lattice = {"sc": 1, "bcc": 2, "fcc": 4}[lattice]
    gridsize = round((spec.N // n_per_lattice) ** (1 / 3))
    if n_per_lattice * gridsize**3 != spec.N:
        raise ValueError(
            f"N = {spec.N} is not a {lattice} lattice count "
            f"(needs {n_per_lattice}·n³)"
        )
    H = lin.bg.hubble(a)
    f1 = lin.bg.growth("f1", a)

    # One jitted program (eager complex dispatch is unsupported on some
    # TPU runtimes, and op-by-op realization is slow).
    def _core(delta_k):
        if delta_k is None:
            delta_k = realize_delta_slab(
                lin, gridsize, boxsize, a, seed, fixed_amplitude, phase_shift,
                dist, dtype, nongaussianity, species, scheme,
                backscale=backscale,
            )
        kfac = 2 * math.pi / boxsize
        k2 = fourier.k2_int_grid(gridsize).astype(dtype) * kfac**2
        inv_k2 = jnp.where(k2 > 0, 1.0 / k2, 0.0)
        psi_k = [
            (1j * (fourier.k_int_vectors(gridsize)[d].astype(dtype) * kfac))
            * inv_k2
            * delta_k
            for d in range(3)
        ]

        # Displacement and velocity-potential displacement (ψ̇ = H f ψ at 1LPT)
        psi = jnp.stack([irfft3(pk, gridsize, dist) for pk in psi_k])
        dpsi_dt = H * f1 * psi

        if lpt_order >= 2:
            D1 = lin.bg.growth("D1", a)
            D2 = lin.bg.growth("D2", a)
            f2 = lin.bg.growth("f2", a)
            S = lpt2_source(psi_k, gridsize, boxsize, dist, dealias=dealias)
            S_k = rfft3(S.astype(dtype), dist)
            # Ψ²(k) = +(D2/D1²)·ik/k²·S(k)  (so ∇·Ψ² = −(D2/D1²)S), with the
            # reference growth convention D2 = +3/7 a² in EdS — equivalent to
            # the standard 2LPT Ψ² = −(3/7)D1²∇φ⁽²⁾, ∇²φ⁽²⁾ = S₀.
            # Validated non-circularly in tests/test_ic.py via the second-order
            # PT kernel F2(k1⊥k2) = 5/7 on crossed plane waves.
            fac2 = D2 / (D1 * D1)
            for d in range(3):
                kd = fourier.k_int_vectors(gridsize)[d].astype(dtype) * kfac
                psi2_k = (1j * kd) * inv_k2 * (fac2 * S_k)
                psi2 = irfft3(psi2_k, gridsize, dist)
                psi = psi.at[d].add(psi2)
                dpsi_dt = dpsi_dt.at[d].add(H * f2 * psi2)
        if lpt_order >= 3:
            # 3LPT: a, b scalar potentials + c transverse term (reference
            # carryout_3lpt_{a,b,c}, ic.py:1621-1845; growth-ratio
            # potential factors at :1630, :1708, :1799)
            D3a = lin.bg.growth("D3a", a)
            D3b = lin.bg.growth("D3b", a)
            D3c = lin.bg.growth("D3c", a)
            f3a = lin.bg.growth("f3a", a)
            f3b = lin.bg.growth("f3b", a)
            f3c = lin.bg.growth("f3c", a)
            S3a, S3b, A3c = lpt3_sources(
                psi_k, S_k, fac2, gridsize, boxsize, dist, dealias=dealias
            )
            fac3a = D3a / (D1 * D1 * D1)
            fac3b = D3b / (D1 * D2)
            fac3c = D3c / (D1 * D2)
            S3a_k = rfft3(S3a.astype(dtype), dist)
            S3b_k = rfft3(S3b.astype(dtype), dist)
            for d in range(3):
                kd = fourier.k_int_vectors(gridsize)[d].astype(dtype) * kfac
                p3a = irfft3((1j * kd) * inv_k2 * (fac3a * S3a_k), gridsize, dist)
                p3b = irfft3((1j * kd) * inv_k2 * (fac3b * S3b_k), gridsize, dist)
                psi = psi.at[d].add(p3a + p3b)
                dpsi_dt = dpsi_dt.at[d].add(H * (f3a * p3a + f3b * p3b))
            # transverse: Ψ³ᶜ = ∇×A with ∇²Aᵢ-sources from lpt3_sources;
            # Ψ³ᶜⱼ = ±∂ₖAᵢ, sign = +1 iff k == (j+1)%3 (reference ic.py:1844)
            for i in range(3):
                A_k = inv_k2 * (fac3c * rfft3(A3c[i].astype(dtype), dist))
                for j in range(3):
                    if j == i:
                        continue
                    k_ax = ({0, 1, 2} - {i, j}).pop()
                    sign = 1.0 if k_ax == (j + 1) % 3 else -1.0
                    p3c = sign * irfft3(
                        fourier.fourier_diff(A_k, gridsize, boxsize, k_ax),
                        gridsize, dist,
                    )
                    psi = psi.at[j].add(p3c)
                    dpsi_dt = dpsi_dt.at[j].add(H * f3c * p3c)
        if lpt_order >= 4:
            raise NotImplementedError("LPT order > 3 (reference maximum is 3)")

        q = lattice_positions(gridsize, boxsize, lattice, dtype)
        # ψ grids sampled at lattice sites: for 'sc' the lattice sites are
        # the cell centers, i.e. exactly the grid sampling points.
        disp = jnp.stack([psi[d].reshape(-1) for d in range(3)], axis=1)
        vel = jnp.stack([dpsi_dt[d].reshape(-1) for d in range(3)], axis=1)
        if lattice != "sc":
            # Sample displacement at shifted lattice copies by re-gathering:
            from concept_tpu.grid.interp import gather

            disp = jnp.stack(
                [gather(psi[d], q, boxsize, order=2) for d in range(3)], axis=1
            )
            vel = jnp.stack(
                [gather(dpsi_dt[d], q, boxsize, order=2) for d in range(3)],
                axis=1,
            )
        pos = jnp.mod(q + disp, boxsize)
        mom = (a * a * spec.mass) * vel
        return pos, mom.astype(dtype)

    if _tracing():
        pos, mom = _core(delta_k)
    elif delta_k is None:
        pos, mom = jax.jit(lambda: _core(None))()
    else:
        pos, mom = jax.jit(_core)(delta_k)
    ids = jnp.arange(spec.N, dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32) if with_ids else None
    return ParticleState(pos=pos, mom=mom, ids=ids)
