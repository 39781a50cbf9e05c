"""Fourier-space machinery on 3D real-to-complex grids.

TPU-native redesign of reference src/mesh.py's fourier_loop family
(mesh.py:2615-3326) and fourier_operate/laplacian_inverse/fourier_diff/
nullify_modes/copy_modes (mesh.py:3327-3696, 1018).

Instead of per-element loops over slabs, everything here is expressed as
vectorized (broadcast) operations over the full rfft layout
``(n, n, n//2+1)``.  Under GSPMD these elementwise ops partition cleanly
over a sharded Fourier grid without communication — only the FFT itself
needs collectives (see grid/fft.py).

Conventions:
  * real grid: shape (n, n, n), cell width boxsize/n
  * Fourier grid: shape (n, n, n//2+1), entry [i,j,k] holds mode
    (ki, kj, kk) with integer wavenumbers ki,kj ∈ {0..n/2-1, -n/2..-1},
    kk ∈ {0..n/2}; physical k = (2π/boxsize)·(ki,kj,kk)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def k_int_1d(n: int, dtype=jnp.int32):
    """Integer wavenumbers along a full FFT axis: [0,1,...,n/2-1,-n/2,...,-1]."""
    return jnp.asarray((np.fft.fftfreq(n) * n).astype(np.int32), dtype=dtype)


def k_int_vectors(gridsize: int):
    """Broadcastable integer mode vectors (ki, kj, kk) for the rfft layout."""
    n = gridsize
    ki = k_int_1d(n).reshape(n, 1, 1)
    kj = k_int_1d(n).reshape(1, n, 1)
    kk = jnp.arange(n // 2 + 1, dtype=jnp.int32).reshape(1, 1, n // 2 + 1)
    return ki, kj, kk


def k2_int_grid(gridsize: int):
    """Integer |k|² = ki²+kj²+kk² over the rfft layout."""
    ki, kj, kk = k_int_vectors(gridsize)
    return ki * ki + kj * kj + kk * kk


def hermitian_multiplicity(gridsize: int):
    """Mode multiplicity for sums over the rfft half-space.

    Modes with kk=0 or kk=n/2 are their own conjugates (count once);
    all others represent a conjugate pair (count twice).  Mirrors the
    Hermitian handling in reference fourier_loop (mesh.py:2615-2908).
    """
    n = gridsize
    kk = jnp.arange(n // 2 + 1)
    w = jnp.where((kk == 0) | (kk == n // 2), 1.0, 2.0)
    return w.reshape(1, 1, n // 2 + 1)


def deconvolution_factor(gridsize: int, order: int, boxsize: float = 1.0):
    """Interpolation-kernel deconvolution: Π_dims sinc(π k_i/n)^(-order).

    Reference: mesh.py:3327-3421 (fourier_operate deconv).  order is the
    interpolation order (NGP:1, CIC:2, TSC:3, PCS:4); a 'global'
    deconvolution applies order*2 (upstream+downstream promotion,
    reference interactions.py:2060-2080).
    """
    n = gridsize
    ki, kj, kk = k_int_vectors(n)

    def sinc(k):
        x = (math.pi / n) * k.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        return jnp.sinc(x / math.pi)  # jnp.sinc(y) = sin(πy)/(πy)

    d = sinc(ki) * sinc(kj) * sinc(kk)
    return d ** (-order)


def laplacian_inverse_factor(gridsize: int, boxsize: float, dtype=jnp.float32):
    """Multiplicative factor −? no: plain 1/|k|² with |k| physical; the
    origin entry is 0 (mode nullified).  Reference: mesh.py:3422-3465."""
    k2 = k2_int_grid(gridsize).astype(dtype)
    kfac = (2 * math.pi / boxsize) ** 2
    inv = jnp.where(k2 > 0, 1.0 / (kfac * k2), 0.0)
    return inv


def k_physical(gridsize: int, boxsize: float, dim: int, dtype=jnp.float32):
    """Physical wavenumber component along dim as a broadcastable array."""
    kvecs = k_int_vectors(gridsize)
    return (2 * math.pi / boxsize) * kvecs[dim].astype(dtype)


def fourier_diff(slab, gridsize: int, boxsize: float, dim: int):
    """Differentiate in Fourier space: multiply by i·k_dim.

    Reference: mesh.py:3466-3544.  Nyquist planes along dim are nullified
    (the derivative of the Nyquist mode is ill-defined; the reference
    similarly excludes them via nullify_modes 'beyond cube'/Nyquist
    handling, mesh.py:3545-3695).
    """
    n = gridsize
    kvec = k_int_vectors(n)[dim]
    k_phys = (2 * math.pi / boxsize) * kvec.astype(slab.real.dtype)
    out = slab * (1j * k_phys)
    # Nullify the Nyquist plane along dim (k_int == -n/2 for dims 0,1;
    # kk == n/2 for dim 2)
    nyq = (kvec == -(n // 2)) if dim < 2 else (kvec == n // 2)
    return jnp.where(nyq, 0.0, out)


def nullify_origin(slab):
    """Zero the k=0 mode (reference nullify_modes 'origin', mesh.py:3545)."""
    return slab.at[0, 0, 0].set(0.0)


def nullify_nyquist(slab, gridsize: int):
    """Zero all Nyquist planes (reference nullify_modes 'nyquist')."""
    n = gridsize
    ki, kj, kk = k_int_vectors(n)
    nyq = (ki == -(n // 2)) | (kj == -(n // 2)) | (kk == n // 2)
    return jnp.where(nyq, 0.0, slab)


def nullify_beyond_sphere(slab, gridsize: int, k2_max_int: int):
    """Zero modes with |k|²_int > k2_max_int."""
    k2 = k2_int_grid(gridsize)
    return jnp.where(k2 > k2_max_int, 0.0, slab)


def copy_modes(
    slab_src,
    gridsize_src: int,
    gridsize_dst: int,
    norm: bool = True,
    cell_centered: bool = True,
):
    """Harmonic grid up/down-scaling: copy shared integer modes between
    rfft layouts of different grid sizes (reference mesh.py:1018-1327
    ``copy_modes`` / resize_grid).

    When downscaling, modes beyond the destination's Nyquist are dropped;
    the destination Nyquist planes are zeroed (they would alias).  When
    upscaling, new high-k modes are zero.  ``norm`` rescales so that an
    irfft of the result has the same physical amplitude (FFT value scaling
    ∝ number of cells).  With ``cell_centered`` grids the sample points sit
    at (i+½)h, whose half-cell offset differs between grid sizes; the
    per-axis phase exp(iπ k (1/n2 − 1/n1)) re-centers the samples.
    """
    n1, n2 = gridsize_src, gridsize_dst
    if n1 == n2:
        return slab_src
    nsmall = min(n1, n2)
    h = nsmall // 2  # modes strictly below the smaller Nyquist are kept
    out = jnp.zeros((n2, n2, n2 // 2 + 1), dtype=slab_src.dtype)
    # Index blocks: positive freq rows [0:h], negative freq rows [-h+1:] →
    # keep |k| < h to stay clear of Nyquist ambiguity.
    src = slab_src
    pos, neg = h, h - 1  # rows 0..h-1 and last (h-1) rows
    out = out.at[:pos, :pos, : h + 1].set(src[:pos, :pos, : h + 1])
    out = out.at[:pos, -neg:, : h + 1].set(src[:pos, -neg:, : h + 1])
    out = out.at[-neg:, :pos, : h + 1].set(src[-neg:, :pos, : h + 1])
    out = out.at[-neg:, -neg:, : h + 1].set(src[-neg:, -neg:, : h + 1])
    if norm:
        out = out * (n2 / n1) ** 3
    if cell_centered:
        ki, kj, kk = k_int_vectors(n2)
        phase = (math.pi * (1.0 / n2 - 1.0 / n1)) * (ki + kj + kk).astype(
            out.real.dtype
        )
        out = out * jnp.exp(1j * phase)
    return out


def check_hermitian(slab, gridsize: int):
    """Debug utility: maximum violation of the Hermitian symmetry
    R(-k) = conj(R(k)) on the self-conjugate kk ∈ {0, n/2} planes
    (reference slabs_check_symmetry, mesh.py:4182)."""
    n = gridsize
    worst = 0.0
    for kk in (0, n // 2):
        plane = slab[:, :, kk]
        mirrored = jnp.conj(plane[::-1, ::-1])
        mirrored = jnp.roll(mirrored, (1, 1), axis=(0, 1))
        worst = jnp.maximum(worst, jnp.max(jnp.abs(plane - mirrored)))
    return worst


def interlace_phase(gridsize: int, boxsize: float, shift_cells):
    """Phase factor exp(-i k·Δx) for a grid shifted by ``shift_cells``
    (units of cell width).  Used for bcc/fcc interlacing (reference
    Lattice, mesh.py:77-183) and lattice IC shifts."""
    n = gridsize
    ki, kj, kk = k_int_vectors(n)
    # k·Δx = (2π/n)(ki·sx + kj·sy + kk·sz) with shifts in cell units
    phase = (2 * math.pi / n) * (
        ki * shift_cells[0] + kj * shift_cells[1] + kk * shift_cells[2]
    )
    return jnp.exp(-1j * phase.astype(jnp.float32))
