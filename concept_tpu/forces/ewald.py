"""Ewald summation for exact periodic gravity (PP method).

TPU-native counterpart of reference src/ewald.py (summation at :62,
grid tabulation + disk cache at :207-271, CIC lookup with symmetry folding
at :146).

The correction field is tabulated once on a grid over the octant
[0,½]³ of the unit box (host-side NumPy in float64, cached under
.reusable/ewald), then looked up with trilinear interpolation inside jit.

Conventions (unit box, G=1, unit masses; x = displacement from source):
  acceleration field a(x) = −Σ_images (x+n)/|x+n|³   (attraction)
  Ewald split (Hernquist, Bouchet & Suto 1991):
  a(x) = −Σ_n  x_n/|x_n|³ [erfc(α r_n) + 2α r_n/√π e^(−α²r_n²)]
         −Σ_h 2 h/|h|² e^(−π²|h|²/α²) sin(2π h·x)
  correction(x) ≡ a(x) + x_mi/|x_mi|³   (x_mi = minimum image),
so the total periodic force = direct minimum-image force + correction.
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax.numpy as jnp

ALPHA = 2.0  # Ewald split parameter (images |n|≤4, modes |h|²≤ ~40 suffice)


def ewald_acceleration_np(x: np.ndarray, alpha: float = ALPHA, nmax: int = 4, h2max: int = 40):
    """Exact periodic acceleration field at displacements x (unit box).

    x: (..., 3) in [-0.5, 0.5].  Host-side float64; used for tabulation.
    """
    from scipy.special import erfc

    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    rng = np.arange(-nmax, nmax + 1)
    # real-space sum
    for nx in rng:
        for ny in rng:
            for nz in rng:
                r = x + np.array([nx, ny, nz], dtype=np.float64)
                r2 = np.sum(r * r, axis=-1)
                r1 = np.sqrt(np.maximum(r2, 1e-30))
                w = erfc(alpha * r1) + (2 * alpha / math.sqrt(math.pi)) * r1 * np.exp(
                    -(alpha**2) * r2
                )
                out -= r * (w / np.maximum(r1**3, 1e-30))[..., None]
    # k-space sum
    hmax = int(math.isqrt(h2max))
    for hx in range(-hmax, hmax + 1):
        for hy in range(-hmax, hmax + 1):
            for hz in range(-hmax, hmax + 1):
                h2 = hx * hx + hy * hy + hz * hz
                if h2 == 0 or h2 > h2max:
                    continue
                h = np.array([hx, hy, hz], dtype=np.float64)
                phase = 2 * math.pi * (x @ h)
                out -= (
                    (2.0 / h2)
                    * math.exp(-(math.pi**2) * h2 / alpha**2)
                    * np.sin(phase)[..., None]
                    * h
                )
    return out


def tabulate_ewald_correction(gridsize: int = 64) -> np.ndarray:
    """Correction field on a (g+1)³ grid over [0,½]³ (cached on disk).

    correction = periodic acceleration + minimum-image direct term.
    Reference: ewald.py:207-271 (.reusable/ewald/gridsize_<n>.hdf5).
    """
    from concept_tpu.utils.cache import cache_filename

    fname = cache_filename("ewald", gridsize, ALPHA)
    if os.path.exists(fname):
        return np.load(fname)["corr"]
    g = gridsize
    coords = np.linspace(0.0, 0.5, g + 1)
    X, Y, Z = np.meshgrid(coords, coords, coords, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    from concept_tpu.native import have_native, ewald_acceleration

    if have_native():
        # OpenMP tabulator (csrc/ewald.cpp)
        acc = ewald_acceleration(pts, ALPHA, 4, 40)
    else:
        acc = np.zeros_like(pts)
        chunk = 4096
        for i in range(0, len(pts), chunk):
            acc[i : i + chunk] = ewald_acceleration_np(pts[i : i + chunk])
    r2 = np.sum(pts * pts, axis=-1)
    r1 = np.sqrt(np.maximum(r2, 1e-30))
    direct = -pts / np.maximum(r1, 1e-30)[:, None] ** 3
    corr = acc - direct
    corr[r2 == 0] = 0.0
    corr = corr.reshape(g + 1, g + 1, g + 1, 3)
    try:
        np.savez(fname, corr=corr)
    except OSError:
        pass
    return corr


def ewald_correction_lookup(table, x):
    """Trilinear lookup of the correction at displacements x (unit box,
    x ∈ [-0.5, 0.5]³), exploiting the odd symmetry of each force component
    under reflection of its own coordinate (even under the others) —
    reference ewald.py:146-206."""
    g = table.shape[0] - 1
    sign = jnp.where(x < 0, -1.0, 1.0)  # (..., 3)
    ax = jnp.abs(x)  # in [0, 0.5]
    u = jnp.clip(ax * (2 * g) / 1.0, 0.0, g - 1e-6)  # grid coords over [0,.5]
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    out = 0.0
    for dx_ in (0, 1):
        for dy_ in (0, 1):
            for dz_ in (0, 1):
                w = (
                    (f[..., 0] if dx_ else 1 - f[..., 0])
                    * (f[..., 1] if dy_ else 1 - f[..., 1])
                    * (f[..., 2] if dz_ else 1 - f[..., 2])
                )
                vals = table[i0[..., 0] + dx_, i0[..., 1] + dy_, i0[..., 2] + dz_]
                out = out + w[..., None] * vals
    # component d flips sign with coordinate d
    return out * sign
