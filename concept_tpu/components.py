"""Component data model: particles and fluids.

TPU-native redesign of reference src/species.py (Component at :851,
FluidScalar at :217).  The reference's Component is a mutable
pointer-backed SoA C struct; here the dynamic state is an immutable JAX
pytree (functional updates inside jit; XLA donates buffers), while the
static metadata lives in a frozen dataclass that is closed over at trace
time (the analogue of the reference's 'params become typed globals'
design, SURVEY.md §5.6).

Species taxonomy mirrors reference linear.py:3517-3595 (matter, baryon,
cdm, neutrino, ...).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ParticleState(NamedTuple):
    """Dynamic particle data (pytree).  SoA layout: (N, 3) arrays.

    mom is the canonical momentum a²·m·ẋ (comoving x), matching the
    reference convention (species.py:2179-2199 drift uses ∫a⁻²dt/mass).
    """

    pos: jax.Array  # (N, 3) in [0, boxsize)
    mom: jax.Array  # (N, 3)
    ids: jax.Array | None = None  # (N,) int64, optional
    rungs: jax.Array | None = None  # (N,) int8, optional (adaptive rungs)


class FluidState(NamedTuple):
    """Dynamic fluid data: Boltzmann-hierarchy grids (reference
    species.py:880-928 for boltzmann_order semantics).

    varrho : (n,n,n)   comoving density ϱ = a^{3(1+w_eff)} ρ
    J      : (3,n,n,n) momentum density J = a⁴(ρ+c⁻²P)u
    P      : (n,n,n)   pressure 𝒫 (present for boltzmann_order ≥ 2 or
                       'class' closure)
    sigma  : (6,n,n,n) shear ς (symmetric, xx,xy,xz,yy,yz,zz), optional
    """

    varrho: jax.Array
    J: jax.Array | None = None
    P: jax.Array | None = None
    sigma: jax.Array | None = None


@dataclass(frozen=True)
class ComponentSpec:
    """Static per-component metadata (hashable; safe as a jit static arg)."""

    name: str
    species: str
    representation: str = "particles"  # 'particles' | 'fluid'
    N: int | None = None  # particle count
    gridsize: int | None = None  # fluid grid size
    mass: float = 0.0  # particle mass (internal units)
    w: float = 0.0  # constant equation of state (splined w(a) later)
    boltzmann_order: int = 1
    boltzmann_closure: str = "truncate"
    softening: float = 0.0  # comoving softening length
    forces: tuple = ()  # (('gravity', 'pm'),) etc.
    life: tuple = (0.0, float("inf"))  # (a_activate, a_terminate)
    # decaying species (reference dcdm, species.py:2812 internal sources;
    # Γ in inverse cosmic time; decay products credited to ``decay_to``)
    decay_rate: float = 0.0
    decay_to: str | None = None

    @property
    def w_eff(self) -> float:
        """Effective EoS; equals w for non-decaying species
        (reference species.py:2940-3526 splines this in general)."""
        return self.w

    def force_method(self, force: str) -> str | None:
        for f, m in self.forces:
            if f == force:
                return m
        return None


class EquationOfState:
    """w(a) and w_eff(a) for one component — constant or splined.

    TPU counterpart of the reference's per-component w/w_eff splines
    (species.py:2940-3526, built there from CLASS or select_eos_w).
    Here the splines come from exact background thermodynamics
    (cosmology/neutrino.NeutrinoBackground) or user callables; host
    evaluation for step integrals, traced evaluation for in-step factors.
    """

    def __init__(self, w=0.0, w_spline=None, weff_spline=None):
        self._w_const = float(w)
        self._w_spline = w_spline
        self._weff_spline = weff_spline

    @classmethod
    def constant(cls, w: float) -> "EquationOfState":
        return cls(w=w)

    @classmethod
    def from_neutrino(cls, nubg) -> "EquationOfState":
        """From a cosmology.neutrino.NeutrinoBackground (exact
        Fermi-Dirac w(a), w_eff(a))."""
        return cls(w_spline=nubg._w_spline, weff_spline=nubg._weff_spline)

    @property
    def is_constant(self) -> bool:
        return self._w_spline is None

    def w_np(self, a) -> float:
        if self._w_spline is None:
            return self._w_const
        return float(self._w_spline.eval_np(a))

    def w_eff_np(self, a) -> float:
        spl = self._weff_spline or self._w_spline
        if spl is None:
            return self._w_const
        return float(spl.eval_np(a))


# Species registry: name → (class of species, default representation).
# Mirrors reference linear.py:3517-3595.
SPECIES = {
    "matter": dict(cls="matter"),
    "baryon": dict(cls="matter"),
    "cold dark matter": dict(cls="matter"),
    "cdm": dict(cls="matter"),
    "neutrino": dict(cls="neutrino"),
    "massive neutrino": dict(cls="neutrino"),
    "photon": dict(cls="radiation"),
    "radiation": dict(cls="radiation"),
    "dark energy": dict(cls="dark energy"),
    "decaying cold dark matter": dict(cls="dcdm"),
    "dcdm": dict(cls="dcdm"),
    "metric": dict(cls="fictitious"),
    "lapse": dict(cls="fictitious"),
}


def particle_mass(Omega: float, rho_crit: float, boxsize: float, N: int) -> float:
    """mass = Ω·ρ_crit·V/N (reference species.py populate/realize path)."""
    return Omega * rho_crit * boxsize**3 / N


def lattice_positions(n_per_dim: int, boxsize: float, kind: str = "sc", dtype=jnp.float32):
    """Pre-IC particle lattice: sc/bcc/fcc (reference ic.py:1199-1446).

    sc:  n³ particles at cell centers
    bcc: 2·n³ (sc + body-centered copy shifted by ½ cell diagonal)
    fcc: 4·n³ (sc + three face-centered copies)
    Returns (N,3) positions.
    """
    n = n_per_dim
    h = boxsize / n
    idx = np.indices((n, n, n)).reshape(3, -1).T  # (n³, 3)
    base = (idx + 0.5) * h
    if kind == "sc":
        pos = base
    elif kind == "bcc":
        pos = np.concatenate([base, base + 0.5 * h])
    elif kind == "fcc":
        shifts = np.array(
            [[0, 0, 0], [0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]
        ) * h
        pos = np.concatenate([base + s for s in shifts])
    else:
        raise ValueError(f"unknown lattice kind {kind!r}")
    pos = np.mod(pos, boxsize)
    return jnp.asarray(pos, dtype=dtype)
