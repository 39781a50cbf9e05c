"""Particle-mesh (PM) gravity.

TPU-native redesign of the reference PM pipeline
(reference: src/interactions.py:1985-2415 particle_mesh +
apply_particle_mesh_force; potential factor −4πG/|k|² at
interactions.py:2092-2113, long-range Gaussian cutoff exp(−rₛ²k²) for P³M).

Pipeline (all inside one jit, fully vectorized):
  deposit ϱ (comoving density) → rfft3 → φ(k) = −4πG ϱ(k)/k² ·
  deconv^(2·order) [· exp(−rₛ²k²)] → ∂φ via ik (Fourier) or real-space
  stencils → gather at particles → Δmom = −m ∇φ · ᔑa^(−3w_eff−...)dt.

The deposited quantity is the *time-independent* comoving density ϱ, so
the full time dependence a⁻¹ (matter) sits in the exact kick integral
ᔑ a⁻¹dt — equivalent to the reference's a²ρ-at-kick-time formulation to
leapfrog order, but exactly integrable.
"""

from __future__ import annotations

import math

import jax

import jax.numpy as jnp

from concept_tpu.grid.fft import GridDistribution, rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.grid.interp import deposit, gather


# Interlacing lattices (reference mesh.py:78-183 Lattice): shifts in
# cell units applied to particles; each shifted deposit is phase-rotated
# back in k-space and the primitives averaged, cancelling the leading
# image aliases ('bcc': odd images; 'fcc': odd + half of the even).
INTERLACE_SHIFTS = {
    "sc": [(0.0, 0.0, 0.0)],
    "bcc": [(0.0, 0.0, 0.0), (0.5, 0.5, 0.5)],
    "fcc": [
        (0.0, 0.0, 0.0),
        (0.0, 0.5, 0.5),
        (0.5, 0.0, 0.5),
        (0.5, 0.5, 0.0),
    ],
}


def interlace_lattice(interlace) -> str:
    """Canonicalize an interlace option (bool or lattice name) to a
    lattice kind ('sc' = no interlacing; True = 'bcc', the reference
    default interlacing)."""
    if interlace is True:
        return "bcc"
    if interlace in (False, None):
        return "sc"
    kind = str(interlace).lower()
    if "body" in kind:
        kind = "bcc"
    elif "face" in kind:
        kind = "fcc"
    elif "simple" in kind or kind == "":
        kind = "sc"
    if kind not in INTERLACE_SHIFTS:
        raise ValueError(f"unknown interlacing lattice {interlace!r}")
    return kind


def interlace_pair(interlace) -> tuple[str, str]:
    """(upstream, downstream) lattice kinds from a bool/str/pair option
    (reference potential_options['interlace'] is an upstream/downstream
    pair, interactions.py:1930-2191: upstream interlaces the source
    deposit, downstream the force interpolation)."""
    if isinstance(interlace, (tuple, list)):
        up, down = interlace
        return interlace_lattice(up), interlace_lattice(down)
    return interlace_lattice(interlace), "sc"


def density_slab(
    pos,
    masses,
    gridsize: int,
    boxsize: float,
    order: int = 2,
    dist: GridDistribution | None = None,
    deposit_method: str = "scatter",
    interlace=False,
):
    """Deposit particles → comoving density ϱ(k) (rfft layout).

    pos: (N,3) or list of (N_i,3); masses: scalar or list.
    ``interlace``: False/'sc' (none), True/'bcc' (half-cell diagonal
    2-point) or 'fcc' (4-point face shifts) — shifted deposits combined
    in k-space (reference Lattice interlacing, mesh.py:77-183).
    """
    n = gridsize
    cell_volume = (boxsize / n) ** 3
    pos_list = pos if isinstance(pos, (list, tuple)) else [pos]
    mass_list = masses if isinstance(masses, (list, tuple)) else [masses]

    def _deposit(p, m):
        if dist is not None and dist.mesh is not None:
            from concept_tpu.parallel.step import deposit_distributed

            return deposit_distributed(p, m, n, boxsize, order, dist, deposit_method)
        return deposit(p, m, n, boxsize, order=order, method=deposit_method)

    h = boxsize / n
    shifts = INTERLACE_SHIFTS[interlace_lattice(interlace)]
    slab = None
    for shift in shifts:
        grid = None
        off = jnp.asarray(shift) * h
        for p, m in zip(pos_list, mass_list):
            pp = jnp.mod(p + off, boxsize) if any(shift) else p
            g = _deposit(pp, m)
            grid = g if grid is None else grid + g
        s = rfft3(grid / cell_volume, dist)
        if any(shift):
            # undo the particle shift in k-space
            s = s * fourier.interlace_phase(
                n, boxsize, tuple(-c for c in shift)
            )
        slab = s if slab is None else slab + s
    return slab / len(shifts)


def gravity_potential_slab(
    rho_slab,
    gridsize: int,
    boxsize: float,
    G: float,
    deconv_order: int = 0,
    longrange_scale: float | None = None,
):
    """φ(k) = −4πG ϱ(k)/|k|² (·exp(−rₛ²|k|²) for the P³M long-range part).

    deconv_order: total sinc-deconvolution power (upstream+downstream,
    promoted to a single global factor as in reference
    interactions.py:2060-2080).
    """
    n = gridsize
    kfac2 = (2 * math.pi / boxsize) ** 2
    k2i = fourier.k2_int_grid(n).astype(rho_slab.real.dtype)
    k2 = kfac2 * k2i
    factor = jnp.where(k2 > 0, -4 * math.pi * G / jnp.where(k2 > 0, k2, 1.0), 0.0)
    if longrange_scale is not None:
        factor = factor * jnp.exp(-(longrange_scale**2) * k2)
    if deconv_order:
        factor = factor * fourier.deconvolution_factor(n, deconv_order)
    phi = rho_slab * factor
    return fourier.nullify_origin(phi)


def potential_gradient_grids(
    phi_slab, gridsize: int, boxsize: float, dist=None, differentiation: str | int = "fourier"
):
    """∂φ/∂x_d real grids, d = 0,1,2.

    differentiation='fourier' (order 0 in the reference's parlance,
    mesh.py:3466) or real-space stencil order 2/4/6/8
    (reference diff_domaingrid, mesh.py:4874).
    """
    n = gridsize
    if differentiation == "fourier" or differentiation == 0:
        return jnp.stack([
            irfft3(fourier.fourier_diff(phi_slab, n, boxsize, d), n, dist)
            for d in range(3)
        ])
    order = int(differentiation)
    phi = irfft3(phi_slab, n, dist)
    from concept_tpu.grid.stencil import diff_grid

    return jnp.stack([diff_grid(phi, boxsize, d, order) for d in range(3)])


def pm_gravity_momentum_updates(
    pos_list,
    mass_list,
    gridsize: int,
    boxsize: float,
    G: float,
    kick_integral,
    order: int = 2,
    deconvolve: tuple = (True, True),
    dist: GridDistribution | None = None,
    differentiation: str | int = "fourier",
    deposit_method: str = "scatter",
    longrange_scale: float | None = None,
    interlace: bool = False,
):
    """Full PM force application: returns Δmom list aligned with pos_list.

    kick_integral: ᔑ a^(−1)dt (matter) — the exact time integral of the
    potential's a-dependence over the kick interval.
    deconvolve: (upstream, downstream) — compensate the deposit and/or the
    force-interpolation window (reference potential_options['deconvolve'],
    promotion to a global factor at interactions.py:2060-2080).
    """
    il_up, il_down = interlace_pair(interlace)
    if deposit_method == "pallas" and order == 2 and (il_up, il_down) == ("sc", "sc") and (
        dist is None or dist.mesh is None
    ):
        return _pm_updates_pallas(
            pos_list, mass_list, gridsize, boxsize, G, kick_integral,
            deconvolve, longrange_scale,
        )
    rho = density_slab(
        pos_list, mass_list, gridsize, boxsize, order, dist, deposit_method, il_up
    )
    deconv_order = order * (int(deconvolve[0]) + int(deconvolve[1]))
    phi = gravity_potential_slab(
        rho, gridsize, boxsize, G, deconv_order=deconv_order, longrange_scale=longrange_scale
    )
    distributed = dist is not None and dist.mesh is not None
    if distributed:
        from concept_tpu.parallel.step import replicate

    h = boxsize / gridsize
    down_shifts = INTERLACE_SHIFTS[il_down]

    def gather_interlaced(grid_slab_fn, p):
        """Downstream-interlaced force interpolation (reference
        interactions.py:2188-2191 lattice_downstream): for each primitive
        shift s, interpolate the phase-rotated grid at pos + s·h and
        average."""
        acc = None
        for shift in down_shifts:
            g = grid_slab_fn(shift)
            # the +s-shifted grid's points sit at (j+½+s)h: gather with
            # the particle coordinate expressed in that frame, p − s·h
            pp = jnp.mod(p - jnp.asarray(shift) * h, boxsize) if any(shift) else p
            val = gather(g, pp, boxsize, order=order)
            acc = val if acc is None else acc + val
        return acc / len(down_shifts)

    if differentiation == "fourier" or differentiation == 0:
        # One gradient dimension at a time: only a single real grid is live
        # alongside φ(k), keeping peak HBM ≈ 2 grids instead of 4 — crucial
        # for 512³ on a single chip.
        updates = [jnp.zeros_like(p) for p in pos_list]
        for d in range(3):
            grads = {}

            def grad_for(shift, d=d):
                if shift not in grads:
                    phi_s = phi
                    if any(shift):
                        # samples on the +s-shifted grid: F̂·e^{+ik·sh}
                        # = F̂·interlace_phase(−s)
                        phi_s = phi * fourier.interlace_phase(
                            gridsize, boxsize, tuple(-c for c in shift)
                        )
                    g = irfft3(
                        fourier.fourier_diff(phi_s, gridsize, boxsize, d),
                        gridsize, dist,
                    )
                    if distributed:
                        g = replicate(g, dist)
                    grads[shift] = g
                return grads[shift]

            for i, (p, m) in enumerate(zip(pos_list, mass_list)):
                comp = gather_interlaced(grad_for, p)
                updates[i] = updates[i].at[:, d].set((-m * kick_integral) * comp)
        return updates

    # stencil differentiation: downstream interlacing gets one real-space
    # gradient-grid set per primitive shift (φ phase-rotated in Fourier
    # space, then stencil-differentiated) — reference lattice_downstream
    # semantics, interactions.py:2188-2191 (ADVICE r2: previously the
    # requested lattice was silently ignored on this path)
    grad_cache = {}

    def grads_for(shift):
        if shift not in grad_cache:
            phi_s = phi
            if any(shift):
                phi_s = phi * fourier.interlace_phase(
                    gridsize, boxsize, tuple(-c for c in shift)
                )
            g = potential_gradient_grids(
                phi_s, gridsize, boxsize, dist, differentiation
            )
            if distributed:
                g = replicate(g, dist)
            grad_cache[shift] = g
        return grad_cache[shift]

    updates = []
    for p, m in zip(pos_list, mass_list):
        force = None
        for shift in down_shifts:
            gradphi = grads_for(shift)
            pp = jnp.mod(p - jnp.asarray(shift) * h, boxsize) if any(shift) else p
            f = jnp.stack(
                [gather(gradphi[d], pp, boxsize, order=order) for d in range(3)],
                axis=1,
            )
            force = f if force is None else force + f
        updates.append((-m * kick_integral / len(down_shifts)) * force)
    return updates


def _pm_updates_pallas(
    pos_list, mass_list, gridsize: int, boxsize: float, G: float,
    kick_integral, deconvolve, longrange_scale,
):
    """PM force via the Pallas deposit/gather kernels (CIC, single device).

    The bucket structure (one sort) is shared between the deposit and the
    force gather; block-capacity overflow falls back to the exact plain
    paths.  Interpret mode on non-TPU backends keeps semantics identical
    everywhere (the analogue of the reference's pure-Python mode).
    """
    from concept_tpu.grid.bucketed import bucketize_blocks
    from concept_tpu.grid.pallas_pm import deposit_pallas, gather_pallas

    n = gridsize
    interpret = jax.default_backend() != "tpu"
    cell_volume = (boxsize / n) ** 3
    mean_per_block = sum(p.shape[0] for p in pos_list) * 8 / n**3
    capacity = max(16, int(4 * mean_per_block))
    bks = []
    overflow_sets = []
    grid = None
    for p, m in zip(pos_list, mass_list):
        N = p.shape[0]
        bk = bucketize_blocks(p, m, n, boxsize, capacity=capacity, uniform_q=True)
        bks.append(bk)
        g = deposit_pallas(bk, n, interpret=interpret)
        # exact overflow fallback on a FIXED-SIZE subset (overflowing
        # particles are rare by capacity choice; the subset buffer keeps
        # the fallback O(N/16) instead of re-running the full plain path)
        max_over = max(256, N // 16)
        over_sorted_idx = jnp.nonzero(
            bk["overflow"], size=max_over, fill_value=N
        )[0].astype(jnp.int32)
        valid_over = over_sorted_idx < N
        over_orig_idx = jnp.where(
            valid_over,
            jnp.concatenate([bk["order"], jnp.zeros((1,), bk["order"].dtype)])[
                jnp.minimum(over_sorted_idx, N)
            ],
            N,  # fill entries target the scratch row
        )
        pos_over = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)])[
            jnp.minimum(over_orig_idx, N)
        ]
        q_over = jnp.where(valid_over, m, 0.0).astype(p.dtype)
        overflow_sets.append((over_orig_idx, pos_over, valid_over))
        g = g + deposit(pos_over, q_over, n, boxsize, order=2)
        grid = g if grid is None else grid + g
    slab = rfft3(grid / cell_volume)
    deconv_order = 2 * (int(deconvolve[0]) + int(deconvolve[1]))
    phi = gravity_potential_slab(
        slab, n, boxsize, G, deconv_order=deconv_order,
        longrange_scale=longrange_scale,
    )
    grads = jnp.stack([
        irfft3(fourier.fourier_diff(phi, n, boxsize, d), n) for d in range(3)
    ])
    updates = []
    for (p, m), bk, (over_idx, pos_over, valid_over) in zip(
        zip(pos_list, mass_list), bks, overflow_sets
    ):
        vals = gather_pallas(bk, grads, n, interpret=interpret)  # (C,K,3)
        flat = vals.reshape(-1, 3)
        N = p.shape[0]
        sorted_vals = jnp.concatenate(
            [flat, jnp.zeros((1, 3), flat.dtype)]
        )[jnp.minimum(bk["slot"], flat.shape[0])]
        force = jnp.zeros((N + 1, 3), flat.dtype).at[bk["order"]].set(sorted_vals)
        # plain gather only for the fixed-size overflow subset
        plain_over = jnp.stack(
            [gather(grads[d], pos_over, boxsize, order=2) for d in range(3)],
            axis=1,
        ) * valid_over[:, None]
        force = force.at[over_idx].set(plain_over)[:N]
        updates.append((-m * kick_integral) * force)
    return updates
