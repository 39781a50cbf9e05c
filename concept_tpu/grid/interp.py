"""Particle ↔ mesh interpolation at orders 1-4 (NGP/CIC/TSC/PCS).

TPU-native redesign of reference src/mesh.py:5052-5413
(particle_interpolation_loop_* + weight functions) and
interpolate_particles/interpolate_domaingrid_to_particles
(mesh.py:1512, 376).

Instead of per-particle C loops, deposits are expressed as vectorized
scatter-adds (optionally sort+segment-sum) and force interpolation as
vectorized gathers — XLA lowers these to efficient TPU sort/gather
networks; a Pallas bucketed kernel can be slotted in behind the same API.

Grid convention: cell-centered (reference param ``cell_centered = True``,
param/example_explanatory:398): grid point (i,j,k) sits at
((i+½)h, (j+½)h, (k+½)h) with h = boxsize/gridsize.

B-spline weights (x = signed distance particle→grid point in cell units):
  NGP (1): top-hat      CIC (2): 1-|x|
  TSC (3): ¾-x² / ½(3/2-|x|)²      PCS (4): (4-6x²+3|x|³)/6 / (2-|x|)³/6
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ORDER_NAMES = {"NGP": 1, "CIC": 2, "TSC": 3, "PCS": 4}


def interpolation_order(order) -> int:
    if isinstance(order, str):
        return ORDER_NAMES[order.upper()]
    return int(order)


def _offsets_and_weights(u, order: int):
    """Per-dimension cell indices and weights.

    u: (N,) particle coordinate in units of cell width (cell-centered:
    u = pos/h - 0.5 so that u=integer means 'at grid point').
    Returns (idx, w): idx (N, order) int32 cell indices (unwrapped),
    w (N, order) weights summing to 1.
    """
    if order == 1:  # NGP
        i0 = jnp.round(u).astype(jnp.int32)
        return i0[:, None], jnp.ones_like(u)[:, None]
    if order == 2:  # CIC
        i0 = jnp.floor(u).astype(jnp.int32)
        f = u - i0
        idx = jnp.stack([i0, i0 + 1], axis=1)
        w = jnp.stack([1 - f, f], axis=1)
        return idx, w
    if order == 3:  # TSC
        i0 = jnp.round(u).astype(jnp.int32)
        f = u - i0  # in [-1/2, 1/2]
        idx = jnp.stack([i0 - 1, i0, i0 + 1], axis=1)
        w_m = 0.5 * (0.5 - f) ** 2
        w_0 = 0.75 - f**2
        w_p = 0.5 * (0.5 + f) ** 2
        return idx, jnp.stack([w_m, w_0, w_p], axis=1)
    if order == 4:  # PCS
        i0 = jnp.floor(u).astype(jnp.int32)
        f = u - i0  # in [0, 1)
        idx = jnp.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=1)
        # distances: 1+f, f, 1-f, 2-f
        w0 = (1 - f) ** 3 / 6  # at distance 1+f: (2-(1+f))³/6
        w1 = (4 - 6 * f**2 + 3 * f**3) / 6
        w2 = (4 - 6 * (1 - f) ** 2 + 3 * (1 - f) ** 3) / 6
        w3 = f**3 / 6
        return idx, jnp.stack([w0, w1, w2, w3], axis=1)
    raise ValueError(f"interpolation order {order} not in 1-4")


def _corner_indices_weights(pos, gridsize: int, boxsize: float, order: int):
    """Flattened periodic grid indices and weights for all order³ corners.

    Returns (flat_idx, w): (N, order³) int32 and weights.
    """
    n = gridsize
    h = boxsize / n
    u = pos / h - 0.5  # cell-centered
    ix, wx = _offsets_and_weights(u[:, 0], order)
    iy, wy = _offsets_and_weights(u[:, 1], order)
    iz, wz = _offsets_and_weights(u[:, 2], order)
    ix = jnp.mod(ix, n)
    iy = jnp.mod(iy, n)
    iz = jnp.mod(iz, n)
    # Outer products via broadcasting: (N, o, 1, 1)*(N, 1, o, 1)*(N, 1, 1, o)
    o = order
    w = (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    ).reshape(-1, o * o * o)
    flat = (
        (ix[:, :, None, None] * n + iy[:, None, :, None]) * n + iz[:, None, None, :]
    ).reshape(-1, o * o * o)
    return flat, w


@partial(jax.jit, static_argnames=("gridsize", "order", "method"))
def deposit(pos, quantity, gridsize: int, boxsize: float, order=2, method: str = "scatter"):
    """Deposit per-particle ``quantity`` onto a (n,n,n) grid.

    pos: (N,3) positions in [0, boxsize).  quantity: scalar or (N,) values.
    Returns the raw deposited grid (no volume normalization) — the sum over
    the grid equals sum(quantity) exactly (mass conservation).

    method='scatter': XLA scatter-add.
    method='sort': sort by flat cell index + segment-sum (TPU-friendlier
    for highly clustered particles).
    """
    n = gridsize
    order = interpolation_order(order)
    flat, w = _corner_indices_weights(pos, n, boxsize, order)
    q = jnp.broadcast_to(jnp.asarray(quantity, dtype=w.dtype), (pos.shape[0],))
    vals = (w * q[:, None]).reshape(-1)
    flat = flat.reshape(-1)
    if method == "sort":
        sort_idx = jnp.argsort(flat)
        flat = flat[sort_idx]
        vals = vals[sort_idx]
        grid = jax.ops.segment_sum(
            vals, flat, num_segments=n * n * n, indices_are_sorted=True
        )
    else:
        grid = jnp.zeros((n * n * n,), dtype=vals.dtype).at[flat].add(vals)
    return grid.reshape(n, n, n)


@partial(jax.jit, static_argnames=("order",))
def gather(grid, pos, boxsize: float, order=2):
    """Interpolate grid values at particle positions (force gather).

    grid: (n,n,n).  pos: (N,3).  Returns (N,) values.
    Reference: mesh.py:376 interpolate_domaingrid_to_particles.
    """
    n = grid.shape[0]
    order = interpolation_order(order)
    flat, w = _corner_indices_weights(pos, n, boxsize, order)
    vals = grid.reshape(-1)[flat]
    return jnp.sum(vals * w, axis=1)


def gather_vector(grids, pos, boxsize: float, order=2):
    """Gather a 3-vector field given as (3,n,n,n) → (N,3)."""
    return jnp.stack([gather(grids[d], pos, boxsize, order) for d in range(3)], axis=1)
