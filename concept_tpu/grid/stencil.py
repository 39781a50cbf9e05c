"""Real-space finite differencing of periodic grids.

Reference: src/mesh.py:4874 (diff_domaingrid) — symmetric stencils of
order 2/4/6/8.  On TPU these are shift-and-add (jnp.roll) operations that
XLA fuses into a single VPU pass; under sharding, rolls along the sharded
axis lower to ICI ppermute halo exchanges automatically.
"""

from __future__ import annotations

import jax.numpy as jnp

# Central-difference coefficients for f'(x): weight of f(x ± i·h)
_COEFFS = {
    2: (1 / 2,),
    4: (2 / 3, -1 / 12),
    6: (3 / 4, -3 / 20, 1 / 60),
    8: (4 / 5, -1 / 5, 4 / 105, -1 / 280),
}


def diff_grid(grid, boxsize: float, dim: int, order: int = 4):
    """∂grid/∂x_dim with an order-``order`` central stencil (periodic)."""
    n = grid.shape[dim]
    h = boxsize / n
    coeffs = _COEFFS[order]
    out = jnp.zeros_like(grid)
    for i, c in enumerate(coeffs, start=1):
        out = out + c * (jnp.roll(grid, -i, axis=dim) - jnp.roll(grid, i, axis=dim))
    return out / h
