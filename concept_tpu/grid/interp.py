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


def default_deposit_method() -> str:
    """'sorted' on TPU (duplicate-index scatter serializes there),
    'scatter' elsewhere (CPU/GPU scatter-add is fine and compiles faster)."""
    return "sorted" if jax.default_backend() == "tpu" else "scatter"


def interpolation_order(order) -> int:
    if isinstance(order, str):
        return ORDER_NAMES[order.upper()]
    return int(order)


def _offsets_and_weights(u, order: int):
    """Per-dimension cell indices and weights.

    u: (N,) particle coordinate in units of cell width (cell-centered:
    u = pos/h - 0.5 so that u=integer means 'at grid point').
    Returns (idx, w): LISTS of ``order`` (N,) arrays — int32 cell indices
    (unwrapped) and weights summing to 1.  Lists of flat arrays, not
    stacked (N, order): a trailing length-2..4 axis is tile-padded up to
    64× by the TPU (8,128) layout, which is fatal at large N.
    """
    if order == 1:  # NGP
        i0 = jnp.round(u).astype(jnp.int32)
        return [i0], [jnp.ones_like(u)]
    if order == 2:  # CIC
        i0 = jnp.floor(u).astype(jnp.int32)
        f = u - i0
        return [i0, i0 + 1], [1 - f, f]
    if order == 3:  # TSC
        i0 = jnp.round(u).astype(jnp.int32)
        f = u - i0  # in [-1/2, 1/2]
        w_m = 0.5 * (0.5 - f) ** 2
        w_0 = 0.75 - f**2
        w_p = 0.5 * (0.5 + f) ** 2
        return [i0 - 1, i0, i0 + 1], [w_m, w_0, w_p]
    if order == 4:  # PCS
        i0 = jnp.floor(u).astype(jnp.int32)
        f = u - i0  # in [0, 1)
        # distances: 1+f, f, 1-f, 2-f
        w0 = (1 - f) ** 3 / 6  # at distance 1+f: (2-(1+f))³/6
        w1 = (4 - 6 * f**2 + 3 * f**3) / 6
        w2 = (4 - 6 * (1 - f) ** 2 + 3 * (1 - f) ** 3) / 6
        w3 = f**3 / 6
        return [i0 - 1, i0, i0 + 1, i0 + 2], [w0, w1, w2, w3]
    raise ValueError(f"interpolation order {order} not in 1-4")


def _corner_indices_weights(pos, gridsize: int, boxsize: float, order: int):
    """Flattened periodic grid indices and weights for all order³ corners.

    Returns (flat_idx, w): (order³·N,) int32 and weights, corner-major
    (corner c's entries at [c·N, (c+1)·N)) — pure 1D concatenation, no
    small trailing axes (see _offsets_and_weights)."""
    n = gridsize
    h = boxsize / n
    u = pos / h - 0.5  # cell-centered
    ix, wx = _offsets_and_weights(u[:, 0], order)
    iy, wy = _offsets_and_weights(u[:, 1], order)
    iz, wz = _offsets_and_weights(u[:, 2], order)
    ix = [jnp.mod(i, n) for i in ix]
    iy = [jnp.mod(i, n) for i in iy]
    iz = [jnp.mod(i, n) for i in iz]
    flats, ws = [], []
    for a in range(order):
        for b in range(order):
            for c in range(order):
                flats.append((ix[a] * n + iy[b]) * n + iz[c])
                ws.append(wx[a] * wy[b] * wz[c])
    return jnp.concatenate(flats), jnp.concatenate(ws)


# Particles per compiled scatter/gather op.  The TPU compiler (and its
# memory) struggle with single scatter ops beyond ~4M·order³ updates, so
# larger particle counts are processed as a lax.scan over fixed-size
# chunks — one compiled body, bounded op sizes, negligible overhead.
CHUNK = 1 << 21  # 2,097,152


# How far below the particle's cell the lowest interpolation corner sits
# (NGP: at round(u); CIC: floor(u); TSC: round(u)−1; PCS: floor(u)−1) —
# the lowest reachable index is −_LO[order] and the highest n−1+order−1−_LO.
_LO = {1: 0, 2: 1, 3: 1, 4: 2}


def _fold_axis(arr, axis: int, n: int, lo: int, order: int):
    """Fold the unwrapped borders of one axis (extent n+order) back into
    the periodic [0, n) range: unwrapped index iu holds true index iu−lo,
    wrapping mod n."""
    m = n + order
    hi_size = m - (lo + n)

    def take(a, start, size):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, start + size)
        return a[tuple(idx)]

    main = take(arr, lo, n)
    if hi_size > 0:
        idx = [slice(None)] * main.ndim
        idx[axis] = slice(0, hi_size)
        main = main.at[tuple(idx)].add(take(arr, lo + n, hi_size))
    if lo > 0:
        idx = [slice(None)] * main.ndim
        idx[axis] = slice(n - lo, n)
        main = main.at[tuple(idx)].add(take(arr, 0, lo))
    return main


def _deposit_sorted(pos, q, gridsize: int, boxsize: float, order: int):
    """Scatter-free deposit: sort by cell + segment sums via cumsum.

    TPU rationale: scatter-add with DUPLICATE indices serializes on TPU,
    but sorts, cumsums, gathers and UNIQUE-index scatters are fast.
      1. one multi-operand lax.sort keyed by the base-cell index on an
         UNWRAPPED (n+order)³ grid (no modulo → corner index = base +
         constant shift stays sorted for every corner)
      2. per corner: inclusive cumsum of weights; the per-cell total is
         cumsum@(own last entry) − cumsum@(previous occupied cell's last
         entry), realized with one unique-index scatter and a cummax
         gap-fill
      3. fold the unwrapped border planes back periodically
    Replaces the per-particle scatter of the reference's interpolation
    loops (mesh.py:5052-5413) with O(N log N) vectorized primitives.
    """
    n = gridsize
    h = boxsize / n
    N = pos.shape[0]
    dtype = pos.dtype
    u = pos / h - 0.5
    # anchor index and fractional offset per dim (weights are pure
    # functions of f — carried through the sort instead of all `order`
    # weight columns, minimizing the sort payload)
    if order in (1, 3):  # NGP/TSC anchor at round(u), f ∈ [-1/2, 1/2]
        anchor = jnp.round(u).astype(jnp.int32)
    else:  # CIC/PCS anchor at floor(u), f ∈ [0, 1)
        anchor = jnp.floor(u).astype(jnp.int32)
    f = (u - anchor).astype(dtype)
    first = {1: 0, 2: 0, 3: -1, 4: -1}[order]  # lowest corner rel. anchor
    lo = _LO[order]
    m = n + order
    bx = jnp.clip(anchor[:, 0] + first + lo, 0, m - order)
    by = jnp.clip(anchor[:, 1] + first + lo, 0, m - order)
    bz = jnp.clip(anchor[:, 2] + first + lo, 0, m - order)
    key = (bx * m + by) * m + bz
    sorted_ops = jax.lax.sort(
        [key, jnp.broadcast_to(q, (N,)).astype(dtype), f[:, 0], f[:, 1], f[:, 2]],
        num_keys=1,
    )
    key_s, q_s, fx_s, fy_s, fz_s = sorted_ops

    def corner_weights(fc, c):
        """Weight of corner index c (0..order-1 from the lowest) at
        fractional offset fc (same B-splines as _offsets_and_weights)."""
        if order == 1:
            return jnp.ones_like(fc)
        if order == 2:
            return 1 - fc if c == 0 else fc
        if order == 3:
            return (
                0.5 * (0.5 - fc) ** 2,
                0.75 - fc**2,
                0.5 * (0.5 + fc) ** 2,
            )[c]
        return (
            (1 - fc) ** 3 / 6,
            (4 - 6 * fc**2 + 3 * fc**3) / 6,
            (4 - 6 * (1 - fc) ** 2 + 3 * (1 - fc) ** 3) / 6,
            fc**3 / 6,
        )[c]


    M = m * m * m
    is_end = jnp.concatenate([key_s[1:] != key_s[:-1], jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    end_keys = jnp.where(is_end, key_s, M)

    def seg_combine(a, b):
        # segmented-scan monoid: restart the running sum at segment starts
        va, sa = a
        vb, sb = b
        return jnp.where(sb, vb, va + vb), sa | sb

    corners = jnp.asarray(
        [(cx, cy, cz) for cx in range(order) for cy in range(order) for cz in range(order)],
        dtype=jnp.int32,
    )

    def _w_switch(c, fc):
        return jax.lax.switch(
            c, [lambda fc=fc, cc=cc: corner_weights(fc, cc) for cc in range(order)]
        )

    def corner_body(grid_u, corner):
        cx, cy, cz = corner[0], corner[1], corner[2]
        vals = q_s * _w_switch(cx, fx_s) * _w_switch(cy, fy_s) * _w_switch(cz, fz_s)
        # exact per-segment inclusive sums (no cross-segment cancellation
        # — unlike a global cumsum difference)
        segsum, _ = jax.lax.associative_scan(seg_combine, (vals, is_start))
        seg = jnp.zeros((M + 1,), dtype).at[end_keys].set(
            segsum, unique_indices=True
        )[:M].reshape(m, m, m)
        # corner (cx,cy,cz): shifted dense add — base cells sit ≤ m−order
        # per dim, so a roll by < order never wraps a nonzero entry
        grid_u = grid_u + jnp.roll(seg, (cx, cy, cz), axis=(0, 1, 2))
        return grid_u, None

    grid_u, _ = jax.lax.scan(corner_body, jnp.zeros((m, m, m), dtype), corners)
    for axis in range(3):
        grid_u = _fold_axis(grid_u, axis, n, lo, order)
    return grid_u


def _deposit_chunk(grid_flat, pos, q, gridsize, boxsize, order, method):
    n = gridsize
    flat, w = _corner_indices_weights(pos, n, boxsize, order)
    vals = w * jnp.tile(q, order**3)
    if method == "sort":
        sort_idx = jnp.argsort(flat)
        flat = flat[sort_idx]
        vals = vals[sort_idx]
        return grid_flat + jax.ops.segment_sum(
            vals, flat, num_segments=n * n * n, indices_are_sorted=True
        )
    return grid_flat.at[flat].add(vals)


@partial(jax.jit, static_argnames=("gridsize", "order", "method"))
def deposit(pos, quantity, gridsize: int, boxsize: float, order=2, method: str = "scatter"):
    """Deposit per-particle ``quantity`` onto a (n,n,n) grid.

    pos: (N,3) positions in [0, boxsize).  quantity: scalar or (N,) values.
    Returns the raw deposited grid (no volume normalization) — the sum over
    the grid equals sum(quantity) exactly (mass conservation).

    method='scatter': XLA scatter-add.
    method='sort': sort by flat cell index + segment-sum.
    method='sorted': scatter-free sort+cumsum segment deposit
    (_deposit_sorted) — the TPU production path.
    """
    n = gridsize
    order = interpolation_order(order)
    N = pos.shape[0]
    dtype = pos.dtype
    q = jnp.broadcast_to(jnp.asarray(quantity, dtype=dtype), (N,))
    if method in ("auto", "pallas"):
        # 'pallas' reaches here only when the kernel path's preconditions
        # failed (non-CIC order, interlacing, distribution) — use the best
        # generic method instead
        method = default_deposit_method()
    if method == "sorted":
        return _deposit_sorted(pos, q, n, boxsize, order)
    grid = jnp.zeros((n * n * n,), dtype=dtype)
    if N <= CHUNK:
        grid = _deposit_chunk(grid, pos, q, n, boxsize, order, method)
        return grid.reshape(n, n, n)
    npad = (-N) % CHUNK
    pos_pad = jnp.concatenate([pos, jnp.zeros((npad, 3), dtype)], axis=0)
    q_pad = jnp.concatenate([q, jnp.zeros((npad,), dtype)], axis=0)
    n_chunks = (N + npad) // CHUNK
    pos_c = pos_pad.reshape(n_chunks, CHUNK, 3)
    q_c = q_pad.reshape(n_chunks, CHUNK)

    def body(g, xs):
        p, qq = xs
        return _deposit_chunk(g, p, qq, n, boxsize, order, method), None

    grid, _ = jax.lax.scan(body, grid, (pos_c, q_c))
    # padded particles deposited q=0 at the origin cell — no effect
    return grid.reshape(n, n, n)


def _gather_chunk(grid_flat, pos, n, boxsize, order):
    flat, w = _corner_indices_weights(pos, n, boxsize, order)
    vals = grid_flat[flat] * w  # (order³·N,) corner-major
    return jnp.sum(vals.reshape(order**3, -1), axis=0)


@partial(jax.jit, static_argnames=("order",))
def gather(grid, pos, boxsize: float, order=2):
    """Interpolate grid values at particle positions (force gather).

    grid: (n,n,n).  pos: (N,3).  Returns (N,) values.
    Reference: mesh.py:376 interpolate_domaingrid_to_particles.
    """
    n = grid.shape[0]
    order = interpolation_order(order)
    N = pos.shape[0]
    grid_flat = grid.reshape(-1)
    if N <= CHUNK:
        return _gather_chunk(grid_flat, pos, n, boxsize, order)
    npad = (-N) % CHUNK
    pos_pad = jnp.concatenate([pos, jnp.zeros((npad, 3), pos.dtype)], axis=0)
    n_chunks = (N + npad) // CHUNK
    pos_c = pos_pad.reshape(n_chunks, CHUNK, 3)

    def body(_, p):
        return None, _gather_chunk(grid_flat, p, n, boxsize, order)

    _, vals = jax.lax.scan(body, None, pos_c)
    return vals.reshape(-1)[:N]


def gather_vector(grids, pos, boxsize: float, order=2):
    """Gather a 3-vector field given as (3,n,n,n) → (N,3)."""
    return jnp.stack([gather(grids[d], pos, boxsize, order) for d in range(3)], axis=1)
