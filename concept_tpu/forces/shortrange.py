"""P³M short-range pairwise force via fixed-shape cell lists.

TPU-native redesign of the reference's hottest path: tile/subtile pairwise
iteration (reference interactions.py:1353-1984 particle_particle;
gravity.py:263 gravity_pairwise_shortrange; Tiling species.py:438-850).

The reference walks linked cell lists per (tile, neighbor-subtile, rung)
with per-pair table lookups.  Data-dependent loops don't map to TPU, so
the design here is:

  1. bucketize into SLOT-MAJOR (K, C) arrays: one multi-operand sort by
     cell id (cells of width ≥ the short-range cutoff) + slot scatters —
     the analogue of Tiling.sort (species.py:2657).  Slot-major is the
     layout the TPU (8, 128) tiling never pads (see bucketsim.py).
  2. pair sweep, memory O(C·K): scan over the 13 lexicographically
     positive neighbor offsets + the self cell (Newton's 3rd law — each
     unordered cell pair visited once, reaction accumulated on the
     neighbor side and rolled back, mirroring the reference's pair
     halving at interactions.py:483-512).  The inner loop scans over the
     K home slots, so the largest live temporary is (K, C) — never the
     (C, K, K, 3) pair block of a dense sweep (which is ~TB at 256³).
     Periodic wrap applied at the cell level via per-column box shifts
     (no per-pair minimum image).
  3. capacity overflow is EXACT, never silent: particles beyond the K-th
     slot of a cell go through a fixed-size compacted straggler path
     (pairwise vs the 27 neighbor buckets + all-pairs among themselves,
     with reactions scattered back), gated behind lax.cond.  The
     returned aux count lets hosts grow K (a static arg → re-jit).
  4. unsort: per-slot momentum updates are gathered back through the
     sort permutation.

The force law is the exact P³M Gaussian-split complement
(reference gravity.py:373 get_shortrange_table):
    F(r) = −G·m²·r⃗/r³ · [ erfc(r/(2rₛ)) + r/(rₛ√π)·exp(−r²/(4rₛ²)) ]
computed directly on the VPU (cheaper than the reference's tabulated
lookup, which exists to avoid erfc on CPUs).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def cell_grid_shape(boxsize: float, cutoff: float, max_cells: int = 512) -> int:
    """Cells per dimension: width ≥ cutoff (27-neighbor completeness)."""
    n = int(boxsize / cutoff)
    return max(1, min(n, max_cells))


def auto_capacity(N: int, n_cells: int, headroom: float = 1.3) -> int:
    """Bucket capacity from the mean occupancy, rounded up to 8.

    Sized for near-uniform configurations; clustered states overflow into
    the exact straggler path until the host grows the capacity (see
    Simulation.evolve occupancy refresh)."""
    mean = N / n_cells**3
    return max(8, int(math.ceil(headroom * mean / 8)) * 8)


# The 13 lexicographically positive offsets: together with the self cell
# and Newton's-3rd-law reactions they cover all 27 neighbors exactly once.
_HALF_OFFSETS = [
    (0, 0, 1), (0, 1, -1), (0, 1, 0), (0, 1, 1),
    (1, -1, -1), (1, -1, 0), (1, -1, 1),
    (1, 0, -1), (1, 0, 0), (1, 0, 1),
    (1, 1, -1), (1, 1, 0), (1, 1, 1),
]
_FULL_OFFSETS_27 = [
    (i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
]


@partial(jax.jit, static_argnames=("n_cells",))
def cell_counts(pos, boxsize, n_cells: int):
    """Per-cell occupancy (C,) — the host-side capacity-sizing probe.
    pos: (N,3) or 3-tuple of components."""
    px, py, pz = _split_components(pos)
    cw = boxsize / n_cells
    cell = jnp.zeros((px.shape[0],), jnp.int32)
    for comp in (px, py, pz):
        idx = jnp.clip((comp / cw).astype(jnp.int32), 0, n_cells - 1)
        cell = cell * n_cells + idx
    return jax.ops.segment_sum(
        jnp.ones((px.shape[0],), jnp.int32), cell, num_segments=n_cells**3
    )


def _split_components(pos):
    """(N,3) array or 3-tuple of (N,) components → component triple.

    Large-N TPU callers should pass the tuple form: a device-resident
    (N,3) f32 array is lane-padded ~42× by the (8,128) tiling."""
    if isinstance(pos, (tuple, list)):
        px, py, pz = pos
        return jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz)
    return pos[:, 0], pos[:, 1], pos[:, 2]


@partial(jax.jit, static_argnames=("n_cells", "capacity"))
def bucketize(pos, boxsize, n_cells: int, capacity: int):
    """Sort particles into slot-major (K, C) cell buckets.

    pos: (N,3) or a 3-tuple of (N,) component arrays (preferred at large
    N — see _split_components).

    Returns a dict:
      hx, hy, hz : (K, C) position components (0 in empty slots)
      valid      : (K, C) slot occupancy
      order      : (N,) original particle index per sorted position
      cell       : (N,) cell id in sorted order
      rank       : (N,) within-cell rank in sorted order (≥ capacity ⇒
                   the particle is NOT in the buckets: straggler)
      counts     : (C,) cell occupancy (unclamped)
    No particle is ever dropped: callers route rank ≥ capacity through
    the exact straggler path (see shortrange_momentum_updates).

    TPU cost note: the slot arrays are built by a MONOTONE (K,C)-shaped
    gather from the sorted stream (slot (k,c) reads sorted index
    starts[c]+k) — no scatters.  Scatter ≈ 1.3e8 updates/s on TPU while
    gather/sort run ≈ 6e8/s, so the gather formulation is ~5× cheaper at
    16M particles.
    """
    px0, py0, pz0 = _split_components(pos)
    N = px0.shape[0]
    C = n_cells**3
    K = capacity
    cw = boxsize / n_cells
    cell = jnp.zeros((N,), jnp.int32)
    for comp in (px0, py0, pz0):
        idx = jnp.clip((comp / cw).astype(jnp.int32), 0, n_cells - 1)
        cell = cell * n_cells + idx
    iota = jnp.arange(N, dtype=jnp.int32)
    cell_s, px, py, pz, order = jax.lax.sort(
        [cell, px0, py0, pz0, iota], num_keys=1
    )
    # per-cell starts via sorted segment-sum + cumsum: jnp.searchsorted
    # (binary-search gathers per query) costs ~75× more at 16M cells
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), cell_s, num_segments=C,
        indices_are_sorted=True,
    )
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[cell_s]
    # slot SCATTER build: N writes regardless of capacity (a (K,C)-shaped
    # gather build costs K·C reads); validity comes from counts for free
    in_bucket = rank < K
    slot = jnp.where(in_bucket, rank * C + cell_s, K * C)

    def scat(vals):
        return (
            jnp.zeros((K * C,), vals.dtype)
            .at[slot].set(vals, mode="drop", unique_indices=True)
            .reshape(K, C)
        )

    hx, hy, hz = scat(px), scat(py), scat(pz)
    valid = jnp.arange(K, dtype=jnp.int32)[:, None] < counts[None, :]
    return dict(hx=hx, hy=hy, hz=hz, valid=valid, order=order,
                cell=cell_s, rank=rank, counts=counts,
                px=px, py=py, pz=pz, starts=starts)


def softened_r3inv(r2, softening, kernel: str, dtype):
    """Softened r⁻³ per the ``softening_kernel`` parameter (reference
    get_softened_r3inv, interactions.py:1846-1910):

      'plummer': 1/(r²+ε²)^{3/2}
      'spline' : GADGET-2's Monaghan-Lattanzio cubic spline with
                 h = 2.8ε (the reference's default kernel)
      'none'   : plain 1/r³ (divergence removed by the caller's r² > 0
                 mask)

    softening is the Plummer-equivalent ε regardless of kernel.  All
    branches are vectorized jnp.where selections (TPU: no data-dependent
    control flow)."""
    if kernel == "plummer":
        r2s = r2 + softening * softening
        return jax.lax.rsqrt(r2s) / r2s
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, jnp.asarray(1e-30, dtype)))
    far = inv_r * inv_r * inv_r
    if kernel == "none":
        return far
    if kernel == "spline":
        h = 2.8 * softening
        inv_h = jnp.where(h > 0, 1.0 / jnp.maximum(h, 1e-30), 1e30)
        r = r2 * inv_r
        u = r * inv_h
        near = 32.0 * inv_h**3 * (1.0 / 3.0 + u * u * (-6.0 / 5.0 + u))
        mid = (32.0 / 3.0) * far * (
            u**3 * (2.0 + u * (-4.5 + u * (3.6 - u))) - 3.0 / 480.0
        )
        return jnp.where(u >= 1.0, far, jnp.where(u < 0.5, near, mid))
    raise ValueError(f"unknown softening kernel {kernel!r}")


def shortrange_force_factor(r2, scale, softening2, dtype,
                            kernel: str = "plummer"):
    """−S(x)·r⁻³_softened with the P³M screening
    S(x) = erfc(x/2) + x/√π·e^(−x²/4), x = r/scale (reference
    gravity.py:373 get_shortrange_table, which tabulates exactly this
    combination with spline softening).

    kernel='plummer' keeps the legacy fused form (screening evaluated at
    the softened r — indistinguishable beyond ε and exact at ε = 0);
    other kernels evaluate S at the true r."""
    if kernel == "plummer":
        r2s = r2 + softening2
        r = jnp.sqrt(r2s)
        x = r / scale
        fac = jax.scipy.special.erfc(0.5 * x) + x * (
            1 / math.sqrt(math.pi)
        ) * jnp.exp(-0.25 * x * x)
        return -fac / (r2s * r)
    r = jnp.sqrt(jnp.maximum(r2, jnp.asarray(1e-30, dtype)))
    x = r / scale
    fac = jax.scipy.special.erfc(0.5 * x) + x * (
        1 / math.sqrt(math.pi)
    ) * jnp.exp(-0.25 * x * x)
    return -fac * softened_r3inv(r2, jnp.sqrt(softening2), kernel, dtype)


def _cell_coords(n_cells: int):
    ids = np.arange(n_cells**3)
    ci = (ids // (n_cells * n_cells)).astype(np.int32)
    cj = ((ids // n_cells) % n_cells).astype(np.int32)
    ck = (ids % n_cells).astype(np.int32)
    return ci, cj, ck


def _sweep(hx, hy, hz, valid, n_cells: int, boxsize, scale, cutoff2, soft2,
           halve: bool, kernel: str = "plummer", offsets_half=None):
    """Slot-major pair sweep.  Returns per-slot acceleration acc (3, K, C).

    halve=True: 13 half offsets + self cell with Newton's-3rd-law reaction
    accumulation.  halve=False (n_cells < 3, where ±1 offsets alias): full
    per-dimension offset list, own side only.

    offsets_half: static override of the halved offset list — the
    narrow-cell unified layout (cells < cutoff) passes the positive-
    lexicographic half of pallas_shortrange.kept_offsets (reach 2).
    """
    K, C = valid.shape
    n = n_cells
    dtype = hx.dtype
    ci, cj, ck = _cell_coords(n)
    ci = jnp.asarray(ci)
    cj = jnp.asarray(cj)
    ck = jnp.asarray(ck)
    iotaK = jnp.arange(K)

    if halve:
        half = list(offsets_half) if offsets_half is not None else _HALF_OFFSETS
        offs = [(0, 0, 0)] + half
        self_flags = [True] + [False] * len(half)
    else:
        per_dim = {1: (0,), 2: (0, 1)}.get(n, (-1, 0, 1))
        offs = [(i, j, k) for i in per_dim for j in per_dim for k in per_dim]
        self_flags = [o == (0, 0, 0) for o in offs]
    offsets = jnp.asarray(offs, jnp.int32)
    flags = jnp.asarray(self_flags)
    # n_cells < 3 (halve=False): ±1 offsets alias, so the reduced offset
    # list reaches every cell — but a cell-level box shift cannot represent
    # both images a pair may need (home 0.05, neighbor 0.95: the near image
    # crosses the face only as seen from one side).  Per-pair minimum image
    # restores symmetry/momentum conservation there; cutoff ≤ boxsize/n
    # guarantees at most one image is in range for n = 2 (and matches the
    # established n = 1 semantics).
    min_image = not halve

    def one_offset(acc, xs):
        off, is_self = xs
        oi, oj, ok = off[0], off[1], off[2]

        def nbr(arr):
            return jnp.roll(
                arr.reshape(K, n, n, n), shift=(-oi, -oj, -ok), axis=(1, 2, 3)
            ).reshape(K, C)

        # periodic wrap: neighbor cell crossing a box face sits ±box away
        sx = ((ci + oi) // n).astype(dtype) * boxsize
        sy = ((cj + oj) // n).astype(dtype) * boxsize
        sz = ((ck + ok) // n).astype(dtype) * boxsize
        nbx = nbr(hx) + sx[None]
        nby = nbr(hy) + sy[None]
        nbz = nbr(hz) + sz[None]
        nbv = nbr(valid)

        def inner(nbacc, i):
            dx = hx[i][None] - nbx  # (K, C)
            dy = hy[i][None] - nby
            dz = hz[i][None] - nbz
            if min_image:
                dx = dx - boxsize * jnp.round(dx / boxsize)
                dy = dy - boxsize * jnp.round(dy / boxsize)
                dz = dz - boxsize * jnp.round(dz / boxsize)
            r2 = dx * dx + dy * dy + dz * dz
            m = valid[i][None] & nbv & (r2 < cutoff2) & (r2 > 0)
            if halve:
                # self cell: count each unordered pair once (j > i)
                m = m & (~is_self | (iotaK > i)[:, None])
            f = jnp.where(m, shortrange_force_factor(r2, scale, soft2, dtype, kernel), 0.0)
            fx, fy, fz = f * dx, f * dy, f * dz
            own = jnp.stack([fx.sum(0), fy.sum(0), fz.sum(0)])  # (3, C)
            if halve:
                nbacc = nbacc - jnp.stack([fx, fy, fz])
            return nbacc, own

        nbacc0 = jnp.zeros((3, K, C), dtype) if halve else jnp.zeros((), dtype)
        nbacc, own = jax.lax.scan(inner, nbacc0, jnp.arange(K))
        acc = acc + jnp.transpose(own, (1, 0, 2))  # (K,3,C) → (3,K,C)
        if halve:
            # reaction lives in the neighbor's frame: roll back to its cell
            acc = acc + jnp.roll(
                nbacc.reshape(3, K, n, n, n), shift=(oi, oj, ok), axis=(2, 3, 4)
            ).reshape(3, K, C)
        return acc, None

    acc0 = jnp.zeros((3, K, C), dtype)
    acc, _ = jax.lax.scan(one_offset, acc0, (offsets, flags))
    return acc


def _sweep_pair(bx, by, bz, bvalid, hx, hy, hz, valid, n_cells: int,
                boxsize, scale, cutoff2, soft2, kernel: str = "plummer",
                offsets_ext=None):
    """One-sided pair sweep: accelerations ON the receiver buckets
    (bx/by/bz/bvalid, K_r slots) FROM the supplier buckets (hx/hy/hz/
    valid, K_s slots) over all 27 neighbor offsets — the rung-subcycling
    kernel (only active-rung particles receive kicks at a substep;
    reference per-rung pairing, interactions.py:1353-1984).

    Both bucket structures share the same cell decomposition.  No Newton
    halving (receivers ≠ suppliers).  Returns (3, K_r, C).
    """
    K_r, C = bvalid.shape
    K_s = valid.shape[0]
    n = n_cells
    dtype = hx.dtype
    ci, cj, ck = _cell_coords(n)
    ci, cj, ck = jnp.asarray(ci), jnp.asarray(cj), jnp.asarray(ck)
    if offsets_ext is not None:
        offs = list(offsets_ext)
    else:
        per_dim = {1: (0,), 2: (0, 1)}.get(n, (-1, 0, 1))
        offs = [(i, j, k) for i in per_dim for j in per_dim for k in per_dim]
    offsets = jnp.asarray(offs, jnp.int32)
    min_image = n < 3  # see _sweep: cell-level shifts are one-sided there

    def one_offset(acc, off):
        oi, oj, ok = off[0], off[1], off[2]

        def nbr(arr):
            return jnp.roll(
                arr.reshape(K_s, n, n, n), shift=(-oi, -oj, -ok), axis=(1, 2, 3)
            ).reshape(K_s, C)

        sx = ((ci + oi) // n).astype(dtype) * boxsize
        sy = ((cj + oj) // n).astype(dtype) * boxsize
        sz = ((ck + ok) // n).astype(dtype) * boxsize
        nbx = nbr(hx) + sx[None]
        nby = nbr(hy) + sy[None]
        nbz = nbr(hz) + sz[None]
        nbv = nbr(valid)

        def inner(_, i):
            dx = bx[i][None] - nbx  # (K_s, C)
            dy = by[i][None] - nby
            dz = bz[i][None] - nbz
            if min_image:
                dx = dx - boxsize * jnp.round(dx / boxsize)
                dy = dy - boxsize * jnp.round(dy / boxsize)
                dz = dz - boxsize * jnp.round(dz / boxsize)
            r2 = dx * dx + dy * dy + dz * dz
            m = bvalid[i][None] & nbv & (r2 < cutoff2) & (r2 > 0)
            f = jnp.where(m, shortrange_force_factor(r2, scale, soft2, dtype, kernel), 0.0)
            return 0, jnp.stack([(f * dx).sum(0), (f * dy).sum(0), (f * dz).sum(0)])

        _, own = jax.lax.scan(inner, 0, jnp.arange(K_r))
        return acc + jnp.transpose(own, (1, 0, 2)), None

    acc0 = jnp.zeros((3, K_r, C), dtype)
    acc, _ = jax.lax.scan(one_offset, acc0, offsets)
    return acc


@partial(
    jax.jit,
    static_argnames=("n_cells", "capacity_recv", "capacity_sup", "engine",
                     "softening_kernel"),
)
def shortrange_momentum_updates_on_subset(
    recv_pos,
    sup_pos,
    mass,
    boxsize,
    scale,
    cutoff,
    n_cells: int,
    capacity_recv: int,
    capacity_sup: int,
    softening: float = 0.0,
    G: float = 1.0,
    engine: str = "auto",
    softening_kernel: str = "plummer",
    mass_sup=None,
):
    """Per-unit-kick-integral Δmom ON recv_pos (M,3) FROM sup_pos (N,3).

    Two uses: the rung-subcycling force (receivers = active-rung
    particles, suppliers everyone, one mass) and COMPONENT-PAIR
    short-range gravity (receiver component ≠ supplier component;
    mass_sup gives the supplier's particle mass — reference
    component_component pairing, interactions.py:122-615).  Capacities
    must cover the max cell occupancy of each set (host-sized via
    cell_counts; overflowing SUPPLIER particles would silently not act
    here, so callers must size capacity_sup to the true max).  Returns
    (M, 3) = G·m_recv·m_sup·acc (multiply by ᔑdt at use).
    """
    M = recv_pos.shape[0]
    dtype = recv_pos.dtype
    n = n_cells
    C = n**3
    b_sup = bucketize(sup_pos, boxsize, n_cells, capacity_sup)
    b_rec = bucketize(recv_pos, boxsize, n_cells, capacity_recv)
    cutoff2 = jnp.asarray(cutoff, dtype) ** 2
    soft2 = jnp.asarray(softening, dtype) ** 2
    if engine == "auto":
        engine = "pallas" if (jax.default_backend() == "tpu" and n >= 3) else "xla"
    if engine == "pallas":
        from concept_tpu.forces.pallas_shortrange import sweep_pallas_pair

        acc = sweep_pallas_pair(
            b_rec["hx"], b_rec["hy"], b_rec["hz"], b_rec["valid"],
            b_sup["hx"], b_sup["hy"], b_sup["hz"], b_sup["valid"],
            n_cells, jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
            jnp.asarray(cutoff, dtype), jnp.asarray(softening, dtype),
            interpret=(jax.default_backend() != "tpu"),
            kernel=softening_kernel,
        )
    else:
        acc = _sweep_pair(
            b_rec["hx"], b_rec["hy"], b_rec["hz"], b_rec["valid"],
            b_sup["hx"], b_sup["hy"], b_sup["hz"], b_sup["valid"],
            n_cells, jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
            cutoff2, soft2, kernel=softening_kernel,
        )
    K_r = capacity_recv
    slot = jnp.where(b_rec["rank"] < K_r, b_rec["rank"] * C + b_rec["cell"], 0)
    accf = acc.reshape(3, K_r * C)
    dmom_sorted = accf[:, slot].T
    dmom_sorted = jnp.where((b_rec["rank"] < K_r)[:, None], dmom_sorted, 0.0)
    coef = G * mass * (mass if mass_sup is None else mass_sup)
    return jnp.zeros((M, 3), dtype).at[b_rec["order"]].set(coef * dmom_sorted)


@partial(
    jax.jit,
    static_argnames=("n_cells", "capacity", "max_overflow", "return_overflow",
                     "engine", "softening_kernel"),
)
def shortrange_momentum_updates(
    pos,
    mass,
    boxsize,
    scale,
    cutoff,
    kick_integral,
    n_cells: int,
    capacity: int,
    softening: float = 0.0,
    G: float = 1.0,
    max_overflow: int = 2048,
    return_overflow: bool = False,
    engine: str = "auto",
    softening_kernel: str = "plummer",
):
    """Δmom from the P³M short-range force for a single self-interacting
    particle group.  Returns (N,3), or ((N,3), n_overflow) with
    return_overflow=True.

    kick_integral: ᔑ a^(−1) dt over the kick interval (matter).
    pos: (N,3) or 3-tuple of (N,) components; the return matches (tuple
    in → (dmx, dmy, dmz) tuple out).
    Memory is O(C·K + N); capacity overflow is handled exactly through
    the straggler path as long as the number of overflowing particles is
    ≤ max_overflow — hosts should monitor n_overflow and grow capacity.
    """
    tuple_in = isinstance(pos, (tuple, list))
    px0, py0, pz0 = _split_components(pos)
    N = px0.shape[0]
    dtype = px0.dtype
    n = n_cells
    C = n**3
    K = capacity
    kernel = softening_kernel  # also closed over by the straggler path
    b = bucketize((px0, py0, pz0), boxsize, n_cells, capacity)
    hx, hy, hz, valid = b["hx"], b["hy"], b["hz"], b["valid"]
    cutoff2 = jnp.asarray(cutoff, dtype) ** 2
    soft2 = jnp.asarray(softening, dtype) ** 2

    if engine == "auto":
        engine = "pallas" if (jax.default_backend() == "tpu" and n >= 3) else "xla"
    if engine == "pallas":
        from concept_tpu.forces.pallas_shortrange import sweep_pallas

        acc = sweep_pallas(
            hx, hy, hz, valid, n_cells, jnp.asarray(boxsize, dtype),
            jnp.asarray(scale, dtype), jnp.asarray(cutoff, dtype),
            jnp.asarray(softening, dtype),
            interpret=(jax.default_backend() != "tpu"),
            kernel=softening_kernel,
        )
    else:
        acc = _sweep(hx, hy, hz, valid, n_cells, jnp.asarray(boxsize, dtype),
                     jnp.asarray(scale, dtype), cutoff2, soft2, halve=(n >= 3),
                     kernel=softening_kernel)

    # ---- exact straggler path for capacity overflow -------------------- #
    n_overflow = N - jnp.sum(valid)
    S = max_overflow
    ci, cj, ck = _cell_coords(n)
    if n >= 3:
        offs27 = np.asarray(_FULL_OFFSETS_27, np.int32)
    else:
        per_dim = {1: (0,), 2: (0, 1)}.get(n, (-1, 0, 1))
        offs27 = np.asarray(
            [(i, j, k) for i in per_dim for j in per_dim for k in per_dim],
            np.int32,
        )
    n_off = offs27.shape[0]

    def with_overflow(acc):
        # int32 explicitly: under jax_enable_x64 nonzero returns int64,
        # which must match the without_overflow branch's dtype
        sidx = jnp.nonzero(b["rank"] >= K, size=S, fill_value=N)[0].astype(
            jnp.int32)
        ok = sidx < N
        safe = jnp.minimum(sidx, N - 1)
        sx, sy, sz = b["px"][safe], b["py"][safe], b["pz"][safe]
        scell = b["cell"][safe]
        sci = scell // (n * n)
        scj = (scell // n) % n
        sck = scell % n
        # neighbor cells of each straggler: (S, n_off)
        oi = jnp.asarray(offs27[:, 0])[None]
        oj = jnp.asarray(offs27[:, 1])[None]
        okk = jnp.asarray(offs27[:, 2])[None]
        nci, ncj, nck = sci[:, None] + oi, scj[:, None] + oj, sck[:, None] + okk
        ncell = ((nci % n) * n + (ncj % n)) * n + (nck % n)
        shx = (nci // n).astype(dtype) * boxsize
        shy = (ncj // n).astype(dtype) * boxsize
        shz = (nck // n).astype(dtype) * boxsize
        # candidates: (K, S, n_off)
        cx = hx[:, ncell] + shx[None]
        cy = hy[:, ncell] + shy[None]
        cz = hz[:, ncell] + shz[None]
        cv = valid[:, ncell]
        dx = sx[None, :, None] - cx
        dy = sy[None, :, None] - cy
        dz = sz[None, :, None] - cz
        if n < 3:  # see _sweep: reduced offsets need per-pair minimum image
            dx = dx - boxsize * jnp.round(dx / boxsize)
            dy = dy - boxsize * jnp.round(dy / boxsize)
            dz = dz - boxsize * jnp.round(dz / boxsize)
        r2 = dx * dx + dy * dy + dz * dz
        m = ok[None, :, None] & cv & (r2 < cutoff2) & (r2 > 0)
        f = jnp.where(m, shortrange_force_factor(r2, scale, soft2, dtype, kernel), 0.0)
        fx, fy, fz = f * dx, f * dy, f * dz
        s_acc = jnp.stack([fx.sum((0, 2)), fy.sum((0, 2)), fz.sum((0, 2))], 1)
        # reaction onto the bucketed side (scatter-add into slot layout)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (K, S, n_off), 0) * C + ncell[None]
        tgt = jnp.where(m, tgt, K * C).reshape(-1)
        accf = acc.reshape(3, K * C)
        accf = jnp.stack([
            accf[d].at[tgt].add((-jnp.stack([fx, fy, fz])[d]).reshape(-1),
                                mode="drop")
            for d in range(3)
        ])
        # straggler ↔ straggler all-pairs (minimum image; they are few)
        dxs = sx[:, None] - sx[None, :]
        dys = sy[:, None] - sy[None, :]
        dzs = sz[:, None] - sz[None, :]
        dxs = dxs - boxsize * jnp.round(dxs / boxsize)
        dys = dys - boxsize * jnp.round(dys / boxsize)
        dzs = dzs - boxsize * jnp.round(dzs / boxsize)
        r2s = dxs * dxs + dys * dys + dzs * dzs
        ms = ok[:, None] & ok[None, :] & (r2s < cutoff2) & (r2s > 0)
        fs = jnp.where(ms, shortrange_force_factor(r2s, scale, soft2, dtype, kernel), 0.0)
        s_acc = s_acc + jnp.stack(
            [(fs * dxs).sum(1), (fs * dys).sum(1), (fs * dzs).sum(1)], 1
        )
        return accf.reshape(3, K, C), s_acc, sidx

    def without_overflow(acc):
        return (acc, jnp.zeros((S, 3), dtype), jnp.full((S,), N, jnp.int32))

    acc, s_acc, s_sorted_idx = jax.lax.cond(
        n_overflow > 0, with_overflow, without_overflow, acc
    )

    # ---- gather per-particle updates back through the sort ------------- #
    # Build each particle's slot index in ORIGINAL order once (argsort +
    # one gather), then read the acc arrays with three 1D gathers — no
    # scatters, no per-component double permutation.  ((N,3)-shaped ops
    # hit the 42× lane-padded layout; scatters run ~gather speed at best.)
    slot = jnp.where(b["rank"] < K, b["rank"] * C + b["cell"], K * C)
    accf = jnp.concatenate(
        [acc.reshape(3, K * C), jnp.zeros((3, 1), dtype)], axis=1
    )
    coef = G * mass * mass * kick_integral
    inv_order = jax.lax.sort(
        [b["order"], jnp.arange(N, dtype=jnp.int32)], num_keys=1
    )[1]
    slot_orig = slot[inv_order]
    # stragglers: fix-ups indexed in original order (small, fixed size)
    s_orig_idx = jnp.where(
        s_sorted_idx < N,
        jnp.concatenate([b["order"], jnp.zeros((1,), jnp.int32)])[
            jnp.minimum(s_sorted_idx, N)
        ],
        N,
    )
    dms = []
    for d in range(3):
        dm_d = accf[d][slot_orig]
        dm_d = dm_d.at[s_orig_idx].set(s_acc[:, d], mode="drop")
        dms.append(coef * dm_d)
    if tuple_in:
        return (tuple(dms), n_overflow) if return_overflow else tuple(dms)
    dmom = jnp.stack(dms, axis=1)
    if return_overflow:
        return dmom, n_overflow
    return dmom
