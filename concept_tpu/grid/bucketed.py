"""Dense-bucket particle↔mesh interpolation (no gather/scatter).

XLA's TPU gather/scatter process ~1e8 elements/s (latency-bound random
HBM access) — measured to dominate the PM step.  This module reformulates
deposit and force-gather as *dense* arithmetic:

  1. particles are bucketed by grid *block* (B³ cells, fixed capacity K,
     one multi-operand sort — sorts run at memory speed on TPU);
  2. each particle's interpolation corners live in a (B+2)³-cell local
     neighbourhood of its block → per-block mini-grids of L=(B+2)³ cells;
  3. deposit: per-corner weights (C,K) contracted against a one-hot local
     index cube (C,K,L) → (C,L) mini-grids — an MXU/VPU contraction, no
     scatter; mini-grids overlap-add into the global grid with reshapes
     and rolls (dense);
  4. gather: mini-grids sliced densely out of the global grid, then
     (C,K,L)·(C,L,⋯) one-hot contraction reads per-particle values — no
     gather; the 3 force components share one contraction.

Block capacity overflow (dense buckets are fixed-shape) is handled
exactly: overflowing particles fall back to the plain scatter/gather path
(they are few — overdense blocks at late times).

This is the TPU-native analogue of the reference's tile-sorted cache
locality design (species.py:2657 tile_sort, main.py:280-310), taken to
its dense-compute conclusion.  Currently CIC (order 2); other orders fall
back to grid/interp.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B = 2  # cells per block per dim
LDIM = B + 2  # local mini-grid extent (CIC corners reach block±1)
L = LDIM**3


def _block_count(n: int) -> int:
    assert n % B == 0, f"gridsize {n} must be divisible by block size {B}"
    return n // B


@partial(jax.jit, static_argnames=("gridsize", "capacity", "uniform_q"))
def bucketize_blocks(pos, q, gridsize: int, boxsize: float, capacity: int,
                     uniform_q: bool = False):
    """Sort particles into (C, K) block buckets (C = (n/B)³ blocks).

    Returns dict with sorted per-slot arrays reshaped to (C, K):
    anchor-local indices (lx, ly, lz ∈ [0, LDIM)), CIC fractions (fx..),
    quantity q, validity mask, plus the sorted order (for unsorting
    gathered results) and the overflow mask in sorted order.
    """
    n = gridsize
    nb = _block_count(n)
    h = boxsize / n
    N = pos.shape[0]
    dtype = pos.dtype
    u = pos / h - 0.5
    anchor = jnp.floor(u).astype(jnp.int32)  # CIC
    f = (u - anchor).astype(dtype)
    # block of the particle's CELL (not anchor): cell = floor(pos/h)
    cell = jnp.clip((pos / h).astype(jnp.int32), 0, n - 1)
    block = cell // B  # (N,3) in [0, nb)
    bkey = (block[:, 0] * nb + block[:, 1]) * nb + block[:, 2]
    # local anchor index within the (B+2)³ neighbourhood: origin−1 → 0
    lx = anchor[:, 0] - block[:, 0] * B + 1
    ly = anchor[:, 1] - block[:, 1] * B + 1
    lz = anchor[:, 2] - block[:, 2] * B + 1
    lidx = ((lx * LDIM + ly) * LDIM + lz).astype(jnp.int32)
    iota = jnp.arange(N, dtype=jnp.int32)
    if uniform_q:
        (key_s, order, lidx_s, fx_s, fy_s, fz_s) = jax.lax.sort(
            [bkey, iota, lidx, f[:, 0], f[:, 1], f[:, 2]], num_keys=1
        )
        q_s = None
    else:
        (key_s, order, lidx_s, fx_s, fy_s, fz_s, q_s) = jax.lax.sort(
            [bkey, iota, lidx, f[:, 0], f[:, 1], f[:, 2],
             jnp.broadcast_to(q, (N,)).astype(dtype)],
            num_keys=1,
        )
    C = nb**3
    # starts via sorted segment-sum + cumsum (searchsorted costs ~75x
    # more at large C: per-query binary-search gathers)
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), key_s, num_segments=C,
        indices_are_sorted=True,
    )
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[key_s]
    in_bucket = rank < capacity
    slot = jnp.where(in_bucket, key_s * capacity + rank, C * capacity)

    def scat(vals, fill):
        out = jnp.full((C * capacity + 1,), fill, vals.dtype)
        return out.at[slot].set(vals, unique_indices=True)[:-1].reshape(C, capacity)

    # validity is dense: slot k of block c is occupied iff k < counts[c]
    valid = (
        jnp.arange(capacity, dtype=counts.dtype)[None, :] < counts[:, None]
    )
    lidx_b = scat(lidx_s, 0)
    out = {
        "lx": lidx_b // (LDIM * LDIM),
        "ly": (lidx_b // LDIM) % LDIM,
        "lz": lidx_b % LDIM,
        "fx": scat(fx_s, 0.0), "fy": scat(fy_s, 0.0), "fz": scat(fz_s, 0.0),
        "q": (jnp.broadcast_to(q, valid.shape).astype(dtype) * valid
              if uniform_q else scat(q_s, 0.0)),
        "valid": valid,
        "order": order,          # sorted→original particle index
        "slot": slot,            # per sorted particle
        "overflow": ~in_bucket,  # in sorted order
        "key_sorted": key_s,
    }
    return out


def _local_onehot(bk, dtype):
    """One-hot cube (C, K, L) over the flattened local index; weights for
    the 8 CIC corners are folded in by shifting the local index."""
    lidx = (bk["lx"] * LDIM + bk["ly"]) * LDIM + bk["lz"]  # (C, K)
    return lidx


def _corner_shift(cx, cy, cz):
    return (cx * LDIM + cy) * LDIM + cz


def _corner_weight(bk, cx, cy, cz):
    wx = jnp.where(cx == 0, 1 - bk["fx"], bk["fx"])
    wy = jnp.where(cy == 0, 1 - bk["fy"], bk["fy"])
    wz = jnp.where(cz == 0, 1 - bk["fz"], bk["fz"])
    return wx * wy * wz


def _fold_blocks_axis(x, axis_block: int, axis_local: int):
    """(…, nb, …, LDIM, …) → (…, n, …): core cells reshape in place; the
    two halo cells roll-add into the periodic neighbours."""
    core = jax.lax.slice_in_dim(x, 1, 1 + B, axis=axis_local)
    lo = jax.lax.index_in_dim(x, 0, axis=axis_local, keepdims=True)
    hi = jax.lax.index_in_dim(x, LDIM - 1, axis=axis_local, keepdims=True)
    # core[bi, B-1] += lo[bi+1] ; core[bi, 0] += hi[bi-1]
    lo_r = jnp.roll(lo, -1, axis=axis_block)
    hi_r = jnp.roll(hi, 1, axis=axis_block)
    idx_last = [slice(None)] * core.ndim
    idx_last[axis_local] = slice(B - 1, B)
    core = core.at[tuple(idx_last)].add(lo_r)
    idx_first = [slice(None)] * core.ndim
    idx_first[axis_local] = slice(0, 1)
    core = core.at[tuple(idx_first)].add(hi_r)
    return core


def _assemble_global(local, nb: int, n: int):
    """(C, L) per-block mini-grids → (n,n,n) global with periodic
    overlap-add (dense reshapes + rolls, no scatter)."""
    x = local.reshape(nb, nb, nb, LDIM, LDIM, LDIM)
    x = _fold_blocks_axis(x, 0, 3)  # (nb,nb,nb,B,LDIM,LDIM)
    x = _fold_blocks_axis(x, 1, 4)
    x = _fold_blocks_axis(x, 2, 5)
    # interleave block and in-block axes → (n,n,n)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(n, n, n)


def _extract_local(grid, nb: int, n: int):
    """(n,n,n) → (C, L): per-block mini-grids incl. the ±1 halo (dense
    rolls + reshapes; inverse of _assemble_global's core mapping)."""
    g = grid.reshape(nb, B, nb, B, nb, B)
    g = jnp.transpose(g, (0, 2, 4, 1, 3, 5))  # (nb,nb,nb,B,B,B)

    def expand_axis(x, axis_block, axis_local):
        # prepend the last cell of the previous block, append the first of
        # the next (periodic)
        lo = jax.lax.index_in_dim(x, B - 1, axis=axis_local, keepdims=True)
        lo = jnp.roll(lo, 1, axis=axis_block)
        hi = jax.lax.index_in_dim(x, 0, axis=axis_local, keepdims=True)
        hi = jnp.roll(hi, -1, axis=axis_block)
        return jnp.concatenate([lo, x, hi], axis=axis_local)

    g = expand_axis(g, 0, 3)
    g = expand_axis(g, 1, 4)
    g = expand_axis(g, 2, 5)
    return g.reshape(nb**3, L)


def _halo_selection(nb: int, n: int):
    """One-hot banded selection S (LDIM, nb, n) with
    S[l, b, i] = 1 iff i == (B·b − 1 + l) mod n — local mini-grid cell l
    of block b covers global cell B·b − 1 + l (±1-cell periodic halo).

    Used as a matmul operand: on TPU, de-interleaving blocks from the
    grid with strided slices or transposes is pathologically slow
    (strided lane access) or tile-padded 64× (size-2 minor dims), while
    the MXU chews through the equivalent dense contraction in ~ms.
    Extract and assemble use the SAME S (assemble is the exact adjoint),
    so deposit/gather adjointness is preserved by construction."""
    l = np.arange(LDIM)[:, None, None]
    b = np.arange(nb)[None, :, None]
    i = np.arange(n)[None, None, :]
    return np.asarray((B * b - 1 + l) % n == i)


def _band_selection(nbz: int):
    """Band-coordinate selection Sband (LDIM, nbz, B·nbz+2) with
    Sband[z, c, t] = 1 iff t == B·c + z.  For a z-major block chunk
    bz ∈ [bz0, bz0+nbz), local cell z of chunk-block c covers global cell
    k = (B·(bz0+c) − 1 + z) mod n = (k0 + t) mod n with k0 = B·bz0 − 1 and
    t = B·c + z — the same banded matrix for EVERY chunk."""
    z = np.arange(LDIM)[:, None, None]
    c = np.arange(nbz)[None, :, None]
    t = np.arange(B * nbz + 2)[None, None, :]
    return np.asarray(t == B * c + z)


def _band_runs(n: int, k0: int, bandlen: int):
    """Band coords t → global k = (k0 + t) mod n as contiguous
    (t, k, length) runs (static python ints)."""
    runs = []
    t = 0
    while t < bandlen:
        k = (k0 + t) % n
        ln = min(bandlen - t, n - k)
        runs.append((t, k, ln))
        t += ln
    return runs


def _extract_zband(grid, S, Sband, nb: int, n: int, bz0: int, nbz: int):
    """(n,n,n) → (L, nbz·nb²) LOCAL-MAJOR mini-grids for the z-major block
    chunk bz ∈ [bz0, bz0+nbz) — einsums touch only the grid's z band
    (2·nbz+2 cells), bounding chunk memory at ~1/nchunks."""
    bandlen = B * nbz + 2
    runs = _band_runs(n, B * bz0 - 1, bandlen)
    parts = [
        jax.lax.slice_in_dim(grid, k, k + ln, axis=2) for (_, k, ln) in runs
    ]
    gband = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
    t1 = jnp.einsum("zct,ijt->zcij", Sband, gband)
    t2 = jnp.einsum("ybj,zcij->ybzci", S, t1)
    t3 = jnp.einsum("xai,ybzci->xyzcba", S, t2)
    return t3.reshape(L, nbz * nb * nb)


def _assemble_zband(grid, local, S, Sband, nb: int, n: int, bz0: int,
                    nbz: int):
    """Adjoint of _extract_zband: overlap-add (L, nbz·nb²) chunk
    mini-grids into the global grid's z band."""
    bandlen = B * nbz + 2
    x = local.reshape(LDIM, LDIM, LDIM, nbz, nb, nb)
    u = jnp.einsum("zct,xyzcba->txyba", Sband, x)
    u = jnp.einsum("ybj,txyba->jtxa", S, u)
    u = jnp.einsum("xai,jtxa->ijt", S, u)  # (n, n, bandlen)
    for (t, k, ln) in _band_runs(n, B * bz0 - 1, bandlen):
        grid = grid.at[:, :, k : k + ln].add(
            jax.lax.slice_in_dim(u, t, t + ln, axis=2)
        )
    return grid


def _assemble_global_T(local, nb: int, n: int):
    """(L, C[p]) LOCAL-MAJOR mini-grids → (n,n,n) global with periodic
    overlap-add: grid[ijk] = Σ S[x,a,i]·S[y,b,j]·S[z,c,k]·local[xyz,abc]
    — three MXU contractions, no small-minor-dim intermediates, no
    scatter (see _halo_selection)."""
    S = jnp.asarray(_halo_selection(nb, n), local.dtype)
    x = local[:, : nb**3].reshape(LDIM, LDIM, LDIM, nb, nb, nb)
    # stage order chosen so each dot_general's natural output axis order
    # needs no transpose and keeps large minor dims
    v = jnp.einsum("zck,xyzabc->kxyab", S, x)
    v = jnp.einsum("ybj,kxyab->jkxa", S, v)
    return jnp.einsum("xai,jkxa->ijk", S, v)


def _extract_local_T(grid, nb: int, n: int, pad_to: int | None = None):
    """(n,n,n) → (L, C[p]) LOCAL-MAJOR per-block mini-grids incl. the ±1
    halo: local[xyz,abc] = S[x,a,i]·S[y,b,j]·S[z,c,k]·grid[ijk] — the
    adjoint of _assemble_global_T (see _halo_selection)."""
    S = jnp.asarray(_halo_selection(nb, n), grid.dtype)
    t = jnp.einsum("zck,ijk->zcij", S, grid)
    t = jnp.einsum("ybj,zcij->ybzci", S, t)
    t = jnp.einsum("xai,ybzci->xyzabc", S, t)
    out = t.reshape(L, nb**3)
    if pad_to is not None and pad_to > nb**3:
        out = jnp.pad(out, ((0, 0), (0, pad_to - nb**3)))
    return out


def deposit_bucketed(bk, gridsize: int, pos=None, boxsize: float = 1.0,
                     q=None):
    """Dense deposit from block buckets; overflow handled by the exact
    scatter path.  Returns (n,n,n)."""
    n = gridsize
    nb = _block_count(n)
    lidx = _local_onehot(bk, None)  # (C,K)
    iota = jnp.arange(L, dtype=jnp.int32)
    local = jnp.zeros((nb**3, L), bk["q"].dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = _corner_weight(bk, cx, cy, cz) * bk["q"]
                w = jnp.where(bk["valid"], w, 0.0)
                tgt = lidx + _corner_shift(cx, cy, cz)  # (C,K)
                onehot = (tgt[:, :, None] == iota).astype(w.dtype)
                local = local + jnp.einsum(
                    "ck,ckl->cl", w, onehot, precision=jax.lax.Precision.DEFAULT
                )
    grid = _assemble_global(local, nb, n)
    # exact overflow fallback
    if pos is not None:
        from concept_tpu.grid.interp import deposit as plain_deposit

        n_over = bk["overflow"]
        if True:  # traced condition-free: weight overflow particles only
            q_full = jnp.broadcast_to(q, (pos.shape[0],)).astype(grid.dtype)
            # overflow mask in original order
            over_orig = jnp.zeros((pos.shape[0],), bool).at[bk["order"]].set(
                bk["overflow"]
            )
            grid = grid + plain_deposit(
                pos, jnp.where(over_orig, q_full, 0.0), n, boxsize, order=2
            )
    return grid


def gather_bucketed(bk, grids, gridsize: int, pos=None, boxsize: float = 1.0):
    """Dense force gather from block buckets.

    grids: (D, n, n, n) stacked fields (the D components share one
    contraction).  Returns (N, D) in ORIGINAL particle order.
    """
    n = gridsize
    nb = _block_count(n)
    D = grids.shape[0]
    local = jnp.stack(
        [_extract_local(grids[d], nb, n) for d in range(D)], axis=-1
    )  # (C, L, D)
    lidx = _local_onehot(bk, None)
    iota = jnp.arange(L, dtype=jnp.int32)
    vals = jnp.zeros((*bk["q"].shape, D), grids.dtype)  # (C, K, D)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = _corner_weight(bk, cx, cy, cz)
                tgt = lidx + _corner_shift(cx, cy, cz)
                onehot = (tgt[:, :, None] == iota).astype(w.dtype)  # (C,K,L)
                picked = jnp.einsum("ckl,cld->ckd", onehot, local)
                vals = vals + w[:, :, None] * picked
    # route back to original particle order via the slot mapping
    N = bk["order"].shape[0]
    flat = vals.reshape(-1, D)
    sorted_vals = jnp.concatenate([flat, jnp.zeros((1, D), flat.dtype)])[
        jnp.minimum(bk["slot"], flat.shape[0])
    ]
    out = jnp.zeros((N, D), flat.dtype).at[bk["order"]].set(sorted_vals)
    if pos is not None:
        from concept_tpu.grid.interp import gather as plain_gather

        over_orig = jnp.zeros((N,), bool).at[bk["order"]].set(bk["overflow"])
        plain = jnp.stack(
            [plain_gather(grids[d], pos, boxsize, order=2) for d in range(D)],
            axis=1,
        )
        out = jnp.where(over_orig[:, None], plain, out)
    return out
