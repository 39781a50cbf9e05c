"""Pallas TPU kernels for particle-mesh deposit and force gather.

XLA's gather/scatter on TPU processes ~1e8 random elements/s
(latency-bound) — measured to dominate the PM step (grid/bucketed.py
docstring).  These kernels reformulate both operations as *lane-parallel
dense* arithmetic:

  * particles are sorted by 2³-cell block (grid/bucketed machinery);
  * a kernel instance owns 128 blocks (the VPU lane dimension) and their
    (B+2)³ = 64-cell mini-grids laid out (64 sublanes × 128 lanes) in
    VMEM;
  * per bucket slot and interpolation corner, the per-lane cell selection
    is a one-hot compare over the 64 sublanes + masked add/reduce — every
    lane (block) advances in lockstep, no per-element addressing.

Data layout is SLOT-MAJOR: every per-slot array is (K, Cp) with
Cp = block count padded to a multiple of 128.  The minor dimension is the
(huge) block axis, so the TPU (8, 128) tiling never pads — a (C, K)
layout with K < 128 lanes would be padded 8-16× in HBM (fatal at 512³),
and a trailing length-3 component axis 40×.  Kernel blocks are direct
(K, 128) column slices: no relayout/transpose on the hot path.

Deposit: mini-grids accumulate masked corner weights; the host-side
overlap-add into the global grid is dense XLA (bucketed._assemble_global_T).
Gather: mini-grids are pre-sliced densely (bucketed._extract_local_T);
the kernel reads them with one-hot reductions, one field component per
call (keeps peak HBM to one (L, Cp) mini at a time — essential at 512³).

Bucket layout comes from bucketize_blocks (C blocks × K capacity);
overflow particles use the plain path (exactness preserved).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

from concept_tpu.grid.bucketed import (
    B, LDIM, L, _block_count, _assemble_global_T, _extract_local_T,
)

LANES = 128  # blocks per kernel instance


def _corner_w(f, c):
    return jnp.where(c == 0, 1.0 - f, f)


def _deposit_kernel(lidx_ref, fx_ref, fy_ref, fz_ref, q_ref, out_ref):
    """One batch of 128 blocks: inputs (K, LANES) slot-major (q pre-masked
    by validity); out mini-grid (L, LANES)."""
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    lidx = lidx_ref[...]
    fx, fy, fz = fx_ref[...], fy_ref[...], fz_ref[...]
    qv = q_ref[...]
    acc = jnp.zeros((L, LANES), qv.dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                shift = (cx * LDIM + cy) * LDIM + cz
                w = (
                    _corner_w(fx, cx) * _corner_w(fy, cy) * _corner_w(fz, cz)
                ) * qv  # (K, LANES)
                tgt = lidx + shift
                acc = acc + jnp.sum(
                    jnp.where(
                        tgt[:, None, :] == iota_l[None, :, :],
                        w[:, None, :],
                        0.0,
                    ),
                    axis=0,
                )
    out_ref[...] = acc


def _gather_kernel(lidx_ref, fx_ref, fy_ref, fz_ref, w_ref, *refs):
    """One batch: lidx/f*/w (K, LANES); then D mini refs (L, LANES)
    followed by D out refs (K, LANES).  w is the validity weight (0 masks
    a slot).  The D field components share the (expensive) per-corner
    one-hot masks — gathering 3 gradients in one call costs barely more
    than one."""
    D = len(refs) // 2
    mini_refs, out_refs = refs[:D], refs[D:]
    K = lidx_ref.shape[0]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    minis = [r[...] for r in mini_refs]  # each (L, LANES)

    # fori_loop over slots: Mosaic fully unrolls Python loops, so the
    # per-iteration (L, LANES) temporaries must live in a compiled loop
    # body (bounded VMEM stack).  Slot rows are read/written through the
    # refs with pl.ds (ref-level dynamic slicing is Mosaic-supported).
    def body(k, _):
        lidx_k = lidx_ref[pl.ds(k, 1), :]  # (1, LANES)
        fx_k = fx_ref[pl.ds(k, 1), :]
        fy_k = fy_ref[pl.ds(k, 1), :]
        fz_k = fz_ref[pl.ds(k, 1), :]
        w_k = w_ref[pl.ds(k, 1), :]
        vals = [jnp.zeros((1, LANES), minis[0].dtype) for _ in range(D)]
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    shift = (cx * LDIM + cy) * LDIM + cz
                    w = (
                        _corner_w(fx_k, cx)
                        * _corner_w(fy_k, cy)
                        * _corner_w(fz_k, cz)
                    ) * w_k  # (1, LANES)
                    mask = (lidx_k + shift) == iota_l  # (L, LANES) broadcast
                    for d in range(D):
                        picked = jnp.sum(
                            jnp.where(mask, minis[d], 0.0),
                            axis=0, keepdims=True,
                        )  # (1, LANES)
                        vals[d] = vals[d] + w * picked
        for d in range(D):
            out_refs[d][pl.ds(k, 1), :] = vals[d]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@partial(jax.jit, static_argnames=("gridsize", "interpret"))
def deposit_pallas_kc(lidx, fx, fy, fz, q, gridsize: int,
                      interpret: bool = False):
    """Slot-major deposit: args (K, Cp), Cp a multiple of 128 (padding
    blocks must have q = 0); q pre-masked by validity.  → (n,n,n)."""
    n = gridsize
    nb = _block_count(n)
    K, Cp = q.shape
    assert Cp % LANES == 0 and Cp >= nb**3
    nbatch = Cp // LANES
    kb = pl.BlockSpec((K, LANES), lambda i: (0, i))
    lb = pl.BlockSpec((L, LANES), lambda i: (0, i))
    out = pl.pallas_call(
        _deposit_kernel,
        out_shape=jax.ShapeDtypeStruct((L, Cp), q.dtype),
        grid=(nbatch,),
        in_specs=[kb] * 5,
        out_specs=lb,
        interpret=interpret,
    )(lidx.astype(jnp.int32), fx, fy, fz, q)
    return _assemble_global_T(out, nb, n)


@partial(jax.jit, static_argnames=("gridsize", "interpret"))
def gather_pallas_kc(lidx, fx, fy, fz, w, grids, gridsize: int,
                     interpret: bool = False):
    """Slot-major gather: per-slot args (K, Cp); ``grids`` a tuple of D
    (n,n,n) field components sharing one kernel pass (the per-corner
    one-hot masks dominate, so D components cost barely more than one —
    but D (L, Cp) mini-grids are alive at once: at 512³ call per
    component instead).  Returns a D-tuple of (K, Cp) values (zero where
    w = 0); a bare (n,n,n) array returns a bare (K, Cp) array."""
    bare = not isinstance(grids, (tuple, list))
    if bare:
        grids = (grids,)
    D = len(grids)
    n = gridsize
    nb = _block_count(n)
    K, Cp = w.shape
    assert Cp % LANES == 0 and Cp >= nb**3
    nbatch = Cp // LANES
    minis = [_extract_local_T(g, nb, n, pad_to=Cp) for g in grids]  # (L, Cp)
    kb = pl.BlockSpec((K, LANES), lambda i: (0, i))
    lb = pl.BlockSpec((L, LANES), lambda i: (0, i))
    outs = pl.pallas_call(
        _gather_kernel,
        out_shape=[jax.ShapeDtypeStruct((K, Cp), grids[0].dtype)] * D,
        grid=(nbatch,),
        in_specs=[kb] * 5 + [lb] * D,
        out_specs=[kb] * D,
        interpret=interpret,
    )(lidx.astype(jnp.int32), fx, fy, fz, w, *minis)
    return outs[0] if bare else tuple(outs)


def _slot_geometry(px, py, pz, c, nb: int, inv_h: float):
    """Per-slot CIC geometry from raw positions (shared by the pos-based
    kernels; runs INSIDE the kernel so the lidx/f*/q slot arrays are
    never materialized in HBM — 5×1.07 GB saved at 512³).

    c: flat block id (z-major: c = (bz·nb + by)·nb + bx).  Returns
    (lidx, fx, fy, fz, in_halo) with lidx clipped into the mini-grid."""
    # weak-typed % (lax.rem(c, python_int) breaks under jax_enable_x64:
    # the literal promotes to int64 against int32 c)
    bx = c % nb
    by = (c // nb) % nb
    bz = c // (nb * nb)
    lrels, fs = [], []
    for p, b in ((px, bx), (py, by), (pz, bz)):
        u = p * inv_h - 0.5
        a = jnp.floor(u)
        fs.append(u - a)
        lrels.append(a.astype(jnp.int32) - b * B + 1)
    in_halo = (
        (lrels[0] >= 0) & (lrels[0] <= LDIM - 2)
        & (lrels[1] >= 0) & (lrels[1] <= LDIM - 2)
        & (lrels[2] >= 0) & (lrels[2] <= LDIM - 2)
    )
    clip = lambda x: jnp.clip(x, 0, LDIM - 2)
    lidx = (clip(lrels[0]) * LDIM + clip(lrels[1])) * LDIM + clip(lrels[2])
    return lidx, fs[0], fs[1], fs[2], in_halo


def _deposit_kernel_pos(col0_ref, px_ref, py_ref, pz_ref, w_ref, out_ref, *,
                        nb: int, inv_h: float):
    """Position-based deposit: inputs (K, LANES) positions + weight w
    (mass·validity, pre-masked); out mini-grid (L, LANES).  The call may
    cover a COLUMN CHUNK: col0_ref ((1,1) i32) holds the first block
    column of the chunk."""
    K = px_ref.shape[0]
    pid = pl.program_id(0)
    base = pid * LANES + col0_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 1)
    c = base + lane
    lidx, fx, fy, fz, in_halo = _slot_geometry(
        px_ref[...], py_ref[...], pz_ref[...], c, nb, inv_h
    )
    qv = w_ref[...] * in_halo.astype(w_ref.dtype)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    acc = jnp.zeros((L, LANES), qv.dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                shift = (cx * LDIM + cy) * LDIM + cz
                w = (
                    _corner_w(fx, cx) * _corner_w(fy, cy) * _corner_w(fz, cz)
                ) * qv
                acc = acc + jnp.sum(
                    jnp.where(
                        (lidx + shift)[:, None, :] == iota_l[None, :, :],
                        w[:, None, :],
                        0.0,
                    ),
                    axis=0,
                )
    out_ref[...] = acc


def _gather_kernel_pos(col0_ref, px_ref, py_ref, pz_ref, w_ref, *refs,
                       nb: int, inv_h: float):
    """Position-based gather: per-slot positions + validity weight w;
    then D mini refs (L, LANES) and D out refs (K, LANES)."""
    D = len(refs) // 2
    mini_refs, out_refs = refs[:D], refs[D:]
    K = px_ref.shape[0]
    pid = pl.program_id(0)
    base = pid * LANES + col0_ref[0, 0]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    c1 = base + lane1  # (1, LANES), same for every slot row
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    minis = [r[...] for r in mini_refs]

    def body(k, _):
        lidx_k, fx_k, fy_k, fz_k, halo_k = _slot_geometry(
            px_ref[pl.ds(k, 1), :], py_ref[pl.ds(k, 1), :],
            pz_ref[pl.ds(k, 1), :], c1, nb, inv_h,
        )
        w_k = w_ref[pl.ds(k, 1), :] * halo_k.astype(minis[0].dtype)
        vals = [jnp.zeros((1, LANES), minis[0].dtype) for _ in range(D)]
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    shift = (cx * LDIM + cy) * LDIM + cz
                    w = (
                        _corner_w(fx_k, cx)
                        * _corner_w(fy_k, cy)
                        * _corner_w(fz_k, cz)
                    ) * w_k
                    mask = (lidx_k + shift) == iota_l
                    for d in range(D):
                        picked = jnp.sum(
                            jnp.where(mask, minis[d], 0.0),
                            axis=0, keepdims=True,
                        )
                        vals[d] = vals[d] + w * picked
        for d in range(D):
            out_refs[d][pl.ds(k, 1), :] = vals[d]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@partial(jax.jit,
         static_argnames=("gridsize", "boxsize", "nchunks", "interpret"))
def deposit_pallas_pos(px, py, pz, w, gridsize: int, boxsize: float,
                       nchunks: int = 1, interpret: bool = False):
    """Position-based slot-major deposit: px/py/pz/w (K, Cp) with w the
    per-slot deposit weight (mass·validity; zero for empty/pad slots) and
    Z-MAJOR block ids (c = (bz·nb + by)·nb + bx).  CIC geometry is
    computed inside the kernel (no lidx/f*/q slot arrays in HBM), and
    ``nchunks`` bounds the transient (L, ·) mini-grid at 1/nchunks of
    (L, Cp) — the key to fitting 512³ in 16 GB.  Returns (n,n,n)."""
    from concept_tpu.grid.bucketed import (
        _band_selection, _halo_selection, _assemble_zband,
    )

    n = gridsize
    nb = _block_count(n)
    C = nb**3
    K, Cp = w.shape
    assert Cp % LANES == 0 and Cp >= C
    assert nchunks == 1 or (Cp == C and nb % nchunks == 0)
    nbz = nb // nchunks
    cols = Cp // nchunks
    inv_h = float(n / boxsize)
    S = jnp.asarray(_halo_selection(nb, n), w.dtype)
    Sband = jnp.asarray(_band_selection(nbz), w.dtype)
    kern = partial(_deposit_kernel_pos, nb=nb, inv_h=inv_h)
    sb = pl.BlockSpec((1, 1), lambda i: (0, 0))
    kb = pl.BlockSpec((K, LANES), lambda i: (0, i))
    lb = pl.BlockSpec((L, LANES), lambda i: (0, i))
    grid_out = jnp.zeros((n, n, n), w.dtype)
    for q in range(nchunks):
        sl = slice(q * cols, (q + 1) * cols)
        col0 = jnp.full((1, 1), q * cols, jnp.int32)
        mini = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((L, cols), w.dtype),
            grid=(cols // LANES,),
            in_specs=[sb] + [kb] * 4,
            out_specs=lb,
            interpret=interpret,
        )(col0, px[:, sl], py[:, sl], pz[:, sl], w[:, sl])
        grid_out = _assemble_zband(
            grid_out, mini[:, : min(cols, C)], S, Sband, nb, n,
            q * nbz, nbz,
        )
    return grid_out


@partial(jax.jit,
         static_argnames=("gridsize", "boxsize", "nchunks", "interpret"))
def gather_pallas_pos(px, py, pz, w, grids, gridsize: int, boxsize: float,
                      nchunks: int = 1, interpret: bool = False):
    """Position-based slot-major gather of D field components sharing one
    kernel pass per chunk (layout/ids as deposit_pallas_pos; w is the
    validity weight).  grids: tuple of D (n,n,n) arrays.  Returns a
    D-tuple of (K, Cp) values (zero where w = 0 or out of halo)."""
    from concept_tpu.grid.bucketed import (
        _band_selection, _halo_selection, _extract_zband,
    )

    bare = not isinstance(grids, (tuple, list))
    if bare:
        grids = (grids,)
    D = len(grids)
    n = gridsize
    nb = _block_count(n)
    C = nb**3
    K, Cp = w.shape
    assert Cp % LANES == 0 and Cp >= C
    assert nchunks == 1 or (Cp == C and nb % nchunks == 0)
    nbz = nb // nchunks
    cols = Cp // nchunks
    inv_h = float(n / boxsize)
    dt = grids[0].dtype
    S = jnp.asarray(_halo_selection(nb, n), dt)
    Sband = jnp.asarray(_band_selection(nbz), dt)
    kern = partial(_gather_kernel_pos, nb=nb, inv_h=inv_h)
    sb = pl.BlockSpec((1, 1), lambda i: (0, 0))
    kb = pl.BlockSpec((K, LANES), lambda i: (0, i))
    lb = pl.BlockSpec((L, LANES), lambda i: (0, i))
    chunks = []
    for q in range(nchunks):
        sl = slice(q * cols, (q + 1) * cols)
        col0 = jnp.full((1, 1), q * cols, jnp.int32)
        minis = []
        for g in grids:
            m = _extract_zband(g, S, Sband, nb, n, q * nbz, nbz)
            if cols > C:  # Cp-padding (single-chunk small grids only)
                m = jnp.pad(m, ((0, 0), (0, cols - C)))
            minis.append(m)
        outs = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((K, cols), dt)] * D,
            grid=(cols // LANES,),
            in_specs=[sb] + [kb] * 4 + [lb] * D,
            out_specs=[kb] * D,
            interpret=interpret,
        )(col0, px[:, sl], py[:, sl], pz[:, sl], w[:, sl], *minis)
        chunks.append(outs)
    if nchunks == 1:
        full = chunks[0]
    else:
        full = tuple(
            jnp.concatenate([ch[d] for ch in chunks], axis=1)
            for d in range(D)
        )
    return full[0] if bare else tuple(full)


def _pad_c(x, Cp: int):
    C = x.shape[0]
    return jnp.pad(x, ((0, Cp - C), (0, 0))) if Cp > C else x


@partial(jax.jit, static_argnames=("gridsize", "interpret"))
def deposit_pallas(bk, gridsize: int, interpret: bool = False):
    """Deposit via the Pallas kernel → (n,n,n) grid (bucketed particles
    only; caller adds the overflow fallback).  (C, K)-dict interface from
    bucketize_blocks; transposes to the slot-major kernel layout (off the
    persistent-bucket hot path — bucketsim.py stores slot-major)."""
    C, K = bk["q"].shape
    Cp = ((C + LANES - 1) // LANES) * LANES
    lidx = (bk["lx"] * LDIM + bk["ly"]) * LDIM + bk["lz"]
    q = bk["q"] * bk["valid"].astype(bk["q"].dtype)
    args = [_pad_c(x, Cp).T for x in (lidx, bk["fx"], bk["fy"], bk["fz"], q)]
    return deposit_pallas_kc(*args, gridsize, interpret=interpret)


@partial(jax.jit, static_argnames=("gridsize", "interpret", "stacked"))
def gather_pallas(bk, grids, gridsize: int, interpret: bool = False,
                  stacked: bool = True):
    """Force gather via the Pallas kernel.  grids: (D,n,n,n).
    Returns (C, K, D) bucket-slot values, or a D-tuple of (C, K) arrays
    when ``stacked=False``."""
    C, K = bk["q"].shape
    Cp = ((C + LANES - 1) // LANES) * LANES
    lidx = (bk["lx"] * LDIM + bk["ly"]) * LDIM + bk["lz"]
    w = bk["valid"].astype(bk["fx"].dtype)
    args = [_pad_c(x, Cp).T for x in (lidx, bk["fx"], bk["fy"], bk["fz"], w)]
    outs_kc = gather_pallas_kc(
        *args, tuple(grids[d] for d in range(grids.shape[0])), gridsize,
        interpret=interpret,
    )
    outs = [o.T[:C] for o in outs_kc]
    if not stacked:
        return tuple(outs)
    return jnp.stack(outs, axis=-1)
