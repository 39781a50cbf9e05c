"""Pallas TPU kernels for particle-mesh deposit and force gather.

XLA's gather/scatter on TPU processes ~1e8 random elements/s
(latency-bound) — measured to dominate the PM step (grid/bucketed.py
docstring).  These kernels reformulate both operations as *lane-parallel
dense* arithmetic:

  * particles are sorted by 2³-cell block (grid/bucketed machinery);
  * a kernel instance owns a batch of 128 blocks (the VPU lane dimension)
    and their (B+2)³ = 64-cell mini-grids laid out (64 sublanes × 128
    lanes) in VMEM;
  * per bucket slot and interpolation corner, the per-lane cell selection
    is a one-hot compare over the 64 sublanes + masked add/reduce — every
    lane (block) advances in lockstep, no per-element addressing.

Deposit: mini-grids accumulate masked corner weights; the host-side
overlap-add into the global grid is dense XLA (bucketed._assemble_global).
Gather: mini-grids are pre-sliced densely (bucketed._extract_local); the
kernel reads them with one-hot reductions; D force components share the
pass.

Bucket layout comes from bucketize_blocks (C blocks × K capacity);
overflow particles use the plain path (exactness preserved).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from concept_tpu.grid.bucketed import B, LDIM, L, _block_count

LANES = 128  # blocks per kernel instance


def _corner_w(f, c):
    return jnp.where(c == 0, 1.0 - f, f)


def _gather_kernel(lidx_ref, fx_ref, fy_ref, fz_ref, valid_ref, *refs):
    """One batch: lidx/f*/valid (1, K, LANES); then D mini refs
    (1, L, LANES) followed by D out refs (1, K, LANES).

    The D field components are separate operands: a trailing size-3 axis
    would be padded to a full 128-lane tile by the TPU layout, blowing the
    VMEM budget."""
    D = len(refs) // 2
    mini_refs = refs[:D]
    out_refs = refs[D:]
    K = lidx_ref.shape[1]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    minis = [r[0] for r in mini_refs]  # each (L, LANES)

    # fori_loop over slots: Mosaic fully unrolls Python loops, so the
    # per-iteration (L, LANES) temporaries must live in a compiled loop
    # body (bounded VMEM stack).  Slot rows are read/written through the
    # refs with pl.ds (ref-level dynamic slicing is Mosaic-supported).
    def body(k, _):
        lidx_k = lidx_ref[0, pl.ds(k, 1), :]  # (1, LANES)
        fx_k = fx_ref[0, pl.ds(k, 1), :]
        fy_k = fy_ref[0, pl.ds(k, 1), :]
        fz_k = fz_ref[0, pl.ds(k, 1), :]
        v_k = valid_ref[0, pl.ds(k, 1), :]
        vals = [jnp.zeros((1, LANES), minis[0].dtype) for _ in range(D)]
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    shift = (cx * LDIM + cy) * LDIM + cz
                    w = (
                        _corner_w(fx_k, cx)
                        * _corner_w(fy_k, cy)
                        * _corner_w(fz_k, cz)
                    ) * v_k  # (1, LANES)
                    mask = (lidx_k + shift) == iota_l  # (L, LANES) broadcast
                    for d in range(D):
                        picked = jnp.sum(
                            jnp.where(mask, minis[d], 0.0), axis=0, keepdims=True
                        )  # (1, LANES)
                        vals[d] = vals[d] + w * picked
        for d in range(D):
            out_refs[d][0, pl.ds(k, 1), :] = vals[d]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _deposit_kernel(lidx_ref, fx_ref, fy_ref, fz_ref, q_ref, valid_ref, out_ref):
    """One batch: inputs (1, K, LANES); out mini-grid (1, L, LANES)."""
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (L, LANES), 0)
    lidx = lidx_ref[0]
    fx, fy, fz = fx_ref[0], fy_ref[0], fz_ref[0]
    qv = q_ref[0] * valid_ref[0]
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
    out_ref[0] = acc


@partial(jax.jit, static_argnames=("gridsize", "interpret"))
def deposit_pallas(bk, gridsize: int, interpret: bool = False):
    """Deposit via the Pallas kernel → (n,n,n) grid (bucketed particles
    only; caller adds the overflow fallback)."""
    from concept_tpu.grid.bucketed import _assemble_global

    n = gridsize
    nb = _block_count(n)
    C = nb**3
    K = bk["q"].shape[1]
    pad = (-C) % LANES

    def padded(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)]
        ) if pad else x

    lidx = padded((bk["lx"] * LDIM + bk["ly"]) * LDIM + bk["lz"]).astype(jnp.int32)
    fx, fy, fz = padded(bk["fx"]), padded(bk["fy"]), padded(bk["fz"])
    q = padded(bk["q"])
    valid = padded(bk["valid"].astype(bk["q"].dtype))
    Cp = C + pad
    nbatch = Cp // LANES

    def to_batches(x):
        return x.reshape(nbatch, LANES, K).swapaxes(1, 2)

    out = pl.pallas_call(
        _deposit_kernel,
        out_shape=jax.ShapeDtypeStruct((nbatch, L, LANES), q.dtype),
        grid=(nbatch,),
        in_specs=[pl.BlockSpec((1, K, LANES), lambda i: (i, 0, 0))] * 6,
        out_specs=pl.BlockSpec((1, L, LANES), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(
        to_batches(lidx), to_batches(fx), to_batches(fy), to_batches(fz),
        to_batches(q), to_batches(valid),
    )
    local = out.swapaxes(1, 2).reshape(Cp, L)[:C]
    return _assemble_global(local, nb, n)


@partial(jax.jit, static_argnames=("gridsize", "interpret", "stacked"))
def gather_pallas(bk, grids, gridsize: int, interpret: bool = False,
                  stacked: bool = True):
    """Force gather via the Pallas kernel.  grids: (D,n,n,n).
    Returns (C, K, D) bucket-slot values, or a D-tuple of (C, K) arrays
    when ``stacked=False`` (preferred at large C: a trailing length-3
    axis is tile-padded 8× by the TPU layout)."""
    from concept_tpu.grid.bucketed import _extract_local

    n = gridsize
    nb = _block_count(n)
    C = nb**3
    D = grids.shape[0]
    K = bk["q"].shape[1]
    mini = jnp.stack([_extract_local(grids[d], nb, n) for d in range(D)], axis=-1)
    # pad C to a multiple of LANES
    pad = (-C) % LANES
    def padded(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)]
        ) if pad else x

    lidx = padded(bk["lx"] * LDIM * LDIM + bk["ly"] * LDIM + bk["lz"])
    fx, fy, fz = padded(bk["fx"]), padded(bk["fy"]), padded(bk["fz"])
    valid = padded(bk["valid"].astype(bk["fx"].dtype))
    mini = padded(mini)
    Cp = C + pad
    nbatch = Cp // LANES
    # lay out (nbatch, K, LANES) and (nbatch, L, LANES, D)
    def to_batches(x):
        return x.reshape(nbatch, LANES, *x.shape[1:]).swapaxes(1, 2)

    lidx_b = to_batches(lidx.astype(jnp.int32))
    fx_b, fy_b, fz_b = to_batches(fx), to_batches(fy), to_batches(fz)
    valid_b = to_batches(valid)
    # one (nbatch, L, LANES) operand per field component
    mini_bs = [
        mini[..., d].reshape(nbatch, LANES, L).swapaxes(1, 2) for d in range(D)
    ]

    kb = pl.BlockSpec((1, K, LANES), lambda i: (i, 0, 0))
    lb = pl.BlockSpec((1, L, LANES), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        _gather_kernel,
        out_shape=[jax.ShapeDtypeStruct((nbatch, K, LANES), mini.dtype)] * D,
        grid=(nbatch,),
        in_specs=[kb] * 5 + [lb] * D,
        out_specs=[kb] * D,
        interpret=interpret,
    )(lidx_b, fx_b, fy_b, fz_b, valid_b, *mini_bs)
    if not stacked:
        return tuple(o.swapaxes(1, 2).reshape(Cp * K)[: C * K].reshape(C, K)
                     for o in outs)
    # back to (C, K, D)
    out = jnp.stack(outs, axis=-1).swapaxes(1, 2).reshape(Cp, K, D)[:C]
    return out
