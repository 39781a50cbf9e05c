"""Persistent-bucket PM simulation: the TPU production stepper.

The per-step cost of the Pallas PM path is dominated by bucket
construction (sort + slot scatters ≈ 120 ms at 2M particles, vs 12+30 ms
for the actual deposit/gather kernels).  This stepper keeps the particle
state IN the block-bucket layout across steps:

  * state: pos/mom as (3, K, Cp) SLOT-MAJOR arrays — component and slot
    leading, the (huge, 128-padded) block axis minor.  This is the one
    layout the TPU (8, 128) memory tiling never pads: (C, K) with K < 128
    lanes wastes 8-16×, and a trailing length-3 component axis 40× — both
    fatal at 512³ (a single f32[3, 16.7M, 16] allocation is 25.8 GB
    padded, vs 3.2 GB flat).  It is also exactly the Pallas kernel block
    layout, so steps run with zero relayout copies.  The TPU analogue of
    the reference's tile-sorted storage (species.py:2657), made
    persistent;
  * each step recomputes the local interpolation fields elementwise from
    the stored positions (no sort, no scatter);
  * particles that drift outside their block's ±1-cell halo ("stragglers")
    are handled EXACTLY through a fixed-size compacted fallback set using
    the plain deposit/gather paths — correctness never depends on the
    bucket structure being fresh;
  * the host re-bucketizes every ``rebucket_every`` steps (drift-rate
    bound: ≤ fac_pm·cell/step ⇒ a halo crossing takes ≳ 7 steps), merging
    stragglers back into buckets.

Single-device, CIC, Fourier differentiation — the flagship benchmark
configuration.  The general Simulation (sim.py) covers every other
combination.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from concept_tpu.grid.bucketed import B, LDIM, _block_count
from concept_tpu.grid.pallas_pm import (
    LANES, deposit_pallas_pos, gather_pallas_pos,
)
from concept_tpu.grid.interp import deposit, gather
from concept_tpu.grid.fft import rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.forces.pm import gravity_potential_slab


class BucketState(NamedTuple):
    # slot-major layout: (component, slot, padded-block) — see module doc
    pos: jax.Array  # (3, K, Cp)
    mom: jax.Array  # (3, K, Cp)
    valid: jax.Array  # (K, Cp) bool


def _padded_blocks(C: int) -> int:
    return ((C + LANES - 1) // LANES) * LANES


def bucketize_state(pos, mom, gridsize: int, boxsize: float, capacity: int):
    """(N,3) arrays — or 3-tuples of 1D component arrays — → BucketState
    (one sort + slot scatters; runs at initialization and every
    ``rebucket_every`` steps, not per step).

    Large-N callers should pass component tuples: a device-resident
    (N,3) f32 array is lane-padded 42× by the TPU (8,128) tiling
    (68 GB at 512³).  The component arrays are DONATED (their buffers
    are reused; pass copies if you need them afterwards)."""
    if isinstance(pos, (tuple, list)):
        px0, py0, pz0 = (jnp.asarray(x) for x in pos)
        mx0, my0, mz0 = (jnp.asarray(x) for x in mom)
    else:
        px0, py0, pz0 = pos[:, 0], pos[:, 1], pos[:, 2]
        mx0, my0, mz0 = mom[:, 0], mom[:, 1], mom[:, 2]
    return _bucketize_core(px0, py0, pz0, mx0, my0, mz0,
                           jnp.asarray(boxsize, px0.dtype), gridsize, capacity)


@partial(
    jax.jit,
    static_argnames=("gridsize", "capacity"),
    donate_argnums=(0, 1, 2, 3, 4, 5),
)
def _bucketize_core(px0, py0, pz0, mx0, my0, mz0, boxsize,
                    gridsize: int, capacity: int):
    n = gridsize
    nb = _block_count(n)
    C = nb**3
    Cp = _padded_blocks(C)
    K = capacity
    N = px0.shape[0]
    h = boxsize / n
    # z-major block id — chunk of consecutive columns = z slab of blocks
    # (the Pallas drivers chunk the mini-grids along z at large n)
    key = jnp.zeros((N,), jnp.int32)
    for comp in (pz0, py0, px0):
        blk = jnp.clip((comp / h).astype(jnp.int32), 0, n - 1) // B
        key = key * nb + blk
    iota = jnp.arange(N, dtype=jnp.int32)
    key_s, px, py, pz, mx, my, mz = jax.lax.sort(
        [key, px0, py0, pz0, mx0, my0, mz0],
        num_keys=1,
    )
    # starts via sorted segment-sum + cumsum (searchsorted costs ~75x
    # more at C = 16.7M: per-query binary-search gathers)
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), key_s, num_segments=C,
        indices_are_sorted=True,
    )
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[key_s]
    in_bucket = rank < K
    # slot-major flat index; overflow routed out of bounds (mode="drop")
    slot = jnp.where(in_bucket, rank * Cp + key_s, K * Cp)

    def scat(vals):
        return (
            jnp.zeros((K * Cp,), vals.dtype)
            .at[slot].set(vals, mode="drop", unique_indices=True)
            .reshape(K, Cp)
        )

    pos_b = jnp.stack([scat(px), scat(py), scat(pz)], axis=0)
    mom_b = jnp.stack([scat(mx), scat(my), scat(mz)], axis=0)
    valid = (
        jnp.zeros((K * Cp,), bool)
        .at[slot].set(True, mode="drop", unique_indices=True)
        .reshape(K, Cp)
    )
    # capacity overflow (rank ≥ capacity) would silently drop particles —
    # callers size the capacity with headroom and can assert via
    # jnp.sum(valid) == N.
    return BucketState(pos=pos_b, mom=mom_b, valid=valid)


def flatten_state(state: BucketState):
    """(3,K,Cp) → flat (N,3) arrays of the valid particles (host side)."""
    v = np.asarray(state.valid).reshape(-1)
    pos = np.asarray(state.pos).reshape(3, -1).T[v]
    mom = np.asarray(state.mom).reshape(3, -1).T[v]
    return pos, mom


@partial(
    jax.jit,
    static_argnames=("gridsize", "boxsize", "max_straggler", "interpret"),
    donate_argnums=0,
)
def bucket_pm_step(
    state: BucketState,
    mass,
    boxsize: float,
    G,
    int_a1,
    int_a2,
    gridsize: int,
    max_straggler: int,
    interpret: bool = False,
):
    """One KDK step entirely in the slot-major bucket layout.

    int_a1: kick integral ᔑa⁻¹dt; int_a2: drift integral ᔑa⁻²dt.
    CIC geometry is computed inside the Pallas kernels from the stored
    positions; the only XLA-side per-slot work is the straggler mask and
    the kick/drift arithmetic.
    """
    n = gridsize
    nb = _block_count(n)
    K, Cp = state.valid.shape
    M = K * Cp
    h = boxsize / n
    dtype = state.pos.dtype
    # chunk the kernels' mini-grids along z once their full size (8× the
    # grid) stops being negligible against HBM
    nchunks = 8 if n >= 512 else 1

    # straggler mask: particles whose CIC anchor left the ±1-cell block
    # halo (z-major block ids, as laid down by bucketize_state).  Padding
    # blocks (cidx ≥ nb³) never hold valid slots.
    cidx = jax.lax.broadcasted_iota(jnp.int32, (K, Cp), 1)
    origins = (
        (cidx % nb) * B,
        ((cidx // nb) % nb) * B,
        (cidx // (nb * nb)) * B,
    )
    in_halo = None
    for d in range(3):
        anchor = jnp.floor(state.pos[d] / h - 0.5).astype(jnp.int32)
        lrel = anchor - origins[d] + 1
        ok = (lrel >= 0) & (lrel <= LDIM - 2)
        in_halo = ok if in_halo is None else (in_halo & ok)
    stragglers = state.valid & ~in_halo

    # single per-slot weight array: mass·validity.  Gathered forces come
    # back mass-scaled (the kick wants mass·force anyway), and invalid
    # slots self-zero everywhere — no separate valid_f/vmask arrays
    # (2×1 GB at 512³).
    w = state.valid.astype(dtype) * mass
    grid = deposit_pallas_pos(
        state.pos[0], state.pos[1], state.pos[2], w, n, boxsize,
        nchunks=nchunks, interpret=interpret,
    )

    # stragglers: fixed-size compaction, exact plain path.  Fill entries
    # index M (out of bounds) so the write-back scatter drops them.
    # The whole path lives behind lax.cond: the compaction (nonzero over
    # all M slots) plus the plain deposit/gathers cost ~320 ms at 256³
    # even when EMPTY, while freshly re-bucketized steps usually have no
    # stragglers at all (drift ≤ fac_pm·cell/step).
    n_straggler = jnp.sum(stragglers)

    def compact(_):
        # sort-based compaction: key the straggler slots by their flat
        # index (everything else keyed M) and take the leading entries —
        # one single-operand i32 sort at 97 ms vs jnp.nonzero's 318 ms
        # at M = 34M on v5e (nonzero lowers to cumsum + full-M scatter)
        key = jnp.where(stragglers.reshape(-1),
                        jnp.arange(M, dtype=jnp.int32), M)
        sidx = jax.lax.sort([key], num_keys=1)[0][:max_straggler]
        s_ok = sidx < M
        pos_flat = state.pos.reshape(3, M)
        # (3, S) — an (S, 3) array would be lane-padded 42×
        s_pos_t = pos_flat[:, jnp.minimum(sidx, M - 1)]
        s_q = jnp.where(s_ok, mass, 0.0).astype(dtype)
        return sidx, s_ok, s_pos_t, s_q

    def no_compact(_):
        return (
            jnp.full((max_straggler,), M, jnp.int32),
            jnp.zeros((max_straggler,), bool),
            jnp.zeros((3, max_straggler), dtype),
            jnp.zeros((max_straggler,), dtype),
        )

    has_strag = n_straggler > 0
    sidx, s_ok, s_pos_t, s_q = jax.lax.cond(has_strag, compact, no_compact, 0)
    grid = jax.lax.cond(
        has_strag,
        lambda g: g + deposit(s_pos_t.T, s_q, n, boxsize, order=2),
        lambda g: g,
        grid,
    )

    cell_volume = h**3
    slab = rfft3(grid / cell_volume)
    phi = gravity_potential_slab(slab, n, boxsize, G, deconv_order=4)

    # force + kick + drift.  The 3 gradient components share one gather
    # pass per chunk (the kernel's per-corner one-hot masks dominate, so
    # 3 components cost barely more than 1; chunking keeps the 3
    # simultaneous mini-grids small even at 512³).
    # fd comes back MASS-SCALED (w = mass·valid), exactly what the kick
    # needs; invalid slots have fd = 0, mom = 0, pos = 0 → stay put.
    # Below the chunking threshold the 3 components share one gather
    # pass (the kernel's one-hot masks dominate); at 512³ the 3 parallel
    # irfft pipelines alone (~10×512 MB FFT temps) exceed HBM, so the
    # dimensions run one at a time.
    if nchunks == 1:
        grads = tuple(
            irfft3(fourier.fourier_diff(phi, n, boxsize, d), n)
            for d in range(3)
        )
        fds = gather_pallas_pos(
            state.pos[0], state.pos[1], state.pos[2], w, grads, n,
            boxsize, nchunks=nchunks, interpret=interpret,
        )
    new_pos, new_mom = [], []
    for d in range(3):
        if nchunks == 1:
            grad, fd = grads[d], fds[d]
        else:
            grad = irfft3(fourier.fourier_diff(phi, n, boxsize, d), n)
            fd = gather_pallas_pos(
                state.pos[0], state.pos[1], state.pos[2], w, grad, n,
                boxsize, nchunks=nchunks, interpret=interpret,
            )
        fd = jax.lax.cond(
            has_strag,
            lambda f: f.reshape(M)
            .at[sidx].set(gather(grad, s_pos_t.T, boxsize, order=2)
                          * (mass * s_ok),
                          mode="drop")
            .reshape(K, Cp),
            lambda f: f,
            fd,
        )
        md = state.mom[d] + (-int_a1) * fd
        pd = jnp.mod(state.pos[d] + md * (int_a2 / mass), boxsize)
        new_mom.append(md)
        new_pos.append(pd)
    pos = jnp.stack(new_pos, axis=0)
    mom = jnp.stack(new_mom, axis=0)
    return BucketState(pos=pos, mom=mom, valid=state.valid), n_straggler


class BucketSimulation:
    """Flagship PM stepper over the persistent bucket layout."""

    def __init__(self, gridsize: int, boxsize: float, mass: float, G: float,
                 bg=None, capacity: int | None = None,
                 rebucket_every: int = 16, capacity_max: int = 16):
        self.n = gridsize
        self.boxsize = boxsize
        self.mass = mass
        self.G = G
        self.bg = bg
        self.capacity = capacity or 32
        self.rebucket_every = rebucket_every
        # capacity cap: beyond this, deep-halo overflow SPILLS into free
        # slots of other columns and rides the exact straggler path (a
        # K-padded state at the true max occupancy is ~15x the particle
        # memory under clustering).  16 = 2× the mean occupancy:
        # measured optimum at 256³/z≈7 (amortized 1.19 s/step vs 1.26 s
        # at cap 24 and 2.17 s at cap 64 — kernel cost ∝ K beats the
        # straggler cost of the extra spill; scripts/prof_pm_capacity.py)
        self.capacity_max = capacity_max
        self._n_spilled = 0
        self.interpret = jax.default_backend() != "tpu"

    def init_state(self, pos, mom) -> BucketState:
        self._N = pos[0].shape[0] if isinstance(pos, (tuple, list)) else pos.shape[0]
        return self._bucketize_checked(pos, mom)

    def _bucketize_checked(self, pos, mom) -> BucketState:
        """Bucketize, growing capacity until no particle is dropped.

        bucketize_state donates its inputs, so keep host copies for the
        retry.  Capacity overflow must never silently lose particles
        (the reference Tiling never does, species.py:438-850)."""
        if isinstance(pos, (tuple, list)):
            pos_h = [np.asarray(p) for p in pos]
            mom_h = [np.asarray(m) for m in mom]
        else:
            p = np.asarray(pos)
            m = np.asarray(mom)
            pos_h = [np.ascontiguousarray(p[:, d]) for d in range(3)]
            mom_h = [np.ascontiguousarray(m[:, d]) for d in range(3)]
        while True:
            state = bucketize_state(
                tuple(jnp.asarray(p) for p in pos_h),
                tuple(jnp.asarray(m) for m in mom_h),
                self.n, self.boxsize, self.capacity,
            )
            kept = int(jnp.sum(state.valid))
            if kept == self._N:
                return state
            self.capacity = max(self.capacity * 2, 8)

    def step(self, state: BucketState, int_a1: float, int_a2: float):
        max_straggler = self._straggler_budget()
        return bucket_pm_step(
            state, self.mass, self.boxsize, self.G,
            jnp.asarray(int_a1, state.pos.dtype),
            jnp.asarray(int_a2, state.pos.dtype),
            self.n, max_straggler, self.interpret,
        )

    def _straggler_budget(self) -> int:
        """Fixed-size straggler buffer: baseline drift crossers plus the
        spilled overflow population (power-of-two quantized to bound the
        number of retraces as clustering grows).  The plain straggler
        deposit/gathers cost ∝ the PADDED size, so the budget tracks the
        actual population with ~25% headroom (the old 2×spill + N/64
        sizing measured ~300 ms/step of pure padding waste at 256³)."""
        base = max(1024, self._N // 256)
        need = base + self._n_spilled + self._n_spilled // 4
        p = 1024
        while p < need:
            p *= 2
        return p

    def evolve(self, state: BucketState, t0: float, t1: float,
               max_steps: int = 100000):
        """Leapfrog evolution with periodic re-bucketize (every
        ``rebucket_every`` steps or when the straggler buffer passes half
        capacity)."""
        bg = self.bg
        t = t0
        t_mom = t0
        steps = 0
        max_straggler = self._straggler_budget()
        while t < t1 - 1e-12 * abs(t1):
            a = float(bg.a_of_t_np(t))
            dt = min(self._timestep(a), t1 - t)
            t_mid = min(t + 0.5 * dt, t1)
            int_a1 = bg.integrals_np(t_mom, t_mid, keys=("a**(-1)",))["a**(-1)"]
            int_a2 = bg.integrals_np(t, t + dt, keys=("a**(-2)",))["a**(-2)"]
            state, ns = self.step(state, int_a1, int_a2)
            steps += 1
            if int(ns) > max_straggler:
                # the fixed-size compaction TRUNCATED: excess stragglers
                # neither deposited nor got the exact-path force — the
                # step result is corrupt.  Fail loudly (the half-capacity
                # rebucket trigger below should make this unreachable).
                raise RuntimeError(
                    f"straggler overflow: {int(ns)} > budget "
                    f"{max_straggler} — step result corrupt; lower "
                    f"rebucket_every or raise the straggler budget"
                )
            max_straggler = self._straggler_budget()
            if steps % self.rebucket_every == 0 or int(ns) > max_straggler // 2:
                state = self.maybe_rebucket(state)
            t_mom = t_mid
            t += dt
            if steps > max_steps:
                raise RuntimeError("max_steps exceeded")
        if t_mom < t1 - 1e-12 * abs(t1):
            int_a1 = bg.integrals_np(t_mom, t1, keys=("a**(-1)",))["a**(-1)"]
            state, _ = self.step(state, int_a1, 0.0)
        return state

    def _timestep(self, a: float) -> float:
        from concept_tpu.sim import (
            FAC_DYNAMICAL, FAC_HUBBLE, DELTA_A_MAX_EARLY, DELTA_A_MAX_LATE,
        )

        H = float(self.bg.hubble_np(a))
        rho = self.mass * self._N / self.boxsize**3 / a**3
        limits = [FAC_DYNAMICAL / math.sqrt(self.G * rho)]
        if H > 0:
            limits.append(FAC_HUBBLE / H)
            da = DELTA_A_MAX_EARLY if a < 0.1 else DELTA_A_MAX_LATE
            limits.append(da / (a * H))
        return min(limits)

    def maybe_rebucket(self, state: BucketState) -> BucketState:
        """Device-side re-bucketize (donating the old state): flatten the
        slots, sort by block key with invalid→sentinel, rebuild at the
        (possibly grown) capacity.  The old host-roundtrip version held
        the old state, host copies and the new state simultaneously —
        an OOM at 256³+ once clustering had grown the capacity.

        The needed capacity is probed FIRST (cheap occupancy max), so the
        single donating rebuild is guaranteed lossless.  Once the
        capacity sits AT the cap the probe is skipped — the capacity
        cannot change and the rebuild itself reports the spill (the
        probe costs a ~0.3 s full-slot scatter-add at 256³)."""
        cap = max(8, self.capacity_max)
        if self.capacity != cap:
            max_count = int(_occupancy_probe(
                state, jnp.asarray(self.boxsize, state.pos.dtype), self.n
            ))
            need = max(8, ((max_count + 7) // 8) * 8)
            if need <= cap:
                # fits under the cap: size with 30% clustering headroom
                # (shrinking an over-grown capacity is fine — the layout
                # is rebuilt from scratch anyway)
                self.capacity = min(
                    max(8, int(math.ceil(1.3 * need / 8)) * 8), cap
                )
            else:
                # cap reached: overflow beyond it SPILLS into free slots
                # elsewhere and is handled exactly by the straggler path
                self.capacity = cap
        new_state, kept, n_spill, n_valid = _rebucketize_bucketstate(
            state, jnp.asarray(self.boxsize, state.pos.dtype), self.n,
            self.capacity, self._N,
        )
        kept = int(kept)
        self._n_spilled = int(n_spill)
        assert kept == self._N, (kept, self._N)
        # detect invariant violations the leading-N clamp would mask
        assert int(n_valid) == self._N, (int(n_valid), self._N)
        return new_state


@partial(jax.jit, static_argnames=("gridsize",))
def _occupancy_probe(state: BucketState, boxsize, gridsize: int):
    """Max per-block occupancy of the CURRENT positions (host sizing
    probe before a donating rebucketize)."""
    n = gridsize
    nb = _block_count(n)
    C = nb**3
    K, Cp = state.valid.shape
    M = K * Cp
    h = boxsize / n
    validf = state.valid.reshape(M)
    flat = state.pos.reshape(3, M)
    key = jnp.zeros((M,), jnp.int32)
    for comp in (flat[2], flat[1], flat[0]):
        blk = jnp.clip((comp / h).astype(jnp.int32), 0, n - 1) // B
        key = key * nb + blk
    key = jnp.where(validf, key, C)
    counts = jnp.zeros((C + 1,), jnp.int32).at[key].add(1, mode="drop")
    return jnp.max(counts[:C])


@partial(jax.jit, static_argnames=("gridsize", "capacity", "n_total"),
         donate_argnums=(0,))
def _rebucketize_bucketstate(state: BucketState, boxsize, gridsize: int,
                             capacity: int, n_total: int):
    """Flatten (donated) slots → fresh BucketState at ``capacity``.

    Sorts the M = K_old·Cp slot arrays DIRECTLY by block key with
    invalid slots keyed last, then takes the leading N entries: one
    M-sized multi-operand sort (sorts run at memory speed) replaces the
    previous compact-first formulation's size-N nonzero + 6 compaction
    gathers — gathers are index-count-bound on TPU (~1.1e8 indices/s;
    the compact-first version measured 8.9 s at 256³/K=64 vs ~1 s for
    this one, matching the same rewrite in p3mrungs.rebucketize_rungs).
    Returns (state', n_kept, n_spill)."""
    n = gridsize
    nb = _block_count(n)
    C = nb**3
    Cp = _padded_blocks(C)
    K = capacity
    K_old, Cp_old = state.valid.shape
    M = K_old * Cp_old
    N = n_total
    h = boxsize / n
    validf = state.valid.reshape(M)
    flat = state.pos.reshape(3, M)
    mflat = state.mom.reshape(3, M)
    key = jnp.zeros((M,), jnp.int32)
    for comp in (flat[2], flat[1], flat[0]):
        blk = jnp.clip((comp / h).astype(jnp.int32), 0, n - 1) // B
        key = key * nb + blk
    key = jnp.where(validf, key, C)
    # exactly N valid slots must exist (class invariant); report the
    # actual count so the caller can fail LOUDLY if it is ever violated —
    # the clamp below would otherwise fold leaked invalid slots into
    # block C−1 as phantom particles that keep the n_kept check green
    n_valid = jnp.sum(validf)
    ops = jax.lax.sort(
        [key, flat[0], flat[1], flat[2], mflat[0], mflat[1], mflat[2]],
        num_keys=1,
    )
    key_s = jnp.minimum(ops[0][:N], C - 1)
    px, py, pz, mx, my, mz = (o[:N] for o in ops[1:])
    iota = jnp.arange(N, dtype=jnp.int32)
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), key_s, num_segments=C,
        indices_are_sorted=True,
    )
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[key_s]
    in_b = rank < K
    counts_k = jnp.minimum(counts, K)
    n_spill = N - jnp.sum(counts_k)
    slot_home = jnp.where(in_b, rank * Cp + key_s, K * Cp)
    # SPILLOVER: block-capacity overflow (rank ≥ K — deep halos at a
    # capped K) is placed into FREE slots of other columns rather than
    # dropped: the per-step in-halo straggler path derives everything
    # from positions, so spilled particles are handled exactly, at
    # straggler cost.  The j-th overflow particle goes to the j-th free
    # slot in layout order; free slots are enumerated ANALYTICALLY from
    # the per-column kept counts (rows ≥ count are free) so the spill
    # rides the SAME scatter pass as everyone else — the previous
    # free-slot nonzero + 7 rewrite scatters cost ~1 s at 256³.
    over = ~in_b
    spill_rank = jnp.cumsum(over.astype(jnp.int32)) - 1  # j among overflow

    def slots_with_spill(home):
        counts_p = jnp.pad(counts_k, (0, Cp - C))  # padding columns free
        free_mark = (
            jnp.arange(K, dtype=jnp.int32)[:, None] >= counts_p[None, :]
        ).reshape(-1)
        free_id = jnp.cumsum(free_mark.astype(jnp.int32)) - 1
        free_slot_of = (
            jnp.full((N,), K * Cp, jnp.int32)
            .at[jnp.where(free_mark, free_id, N)]
            .set(jnp.arange(K * Cp, dtype=jnp.int32), mode="drop")
        )
        return jnp.where(
            in_b, home, free_slot_of[jnp.minimum(spill_rank, N - 1)]
        )

    slot = jax.lax.cond(
        n_spill > 0, slots_with_spill, lambda h: h, slot_home
    )

    def scat(vals):
        return (
            jnp.zeros((K * Cp,), vals.dtype)
            .at[slot].set(vals, mode="drop", unique_indices=True)
            .reshape(K, Cp)
        )

    pos = jnp.stack([scat(px), scat(py), scat(pz)])
    mom = jnp.stack([scat(mx), scat(my), scat(mz)])
    valid = (
        jnp.zeros((K * Cp,), bool)
        .at[slot].set(True, mode="drop", unique_indices=True)
        .reshape(K, Cp)
    )
    n_kept = jnp.sum(valid)
    return BucketState(pos=pos, mom=mom, valid=valid), n_kept, n_spill, n_valid
