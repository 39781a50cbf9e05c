"""Persistent-bucket PM simulation: the TPU production stepper.

The per-step cost of the Pallas PM path is dominated by bucket
construction (sort + slot scatters ≈ 120 ms at 2M particles, vs 12+30 ms
for the actual deposit/gather kernels).  This stepper keeps the particle
state IN the (C, K) block-bucket layout across steps:

  * state: pos/mom as (C, K, 3) with a validity mask — the analogue of the
    reference's tile-sorted storage (species.py:2657), made persistent;
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
from concept_tpu.grid.pallas_pm import deposit_pallas, gather_pallas
from concept_tpu.grid.interp import deposit, gather
from concept_tpu.grid.fft import rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.forces.pm import gravity_potential_slab


class BucketState(NamedTuple):
    # component-leading layout: a trailing length-3 axis would be padded
    # to a full (8,128) tile by the TPU layout (8× memory at 512³)
    pos: jax.Array  # (3, C, K)
    mom: jax.Array  # (3, C, K)
    valid: jax.Array  # (C, K) bool


def bucketize_state(pos, mom, gridsize: int, boxsize: float, capacity: int):
    """Flat (N,3) arrays → BucketState (one sort + slot scatters; runs at
    initialization and every ``rebucket_every`` steps, not per step)."""
    n = gridsize
    nb = _block_count(n)
    C = nb**3
    N = pos.shape[0]
    h = boxsize / n
    cell = jnp.clip((pos / h).astype(jnp.int32), 0, n - 1)
    block = cell // B
    key = (block[:, 0] * nb + block[:, 1]) * nb + block[:, 2]
    iota = jnp.arange(N, dtype=jnp.int32)
    key_s, px, py, pz, mx, my, mz = jax.lax.sort(
        [key, pos[:, 0], pos[:, 1], pos[:, 2], mom[:, 0], mom[:, 1], mom[:, 2]],
        num_keys=1,
    )
    starts = jnp.searchsorted(key_s, jnp.arange(C, dtype=jnp.int32))
    rank = iota - starts[key_s]
    in_bucket = rank < capacity
    slot = jnp.where(in_bucket, key_s * capacity + rank, C * capacity)

    def scat(vals):
        out = jnp.zeros((C * capacity + 1,), vals.dtype)
        return out.at[slot].set(vals, unique_indices=True)[:-1].reshape(C, capacity)

    pos_b = jnp.stack([scat(px), scat(py), scat(pz)], axis=0)
    mom_b = jnp.stack([scat(mx), scat(my), scat(mz)], axis=0)
    counts = jnp.diff(jnp.concatenate([starts, jnp.array([N], starts.dtype)]))
    valid = jnp.arange(capacity, dtype=counts.dtype)[None, :] < jnp.minimum(
        counts, capacity
    )[:, None]
    # capacity overflow (rank ≥ capacity) would silently drop particles —
    # callers size the capacity with headroom and can assert via
    # jnp.sum(valid) == N.
    return BucketState(pos=pos_b, mom=mom_b, valid=valid)


def flatten_state(state: BucketState):
    """(3,C,K) → flat (N,3) arrays of the valid particles (host side)."""
    v = np.asarray(state.valid).reshape(-1)
    pos = np.asarray(state.pos).reshape(3, -1).T[v]
    mom = np.asarray(state.mom).reshape(3, -1).T[v]
    return pos, mom


@partial(
    jax.jit,
    static_argnames=("gridsize", "max_straggler", "interpret"),
    donate_argnums=0,
)
def bucket_pm_step(
    state: BucketState,
    mass,
    boxsize,
    G,
    int_a1,
    int_a2,
    gridsize: int,
    max_straggler: int,
    interpret: bool = False,
):
    """One KDK step entirely in bucket layout.

    int_a1: kick integral ᔑa⁻¹dt; int_a2: drift integral ᔑa⁻²dt.
    """
    n = gridsize
    nb = _block_count(n)
    C, K = state.valid.shape
    h = boxsize / n
    dtype = state.pos.dtype

    # local interpolation fields from stored positions (elementwise,
    # component-wise to keep every array a clean (C, K) tile)
    cidx = jnp.arange(C, dtype=jnp.int32)
    origins = (
        (cidx // (nb * nb))[:, None] * B,
        ((cidx // nb) % nb)[:, None] * B,
        (cidx % nb)[:, None] * B,
    )
    fs, lrels = [], []
    for d in range(3):
        u = state.pos[d] / h - 0.5
        anchor = jnp.floor(u).astype(jnp.int32)  # (C,K)
        fs.append((u - anchor).astype(dtype))
        lrels.append(anchor - origins[d] + 1)
    in_halo = (
        (lrels[0] >= 0) & (lrels[0] <= LDIM - 2)
        & (lrels[1] >= 0) & (lrels[1] <= LDIM - 2)
        & (lrels[2] >= 0) & (lrels[2] <= LDIM - 2)
    )
    handled = state.valid & in_halo
    stragglers = state.valid & ~in_halo

    bk = {
        "lx": jnp.clip(lrels[0], 0, LDIM - 2),
        "ly": jnp.clip(lrels[1], 0, LDIM - 2),
        "lz": jnp.clip(lrels[2], 0, LDIM - 2),
        "fx": fs[0], "fy": fs[1], "fz": fs[2],
        "q": jnp.where(handled, mass, 0.0).astype(dtype),
        "valid": handled,
    }
    grid = deposit_pallas(bk, n, interpret=interpret)

    # stragglers: fixed-size compaction, exact plain path
    sflat = stragglers.reshape(-1)
    sidx = jnp.nonzero(sflat, size=max_straggler, fill_value=C * K)[0]
    s_ok = sidx < C * K
    pos_flat = jnp.concatenate(
        [state.pos.reshape(3, -1), jnp.zeros((3, 1), dtype)], axis=1
    )
    s_pos = pos_flat[:, jnp.minimum(sidx, C * K)].T
    s_q = jnp.where(s_ok, mass, 0.0).astype(dtype)
    grid = grid + deposit(s_pos, s_q, n, boxsize, order=2)

    cell_volume = h**3
    slab = rfft3(grid / cell_volume)
    phi = gravity_potential_slab(slab, n, boxsize, G, deconv_order=4)
    grads = jnp.stack(
        [irfft3(fourier.fourier_diff(phi, n, boxsize, d), n) for d in range(3)]
    )

    force_b = gather_pallas(bk, grads, n, interpret=interpret, stacked=False)
    # straggler forces (plain gather on the compacted set), written back
    # component-wise to preserve the (C,K) tiling
    vmask = state.valid.astype(dtype)
    new_mom = []
    new_pos = []
    for d in range(3):
        s_force_d = gather(grads[d], s_pos, boxsize, order=2) * s_ok
        fd = jnp.concatenate(
            [force_b[d].reshape(-1), jnp.zeros((1,), dtype)]
        ).at[sidx].set(s_force_d)[:-1].reshape(C, K)
        md = state.mom[d] + (-mass * int_a1) * fd * vmask
        pd = jnp.mod(state.pos[d] + md * (int_a2 / mass) * vmask, boxsize)
        new_mom.append(md)
        new_pos.append(pd)
    mom = jnp.stack(new_mom, axis=0)
    pos = jnp.stack(new_pos, axis=0)
    n_straggler = jnp.sum(stragglers)
    return BucketState(pos=pos, mom=mom, valid=state.valid), n_straggler


class BucketSimulation:
    """Flagship PM stepper over the persistent bucket layout."""

    def __init__(self, gridsize: int, boxsize: float, mass: float, G: float,
                 bg=None, capacity: int | None = None,
                 rebucket_every: int = 8):
        self.n = gridsize
        self.boxsize = boxsize
        self.mass = mass
        self.G = G
        self.bg = bg
        self.capacity = capacity or 32
        self.rebucket_every = rebucket_every
        self.interpret = jax.default_backend() != "tpu"

    def init_state(self, pos, mom) -> BucketState:
        self._N = pos.shape[0]
        return bucketize_state(pos, mom, self.n, self.boxsize, self.capacity)

    def step(self, state: BucketState, int_a1: float, int_a2: float):
        # straggler buffer: drift ≤ fac_pm·cell/step bounds block-crossers
        # to a few % between re-bucketizes; the host checks the count and
        # re-bucketizes (and could grow the buffer) before it saturates
        max_straggler = max(1024, (self._N // 64))
        return bucket_pm_step(
            state, self.mass, self.boxsize, self.G,
            jnp.asarray(int_a1, state.pos.dtype),
            jnp.asarray(int_a2, state.pos.dtype),
            self.n, max_straggler, self.interpret,
        )

    def evolve(self, state: BucketState, t0: float, t1: float,
               max_steps: int = 100000):
        """Leapfrog evolution with periodic re-bucketize (every
        ``rebucket_every`` steps or when the straggler buffer passes half
        capacity)."""
        bg = self.bg
        t = t0
        t_mom = t0
        steps = 0
        max_straggler = max(1024, (self._N // 64))
        while t < t1 - 1e-12 * abs(t1):
            a = float(bg.a_of_t_np(t))
            dt = min(self._timestep(a), t1 - t)
            t_mid = min(t + 0.5 * dt, t1)
            int_a1 = bg.integrals_np(t_mom, t_mid, keys=("a**(-1)",))["a**(-1)"]
            int_a2 = bg.integrals_np(t, t + dt, keys=("a**(-2)",))["a**(-2)"]
            state, ns = self.step(state, int_a1, int_a2)
            steps += 1
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
        pos, mom = flatten_state(state)
        return bucketize_state(
            jnp.asarray(pos, state.pos.dtype), jnp.asarray(mom, state.pos.dtype),
            self.n, self.boxsize, self.capacity,
        )
