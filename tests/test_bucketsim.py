"""Persistent-bucket stepper must match the standard PM step exactly
(including straggler handling after particles cross block halos)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concept_tpu.bucketsim import (
    BucketSimulation, bucketize_state, flatten_state, bucket_pm_step,
)
from concept_tpu.forces.pm import pm_gravity_momentum_updates


N_GRID, BOX, MASS, G = 16, 40.0, 2.0, 1.0


def make_particles(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(rng.uniform(0, BOX, (n, 3)).astype(np.float32))
    mom = jnp.asarray((0.02 * rng.standard_normal((n, 3))).astype(np.float32))
    return pos, mom


def sort_rows(x):
    x = np.asarray(x, dtype=np.float64)
    return x[np.lexsort((x[:, 2], x[:, 1], x[:, 0]))]


def reference_step(pos, mom, int_a1, int_a2):
    (dmom,) = pm_gravity_momentum_updates(
        [pos], [MASS], N_GRID, BOX, G, kick_integral=int_a1,
        order=2, deposit_method="scatter",
    )
    mom2 = mom + dmom
    pos2 = jnp.mod(pos + mom2 * (int_a2 / MASS), BOX)
    return pos2, mom2


def test_bucket_state_roundtrip():
    pos, mom = make_particles()
    st = bucketize_state(pos, mom, N_GRID, BOX, capacity=24)
    assert int(jnp.sum(st.valid)) == pos.shape[0]
    p2, m2 = flatten_state(st)
    np.testing.assert_allclose(sort_rows(p2), sort_rows(pos), rtol=1e-6)


def test_bucket_step_matches_reference():
    pos, mom = make_particles()
    sim = BucketSimulation(N_GRID, BOX, MASS, G, capacity=24)
    st = sim.init_state(pos, mom)
    int_a1, int_a2 = 0.4, 0.3
    st2, n_strag = sim.step(st, int_a1, int_a2)
    ref_pos, ref_mom = reference_step(pos, mom, int_a1, int_a2)
    p2, m2 = flatten_state(st2)
    np.testing.assert_allclose(
        sort_rows(p2), sort_rows(ref_pos), atol=2e-4
    )


def test_bucket_multi_step_with_stragglers():
    """Several steps without re-bucketize: stragglers (block-crossers) must
    be handled exactly; compare against stepping the plain path."""
    pos, mom = make_particles(seed=5)
    # boost momenta so particles cross blocks quickly
    mom = mom * 20.0
    sim = BucketSimulation(N_GRID, BOX, MASS, G, capacity=24)
    st = sim.init_state(pos, mom)
    rp, rm = pos, mom
    total_strag = 0
    for i in range(4):
        st, ns = sim.step(st, 0.3, 0.25)
        total_strag += int(ns)
        rp, rm = reference_step(rp, rm, 0.3, 0.25)
    assert total_strag > 0, "test should exercise the straggler path"
    p2, _ = flatten_state(st)
    np.testing.assert_allclose(sort_rows(p2), sort_rows(rp), atol=1e-3)


def test_bucket_step_padded_block_count():
    """gridsize 12 → 6³ = 216 blocks, padded to Cp = 256: the padding
    blocks must not contribute mass or forces."""
    n_grid, box = 12, 30.0
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.uniform(0, box, (800, 3)).astype(np.float32))
    mom = jnp.asarray((0.01 * rng.standard_normal((800, 3))).astype(np.float32))
    sim = BucketSimulation(n_grid, box, MASS, G, capacity=24)
    st = sim.init_state(pos, mom)
    assert st.valid.shape[1] == 256 and int(jnp.sum(st.valid)) == 800
    st2, _ = sim.step(st, 0.4, 0.3)
    (dmom,) = pm_gravity_momentum_updates(
        [pos], [MASS], n_grid, box, G, kick_integral=0.4,
        order=2, deposit_method="scatter",
    )
    ref_pos = jnp.mod(pos + (mom + dmom) * (0.3 / MASS), box)
    p2, _ = flatten_state(st2)
    np.testing.assert_allclose(sort_rows(p2), sort_rows(ref_pos), atol=2e-4)


def test_rebucket_preserves_particles():
    pos, mom = make_particles(seed=7)
    sim = BucketSimulation(N_GRID, BOX, MASS, G, capacity=24)
    st = sim.init_state(pos, mom)
    st, _ = sim.step(st, 0.3, 0.25)
    p_a, _ = flatten_state(st)  # before: maybe_rebucket DONATES its input
    st2 = sim.maybe_rebucket(st)
    assert int(jnp.sum(st2.valid)) == pos.shape[0]
    p_b, _ = flatten_state(st2)
    np.testing.assert_allclose(sort_rows(p_a), sort_rows(p_b), rtol=1e-6)


def test_capped_capacity_spillover_exact():
    """With capacity_max below the true max occupancy, overflow spills
    into free slots elsewhere and rides the exact straggler path: no
    particle lost, forces match the uncapped stepper."""
    pos, mom = make_particles(seed=3)
    p = np.asarray(pos).copy()
    # deep clump: ~100 particles in one 2-cell block
    p[:100] = (BOX / 2) + np.random.default_rng(0).uniform(
        0, 0.8 * BOX / N_GRID, (100, 3)
    )
    p = p.astype(np.float32)
    pc = tuple(jnp.asarray(np.ascontiguousarray(p[:, d])) for d in range(3))
    mc = tuple(jnp.asarray(np.asarray(mom)[:, d]) for d in range(3))

    sim_cap = BucketSimulation(N_GRID, BOX, MASS, G, capacity=16,
                               capacity_max=16)
    st = sim_cap.init_state(pc, mc)  # init grows K as needed
    # force a capped rebucket: probe says need > 16, cap holds at >=16
    st = sim_cap.maybe_rebucket(st)
    assert int(jnp.sum(st.valid)) == p.shape[0]
    assert sim_cap._n_spilled > 0
    st1, ns = sim_cap.step(st, 0.3, 0.25)
    assert int(jnp.sum(st1.valid)) == p.shape[0]

    pc2 = tuple(jnp.asarray(np.ascontiguousarray(p[:, d])) for d in range(3))
    mc2 = tuple(jnp.asarray(np.asarray(mom)[:, d]) for d in range(3))
    sim_big = BucketSimulation(N_GRID, BOX, MASS, G, capacity=104,
                               capacity_max=1024)
    st_big = sim_big.init_state(pc2, mc2)
    st2, _ = sim_big.step(st_big, 0.3, 0.25)
    p1, m1 = flatten_state(st1)
    p2, m2 = flatten_state(st2)
    np.testing.assert_allclose(sort_rows(p1), sort_rows(p2), atol=2e-4)
    np.testing.assert_allclose(sort_rows(m1), sort_rows(m2), atol=2e-3)
