"""Persistent-layout P³M stepper (p3msim) vs the flat fused kick."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from concept_tpu.forces.p3m import p3m_kick_components
from concept_tpu.p3msim import (
    P3MSimulation, _bucketize_p3m, _rebucketize_state, p3m_bucket_step,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    box = 64.0
    n_part = 16
    N = n_part**3
    lin = (np.arange(n_part) + 0.5) * (box / n_part)
    pos = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    pos += rng.standard_normal(pos.shape) * (0.45 * box / n_part)
    pos = np.mod(pos, box).astype(np.float32)
    mom = (rng.standard_normal((N, 3)) * 0.1).astype(np.float32)
    return box, n_part, pos, mom


def make_sim(box, n_part, **kw):
    return P3MSimulation(n_part, box, mass=2.0, G=1.0, mesh=2 * n_part, **kw)


def flatten(sim, state):
    v = np.asarray(state.valid).reshape(-1)
    pos = np.asarray(state.pos).reshape(3, -1).T[v]
    mom = np.asarray(state.mom).reshape(3, -1).T[v]
    return pos, mom


class TestBucketize:
    def test_roundtrip_keeps_all_particles(self, setup):
        box, n_part, pos, mom = setup
        sim = make_sim(box, n_part)
        state = sim.init_state(
            tuple(jnp.asarray(pos[:, d]) for d in range(3)),
            tuple(jnp.asarray(mom[:, d]) for d in range(3)),
        )
        assert int(jnp.sum(state.valid)) == pos.shape[0]
        p2, m2 = flatten(sim, state)
        # same multiset of particles (sort both for comparison)
        a = np.lexsort(pos.T)
        b = np.lexsort(p2.T)
        np.testing.assert_allclose(p2[b], pos[a], atol=0)
        np.testing.assert_allclose(m2[b], mom[a], atol=0)

    def test_rebucketize_after_drift(self, setup):
        box, n_part, pos, mom = setup
        sim = make_sim(box, n_part)
        state = sim.init_state(
            tuple(jnp.asarray(pos[:, d]) for d in range(3)),
            tuple(jnp.asarray(mom[:, d]) for d in range(3)),
        )
        # artificially drift positions by a full cell and rebucket
        drift = sim.cell_width
        state = state._replace(
            pos=jnp.where(state.valid[None], jnp.mod(state.pos + drift, box), 0.0)
        )
        state2 = sim.rebucket(state)
        assert int(jnp.sum(state2.valid)) == pos.shape[0]


class TestStepMatchesFlatKick:
    def test_one_step(self, setup):
        box, n_part, pos, mom = setup
        N = pos.shape[0]
        sim = make_sim(box, n_part)
        state = sim.init_state(
            tuple(jnp.asarray(pos[:, d]) for d in range(3)),
            tuple(jnp.asarray(mom[:, d]) for d in range(3)),
        )
        int_a1, int_a2 = 1e-3, 2e-3
        state, (n_over, vmax) = sim.step(state, int_a1, int_a2)
        assert n_over == 0

        # flat reference: kick with the SAME split parameters, then drift
        comps = tuple(jnp.asarray(pos[:, d]) for d in range(3))
        (dx, dy, dz), _, _ = p3m_kick_components(
            *comps, 2.0, box, sim.scale, sim.cutoff, int_a1,
            sim.mesh, sim.nc, sim.capacity, k_pm=sim.k_pm, G=1.0,
            interpret=True,
        )
        mom_ref = mom + np.stack(
            [np.asarray(dx), np.asarray(dy), np.asarray(dz)], 1
        )
        pos_ref = np.mod(pos + mom_ref * (int_a2 / 2.0), box)

        p2, m2 = flatten(sim, state)
        a = np.lexsort(pos_ref.T)
        b = np.lexsort(p2.T)
        np.testing.assert_allclose(p2[b], pos_ref[a], rtol=0, atol=2e-4)
        np.testing.assert_allclose(m2[b], mom_ref[a], rtol=0, atol=2e-4)
        assert vmax == pytest.approx(
            float(np.max(np.linalg.norm(mom_ref, axis=1))), rel=1e-4
        )

    def test_multi_step_with_rebucket_matches_flat_evolution(self, setup):
        box, n_part, pos, mom = setup
        N = pos.shape[0]
        sim = make_sim(box, n_part, margin_frac=0.15)
        state = sim.init_state(
            tuple(jnp.asarray(pos[:, d]) for d in range(3)),
            tuple(jnp.asarray(mom[:, d]) for d in range(3)),
        )
        int_a1, int_a2 = 5e-4, 1e-3
        pos_ref, mom_ref = pos.copy(), mom.copy()
        for step in range(4):
            state, _ = sim.step(state, int_a1, int_a2)
            if sim.needs_rebucket:
                state = sim.rebucket(state)
            comps = tuple(jnp.asarray(pos_ref[:, d]) for d in range(3))
            (dx, dy, dz), _, _ = p3m_kick_components(
                *comps, 2.0, box, sim.scale, sim.cutoff, int_a1,
                sim.mesh, sim.nc, sim.capacity, k_pm=sim.k_pm, G=1.0,
                interpret=True,
            )
            mom_ref = mom_ref + np.stack(
                [np.asarray(dx), np.asarray(dy), np.asarray(dz)], 1
            )
            pos_ref = np.mod(pos_ref + mom_ref * (int_a2 / 2.0), box)
        p2, m2 = flatten(sim, state)
        a = np.lexsort(pos_ref.T)
        b = np.lexsort(p2.T)
        np.testing.assert_allclose(p2[b], pos_ref[a], rtol=0, atol=1e-3)
        np.testing.assert_allclose(m2[b], mom_ref[a], rtol=0, atol=1e-3)


class TestClusteredOverflow:
    def test_pm_overflow_counted_and_exact(self, setup):
        # cram particles into one deposit block: k_pm=8 overflows, the
        # compacted plain path must reproduce the flat kick exactly
        box, n_part, pos, mom = setup
        rng = np.random.default_rng(5)
        p = np.asarray(pos).copy()
        p[:128] = 32.0 + rng.uniform(0, 1.5, (128, 3))
        p = p.astype(np.float32)
        sim = make_sim(box, n_part, k_pm=8)
        state = sim.init_state(
            tuple(jnp.asarray(p[:, d]) for d in range(3)),
            tuple(jnp.zeros((p.shape[0],), jnp.float32) for _ in range(3)),
        )
        int_a1, int_a2 = 1e-3, 0.0
        state, (n_over, _) = sim.step(state, int_a1, int_a2)
        assert n_over > 0
        comps = tuple(jnp.asarray(p[:, d]) for d in range(3))
        (dx, dy, dz), _, _ = p3m_kick_components(
            *comps, 2.0, box, sim.scale, sim.cutoff, int_a1,
            sim.mesh, sim.nc, sim.capacity, k_pm=8, G=1.0, interpret=True,
        )
        mom_ref = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], 1)
        p2, m2 = flatten(sim, state)
        a = np.lexsort(p.T)
        b = np.lexsort(p2.T)
        np.testing.assert_allclose(m2[b], mom_ref[a], rtol=0, atol=2e-4)


class TestAutotune:
    def test_zero_integral_step_preserves_state(self, setup):
        box, n_part, pos, mom = setup
        sim = make_sim(box, n_part)
        state = sim.init_state(
            tuple(jnp.asarray(pos[:, d]) for d in range(3)),
            tuple(jnp.asarray(mom[:, d]) for d in range(3)),
        )
        p0, m0 = flatten(sim, state)
        state, _ = sim.step(state, 0.0, 0.0)
        p1, m1 = flatten(sim, state)
        a = np.lexsort(p0.T)
        b = np.lexsort(p1.T)
        np.testing.assert_array_equal(p1[b], p0[a])
        np.testing.assert_array_equal(m1[b], m0[a])

    def test_autotune_picks_a_candidate_and_preserves_particles(self, setup):
        from concept_tpu.p3msim import autotune_margin

        box, n_part, pos, mom = setup
        sim = make_sim(box, n_part)
        state = sim.init_state(
            tuple(jnp.asarray(pos[:, d]) for d in range(3)),
            tuple(jnp.asarray(mom[:, d]) for d in range(3)),
        )
        state, results = autotune_margin(
            sim, state, candidates=(0.05, 0.2), n_time=1
        )
        assert sim.margin_frac in results
        assert results[sim.margin_frac] == min(results.values())
        assert int(jnp.sum(state.valid)) == pos.shape[0]


class TestPmKickCellsLean:
    """512³-class memory plan: pm_kick_cells_lean (per-component stencil
    gradients, in-place momentum update) must match the batched
    Fourier-diff pm_gradient_cells path up to the order-4 stencil
    truncation (the reference's own P³M differentiation default,
    param/example_explanatory:163-208)."""

    def test_lean_matches_batched_up_to_stencil_order(self):
        from concept_tpu.p3msim import pm_gradient_cells, pm_kick_cells_lean

        rng = np.random.default_rng(3)
        mesh, cb, box = 32, 8, 64.0
        nc = mesh // cb
        C = nc**3
        K = 32
        N = K * C // 3
        # jittered-lattice positions, bucketized by cell so every slot
        # sits in its own column (deposit-halo precondition)
        cell = rng.integers(0, C, N)
        counts = np.bincount(cell, minlength=C)
        assert counts.max() <= K
        cw = box / nc
        pos = np.zeros((3, K, C), np.float32)
        valid = np.zeros((K, C), bool)
        slot = np.zeros(C, np.int64)
        for i in range(N):
            c = cell[i]
            cx, cy, cz = c // nc**2, (c // nc) % nc, c % nc
            s = slot[c]
            pos[:, s, c] = (
                (np.array([cx, cy, cz]) + rng.uniform(0.1, 0.9, 3)) * cw
            )
            valid[s, c] = True
            slot[c] += 1
        pos3 = jnp.asarray(pos)
        vld = jnp.asarray(valid)
        mom0 = jnp.asarray(rng.standard_normal((3, K, C)).astype(np.float32))
        mom0 = jnp.where(vld[None], mom0, 0.0)
        mass, G, int_pm, scale = 2.0, 1.0, 1e-3, 1.25 * box / mesh

        mom1, msum = pm_kick_cells_lean(
            pos3, mom0, vld, mass, G, int_pm, scale, box, mesh, cb=cb,
            interpret=True,
        )
        assert np.isclose(float(msum), N * mass, rtol=1e-5)
        fd3, _, _ = pm_gradient_cells(
            pos3, vld, mass, G, scale, box, mesh, cb=cb, interpret=True,
        )
        mom_ref = jnp.where(vld[None], mom0 + (-mass * int_pm) * fd3, 0.0)
        d_lean = np.asarray(mom1 - mom0)[:, valid]
        d_ref = np.asarray(mom_ref - mom0)[:, valid]
        # wiring identical, differentiation differs (order-4 stencil vs
        # spectral): demand high correlation + small rms residual
        num = float((d_lean * d_ref).sum())
        den = float(np.sqrt((d_lean**2).sum() * (d_ref**2).sum()))
        assert num / den > 0.99, num / den
        rms = float(np.sqrt(((d_lean - d_ref) ** 2).mean()))
        ref = float(np.sqrt((d_ref**2).mean()))
        assert rms < 0.2 * ref, (rms, ref)
        # invalid slots untouched (zero)
        assert float(jnp.abs(jnp.where(vld[None], 0.0, mom1)).max()) == 0.0
