"""Fused component-wise P³M (forces/p3m.py) vs the established paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from concept_tpu.forces import pm as pm_force
from concept_tpu.forces.p3m import (
    p3m_kick_components, pm_longrange_components, pm_block_capacity,
)
from concept_tpu.forces.shortrange import (
    auto_capacity, cell_grid_shape, shortrange_momentum_updates,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    box = 64.0
    n_part = 16
    N = n_part**3
    lin = (np.arange(n_part) + 0.5) * (box / n_part)
    pos = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    pos += rng.standard_normal(pos.shape) * (0.45 * box / n_part)
    pos = np.mod(pos, box).astype(np.float32)
    return box, N, jnp.asarray(pos)


class TestPMLongrangeComponents:
    def test_matches_reference_pm_path(self, setup):
        box, N, pos = setup
        mesh = 32
        scale = 1.25 * box / mesh
        comps = tuple(jnp.asarray(np.asarray(pos)[:, d]) for d in range(3))
        (dlx, dly, dlz), n_over = pm_longrange_components(
            *comps, 2.0, box, 1.0, 1e-3, mesh, scale,
            k_pm=pm_block_capacity(N, mesh), interpret=True,
        )
        assert int(n_over) == 0
        (ref,) = pm_force.pm_gravity_momentum_updates(
            [pos], [2.0], mesh, box, 1.0, kick_integral=1e-3, order=2,
            longrange_scale=scale, deposit_method="scatter",
        )
        got = np.stack([np.asarray(dlx), np.asarray(dly), np.asarray(dlz)], 1)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=0, atol=5e-6)

    def test_overflow_path_exact(self, setup):
        # capacity 8 with a clustered blob: overflow must reproduce the
        # plain path exactly
        box, N, pos = setup
        mesh = 32
        scale = 1.25 * box / mesh
        p = np.asarray(pos).copy()
        p[:64] = np.asarray([10.0, 10.0, 10.0]) + np.random.default_rng(0).uniform(
            0, 0.5, (64, 3)
        )
        comps = tuple(jnp.asarray(p[:, d]) for d in range(3))
        (dlx, dly, dlz), n_over = pm_longrange_components(
            *comps, 2.0, box, 1.0, 1e-3, mesh, scale, k_pm=8,
            interpret=True,
        )
        assert int(n_over) > 0
        (ref,) = pm_force.pm_gravity_momentum_updates(
            [jnp.asarray(p)], [2.0], mesh, box, 1.0, kick_integral=1e-3,
            order=2, longrange_scale=scale, deposit_method="scatter",
        )
        got = np.stack([np.asarray(dlx), np.asarray(dly), np.asarray(dlz)], 1)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=0, atol=5e-6)


class TestP3MKickComponents:
    def test_matches_split_paths(self, setup):
        box, N, pos = setup
        mesh = 32
        scale = 1.25 * box / mesh
        cutoff = 4.5 * scale
        nc = cell_grid_shape(box, cutoff)
        K = auto_capacity(N, nc)
        comps = tuple(jnp.asarray(np.asarray(pos)[:, d]) for d in range(3))
        (dx, dy, dz), n_sr, n_pm = p3m_kick_components(
            *comps, 2.0, box, scale, cutoff, 1e-3, mesh, nc, K,
            k_pm=pm_block_capacity(N, mesh), G=1.0, interpret=True,
        )
        ds = shortrange_momentum_updates(
            pos, 2.0, box, scale, cutoff, 1e-3, n_cells=nc, capacity=K,
            G=1.0,
        )
        (dl,) = pm_force.pm_gravity_momentum_updates(
            [pos], [2.0], mesh, box, 1.0, kick_integral=1e-3, order=2,
            longrange_scale=scale, deposit_method="scatter",
        )
        ref = np.asarray(ds) + np.asarray(dl)
        got = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], 1)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)

    def test_total_force_vs_direct_pp(self, setup):
        # physics check: P³M total ≈ direct Ewald-free periodic sum is not
        # exact, but at sub-box separations the split must reconstruct the
        # direct 1/r² to a few e-3 rms (the split-scale matching test,
        # reference gravity.py:263-373)
        from concept_tpu.forces.pp import pp_momentum_updates

        box = 64.0
        rng = np.random.default_rng(3)
        # an isolated clump well inside the box: periodic images negligible
        p = (box / 2 + rng.standard_normal((64, 3)) * 2.0).astype(np.float32)
        mesh = 64
        scale = 1.25 * box / mesh
        cutoff = 4.5 * scale
        nc = cell_grid_shape(box, cutoff)
        K = 96
        comps = tuple(jnp.asarray(p[:, d]) for d in range(3))
        (dx, dy, dz), _, _ = p3m_kick_components(
            *comps, 2.0, box, scale, cutoff, 1e-3, mesh, nc, K,
            k_pm=96, G=1.0, interpret=True,
        )
        ref = np.asarray(
            pp_momentum_updates(jnp.asarray(p), 2.0, box, 1e-3, G=1.0,
                                periodic=False)
        )
        got = np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], 1)
        scale_ref = np.sqrt(np.mean(ref**2))
        rms = np.sqrt(np.mean((got - ref) ** 2)) / scale_ref
        assert rms < 0.05, rms
