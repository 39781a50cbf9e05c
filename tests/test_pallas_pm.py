"""Pallas deposit/gather kernels must match the plain paths (interpret
mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.grid.bucketed import bucketize_blocks
from concept_tpu.grid.pallas_pm import deposit_pallas, gather_pallas
from concept_tpu.grid.interp import deposit, gather


@pytest.fixture
def setup():
    n, box = 16, 40.0
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, box, (3000, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0.5, 1.5, (3000,)).astype(np.float32))
    bk = bucketize_blocks(pos, q, n, box, capacity=16)
    return n, box, pos, q, bk


def test_pallas_deposit_matches(setup):
    n, box, pos, q, bk = setup
    g_pl = deposit_pallas(bk, n, interpret=True)
    # compare against plain deposit of the NON-overflow subset
    over = np.zeros(pos.shape[0], bool)
    over[np.asarray(bk["order"])] = np.asarray(bk["overflow"])
    q_in = jnp.where(jnp.asarray(~over), q, 0.0)
    g_ref = deposit(pos, q_in, n, box, order=2)
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_ref), atol=2e-5 * float(jnp.max(g_ref))
    )


def test_pallas_gather_matches(setup):
    n, box, pos, q, bk = setup
    rng = np.random.default_rng(4)
    grids = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    vals = gather_pallas(bk, grids, n, interpret=True)  # (C, K, D)
    flat = vals.reshape(-1, 3)
    N = pos.shape[0]
    sorted_vals = jnp.concatenate([flat, jnp.zeros((1, 3), flat.dtype)])[
        jnp.minimum(bk["slot"], flat.shape[0])
    ]
    out = jnp.zeros((N, 3), flat.dtype).at[bk["order"]].set(sorted_vals)
    ref = np.stack(
        [np.asarray(gather(grids[d], pos, box, order=2)) for d in range(3)],
        axis=1,
    )
    over = np.zeros(N, bool)
    over[np.asarray(bk["order"])] = np.asarray(bk["overflow"])
    np.testing.assert_allclose(
        np.asarray(out)[~over], ref[~over], atol=1e-5
    )


def test_pm_pallas_path_matches_plain():
    """The full PM force through the Pallas path must match the plain
    path (CIC, fourier differentiation)."""
    from concept_tpu.forces.pm import pm_gravity_momentum_updates

    n, box = 16, 40.0
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0, box, (4000, 3)).astype(np.float32))
    (d_plain,) = pm_gravity_momentum_updates(
        [pos], [2.0], n, box, 1.0, kick_integral=0.5, order=2,
        deposit_method="scatter",
    )
    (d_pallas,) = pm_gravity_momentum_updates(
        [pos], [2.0], n, box, 1.0, kick_integral=0.5, order=2,
        deposit_method="pallas",
    )
    scale = float(jnp.max(jnp.abs(d_plain)))
    np.testing.assert_allclose(
        np.asarray(d_pallas) / scale, np.asarray(d_plain) / scale, atol=1e-5
    )


def test_pos_kernels_chunked_match_unchunked():
    """z-chunked deposit/gather (the 512³ memory path) must agree exactly
    with the single-chunk path."""
    import numpy as np
    from concept_tpu.bucketsim import bucketize_state
    from concept_tpu.grid.pallas_pm import (
        deposit_pallas_pos, gather_pallas_pos,
    )

    n, box = 16, 32.0
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, box, (2000, 3)).astype(np.float32))
    mom = jnp.zeros_like(pos)
    st = bucketize_state(pos, mom, n, box, capacity=24)
    w = st.valid.astype(jnp.float32) * 1.5
    args = (st.pos[0], st.pos[1], st.pos[2])
    g1 = deposit_pallas_pos(*args, w, n, box, nchunks=1, interpret=True)
    g2 = deposit_pallas_pos(*args, w, n, box, nchunks=4, interpret=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)
    assert np.isclose(float(jnp.sum(g1)), 1.5 * 2000, rtol=1e-5)
    grids = tuple(
        jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
        for _ in range(3)
    )
    v = st.valid.astype(jnp.float32)
    f1 = gather_pallas_pos(*args, v, grids, n, box, nchunks=1, interpret=True)
    f2 = gather_pallas_pos(*args, v, grids, n, box, nchunks=4, interpret=True)
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(f2[d]), np.asarray(f1[d]), atol=1e-5
        )
