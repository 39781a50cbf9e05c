"""Dense-bucket deposit/gather must match the plain paths exactly
(including capacity overflow fallback)."""

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.grid.bucketed import bucketize_blocks, deposit_bucketed, gather_bucketed
from concept_tpu.grid.interp import deposit, gather


@pytest.mark.parametrize("clustered", [False, True])
def test_bucketed_deposit_matches(clustered):
    n, box = 16, 40.0
    rng = np.random.default_rng(0)
    if clustered:
        pos = np.concatenate([
            rng.uniform(0, box, (2000, 3)),
            rng.normal(7.0, 0.4, (2000, 3)) % box,  # overflows some blocks
        ]).astype(np.float32)
    else:
        pos = rng.uniform(0, box, (4000, 3)).astype(np.float32)
    pos = jnp.asarray(pos)
    q = jnp.asarray(rng.uniform(0.5, 1.5, (pos.shape[0],)).astype(np.float32))
    bk = bucketize_blocks(pos, q, n, box, capacity=16)
    g_b = deposit_bucketed(bk, n, pos=pos, boxsize=box, q=q)
    g_p = deposit(pos, q, n, box, order=2)
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_p), atol=2e-3 * float(jnp.max(g_p))
    )
    # mass conserved incl. overflow
    assert np.isclose(float(jnp.sum(g_b)), float(jnp.sum(q)), rtol=1e-5)


@pytest.mark.parametrize("clustered", [False, True])
def test_bucketed_gather_matches(clustered):
    n, box = 16, 40.0
    rng = np.random.default_rng(1)
    if clustered:
        pos = np.concatenate([
            rng.uniform(0, box, (1500, 3)),
            rng.normal(20.0, 0.3, (1500, 3)) % box,
        ]).astype(np.float32)
    else:
        pos = rng.uniform(0, box, (3000, 3)).astype(np.float32)
    pos = jnp.asarray(pos)
    grids = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    bk = bucketize_blocks(pos, 1.0, n, box, capacity=16)
    out_b = gather_bucketed(bk, grids, n, pos=pos, boxsize=box)
    out_p = np.stack(
        [np.asarray(gather(grids[d], pos, box, order=2)) for d in range(3)],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(out_b), out_p, atol=1e-5)
