"""Pallas short-range pencil kernel vs the XLA sweep (interpret mode)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from concept_tpu.forces.shortrange import (
    bucketize, _sweep, shortrange_momentum_updates,
)
from concept_tpu.forces.pallas_shortrange import sweep_pallas, screening_cheb

BOX = 100.0


def test_screening_chebyshev_accuracy():
    x = np.linspace(0, 4.5, 2000).astype(np.float32)
    exact = np.array(
        [math.erfc(0.5 * xi) + xi / math.sqrt(math.pi) * math.exp(-xi * xi / 4)
         for xi in x]
    )
    fit = np.asarray(screening_cheb(jnp.asarray(x)))
    assert np.abs(fit - exact).max() < 3e-6


def test_sweep_pallas_matches_xla():
    rng = np.random.default_rng(2)
    N, nc, K = 600, 5, 16
    pos = jnp.asarray(rng.uniform(0, BOX, (N, 3)).astype(np.float32))
    scale, cutoff = 4.0, 18.0
    b = bucketize(pos, BOX, nc, K)
    args = (b["hx"], b["hy"], b["hz"], b["valid"], nc, jnp.float32(BOX),
            jnp.float32(scale))
    acc_x = _sweep(*args, jnp.float32(cutoff**2), jnp.float32(0.0), halve=True)
    acc_p = sweep_pallas(*args, jnp.float32(cutoff), jnp.float32(0.0),
                         interpret=True)
    v = np.asarray(b["valid"])
    ax = np.asarray(acc_x)[:, v]
    ap = np.asarray(acc_p)[:, v]
    assert np.abs(ap - ax).max() / np.abs(ax).max() < 1e-5


def test_sweep_pallas_softened_clustered():
    """Clustered blobs + softening: engines agree (pallas exercises the
    sentinel-mask and z-wrap paths under heavy occupancy contrast)."""
    rng = np.random.default_rng(9)
    blob = rng.normal(50, 2.0, (300, 3))
    edge = rng.uniform(0, 10, (100, 3))  # near the wrap
    pos = jnp.asarray(np.mod(np.concatenate([blob, edge]), BOX).astype(np.float32))
    nc, K = 5, 64
    scale, cutoff = 4.0, 18.0
    soft = 0.5
    b = bucketize(pos, BOX, nc, K)
    args = (b["hx"], b["hy"], b["hz"], b["valid"], nc, jnp.float32(BOX),
            jnp.float32(scale))
    acc_x = _sweep(*args, jnp.float32(cutoff**2), jnp.float32(soft**2),
                   halve=True)
    acc_p = sweep_pallas(*args, jnp.float32(cutoff), jnp.float32(soft),
                         interpret=True)
    v = np.asarray(b["valid"])
    ax = np.asarray(acc_x)[:, v]
    ap = np.asarray(acc_p)[:, v]
    assert np.abs(ap - ax).max() / np.abs(ax).max() < 1e-5


def test_momentum_updates_engine_equivalence():
    """The full entry point agrees between engines (incl. write-back and
    the straggler path on top of the pallas sweep)."""
    rng = np.random.default_rng(11)
    N = 500
    pos = jnp.asarray(rng.uniform(0, BOX, (N, 3)).astype(np.float32))
    kw = dict(n_cells=5, capacity=8, G=2.0, max_overflow=256)
    a = shortrange_momentum_updates(pos, 1.5, BOX, 4.0, 18.0, 0.7,
                                    engine="xla", **kw)
    b = shortrange_momentum_updates(pos, 1.5, BOX, 4.0, 18.0, 0.7,
                                    engine="pallas", **kw)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-5


def test_sweep_pair_one_sided_subset():
    """One-sided subset force (the rung-subcycling kernel) equals the
    rows of a direct all-pairs computation, across both engines."""
    from concept_tpu.forces.shortrange import (
        shortrange_momentum_updates_on_subset, shortrange_force_factor,
    )

    rng = np.random.default_rng(4)
    N, M = 400, 96
    pos = jnp.asarray(rng.uniform(0, BOX, (N, 3)).astype(np.float32))
    recv = pos[N - M:]
    scale, cutoff = 4.0, 18.0
    # direct reference: force on recv rows from ALL particles
    p = np.asarray(pos, np.float64)
    r = p[N - M:]
    dx = r[:, None, :] - p[None, :, :]
    dx -= BOX * np.round(dx / BOX)
    r2 = (dx**2).sum(-1)
    mask = (r2 > 0) & (r2 < cutoff**2)
    f = np.where(mask, np.asarray(shortrange_force_factor(
        jnp.asarray(r2, jnp.float32), scale, 0.0, jnp.float32), np.float64), 0.0)
    ref = 2.0 * 1.5**2 * (f[..., None] * dx).sum(1)  # G·m²·acc
    for engine in ("xla", "pallas"):
        got = np.asarray(shortrange_momentum_updates_on_subset(
            recv, pos, 1.5, BOX, scale, cutoff, n_cells=5,
            capacity_recv=32, capacity_sup=32, G=2.0, engine=engine,
        ))
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 2e-5, (engine, err)


def test_lane_packed_sweep_matches_unpacked():
    """Lane-packed kernel (pack=2: two cj-pencils per program, full-width
    lanes) matches the unpacked path to reduction-reassociation level
    (same arithmetic; the compiler may retree the supplier-axis sums at
    different vector widths — observed ≤ 1 ulp on CPU interpret mode).
    Determinism is unaffected: _auto_pack picks the factor statically
    per shape."""
    import numpy as np
    import jax.numpy as jnp
    from concept_tpu.forces.pallas_shortrange import sweep_pallas_pair

    rng = np.random.default_rng(5)
    n, K = 4, 8
    C = n**3
    box = 16.0
    pos = rng.uniform(0, box, (3, K, C)).astype(np.float32)
    valid = rng.uniform(size=(K, C)) < 0.7
    args = [jnp.asarray(pos[d].reshape(K, C)) for d in range(3)]
    v = jnp.asarray(valid)
    common = dict(n_cells=n, boxsize=jnp.float32(box),
                  scale=jnp.float32(1.0), cutoff=jnp.float32(4.4),
                  softening=jnp.float32(0.05), interpret=True,
                  kernel="spline")
    a1 = sweep_pallas_pair(*args, v, *args, v, pack=1, **common)
    a2 = sweep_pallas_pair(*args, v, *args, v, pack=2, **common)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-6, atol=1e-12)
