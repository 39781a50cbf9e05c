"""Per-window row-bounded pair sweep (pallas_shortrange rext/sext).

The bounded kernel must be algebraically identical to the unbounded one
(modulo f32 reassociation from the subchunked summation order) whenever
the bounds are true LAYOUT extents: every valid slot of pencil p lives
in a row < ext[p].  Reference semantics: interactions.py:1353-1984 tile
pair loop — the bounds play the role of the reference's per-tile
particle counts (its loops are naturally count-bounded; the dense
(K, C) layout needs the bounds to recover that economy).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.forces.pallas_shortrange import (
    sweep_pallas_pair, _window_bounds,
)


def _layout(rng, n, K, box):
    """Random prefix-valid (K, C) bucketed positions + per-pencil exts."""
    C = n**3
    counts = rng.integers(0, K + 1, size=C)
    valid = np.arange(K)[:, None] < counts[None, :]
    ci = (np.arange(C) // (n * n)) % n
    cj = (np.arange(C) // n) % n
    ck = np.arange(C) % n
    cw = box / n
    base = np.stack([ci * cw, cj * cw, ck * cw])
    pos = base[:, None, :] + rng.random((3, K, C)) * cw
    big = 1e4 * box
    s = [np.where(valid, pos[d], big).astype(np.float32) for d in range(3)]
    ext = counts.reshape(n * n, n).max(axis=1).astype(np.int32)
    return [jnp.asarray(a) for a in s], jnp.asarray(valid), ext, counts


def _rel(a, b):
    return (np.abs(a - b) / np.maximum(np.abs(a), 1.0)).max()


@pytest.mark.parametrize("kernel", ["plummer", "spline"])
def test_bounded_matches_unbounded_full_extents(kernel):
    rng = np.random.default_rng(3)
    n, K, box = 16, 24, 1.0
    (sx, sy, sz), v, ext, _ = _layout(rng, n, K, box)
    # cell width (box/n) > cutoff: the ±1-offset sweep is exact
    scale, cutoff, soft = 0.012, 0.054, 0.004
    ref = np.asarray(sweep_pallas_pair(
        sx, sy, sz, v, sx, sy, sz, v, n, box, scale, cutoff, soft,
        interpret=True, kernel=kernel, pack=8, sentineled=True))
    out = np.asarray(sweep_pallas_pair(
        sx, sy, sz, v, sx, sy, sz, v, n, box, scale, cutoff, soft,
        interpret=True, kernel=kernel, sentineled=True,
        rext=jnp.asarray(ext), sext=jnp.asarray(ext)))
    m = np.asarray(v)
    assert _rel(ref[:, m], out[:, m]) < 2e-3


def test_bounded_restricted_receivers_zero_beyond():
    """Receiver bounds below occupancy: rows within each window's bound
    match the unbounded sweep; rows beyond the CH-rounded bound are
    exactly zero (the kernel zero-fills, then overwrites whole chunks)."""
    rng = np.random.default_rng(5)
    n, K, box = 16, 24, 1.0
    (sx, sy, sz), v, ext, counts = _layout(rng, n, K, box)
    scale, cutoff, soft = 0.012, 0.054, 0.004
    ref = np.asarray(sweep_pallas_pair(
        sx, sy, sz, v, sx, sy, sz, v, n, box, scale, cutoff, soft,
        interpret=True, kernel="spline", pack=8, sentineled=True))
    rcounts = (rng.integers(0, K // 2, size=n**3)
               * (rng.random(n**3) < 0.3)).astype(np.int64)
    rext = rcounts.reshape(n * n, n).max(axis=1).astype(np.int32)
    out = np.asarray(sweep_pallas_pair(
        sx, sy, sz, v, sx, sy, sz, v, n, box, scale, cutoff, soft,
        interpret=True, kernel="spline", sentineled=True,
        rext=jnp.asarray(rext), sext=jnp.asarray(ext)))
    F = 8
    njb = n // F
    CH = 8 if K % 8 == 0 else 1
    wb = np.asarray(_window_bounds(jnp.asarray(rext), n, F, False))
    for w in range(n * njb):
        cols = slice(w * F * n, (w + 1) * F * n)
        b = int(min(wb[w], K))
        bc = min(-(-b // CH) * CH, K)  # chunk-rounded extent
        if b > 0:
            assert _rel(ref[:, :bc, cols], out[:, :bc, cols]) < 2e-3
        assert np.all(out[:, bc:, cols] == 0)


def test_window_bounds_neighbor_max_wraps():
    n, F = 16, 8
    njb = n // F
    ext = np.zeros((n * n,), np.int32)
    ext[0] = 7  # pencil (i=0, jp=0)
    wb = np.asarray(_window_bounds(jnp.asarray(ext), n, F, True))
    wb = wb.reshape(n, njb)
    # the occupied window (0, 0) and all 8 neighbors (wrapping) see 7
    assert wb[0, 0] == 7 and wb[1, 0] == 7 and wb[n - 1, 0] == 7
    assert wb[0, njb - 1] == 7 and wb[1, 1 % njb] == 7
    # far windows see 0
    assert wb[n // 2, 0] == 0


def test_rung_substep_bounded_pallas_matches_xla():
    """Full integration: rung_substep with the interpret-mode bounded
    pallas engine vs the XLA sweep engine — same drift+kick+assign."""
    from concept_tpu.p3mrungs import (
        bucketize_rungs, rung_substep, _pencil_occ_ext, _pencil_rung_ext,
    )

    rng = np.random.default_rng(11)
    n, box = 16, 1.0
    N = 3000
    pos = [jnp.asarray(rng.random(N).astype(np.float32) * box)
           for _ in range(3)]
    mom = [jnp.asarray((rng.random(N) - 0.5).astype(np.float32) * 1e-3)
           for _ in range(3)]
    rungs = jnp.asarray(rng.integers(0, 3, size=N).astype(np.int8))
    ids = jnp.arange(N, dtype=jnp.int32)
    kw = dict(boxsize=box, nc=n, capacity=16, NR=8)
    st1, kept = bucketize_rungs(*pos, *mom, rungs, ids, **kw)
    assert int(kept) == N
    st2, _ = bucketize_rungs(*pos, *mom, rungs, ids, **kw)
    ext_occ = _pencil_occ_ext(st1.valid, n)
    ext_rung = _pencil_rung_ext(st1.rungs, st1.valid, n, 8)
    # an interior substep with kmin = 1: rungs ≥ 1 fire, rung 0 does not
    # (matching rext = ext_rung[1] — base_step keeps kicks and receiver
    # bounds consistent the same way)
    kicks = jnp.asarray(np.array([0, 5e-5, 2e-5, 0, 0, 0, 0, 0],
                                 np.float32))
    common = dict(
        boxsize=box, nc=n, scale=jnp.float32(0.012),
        cutoff=jnp.float32(0.054), softening=jnp.float32(0.004),
        K_r=8, K_s=16, NR=8, assign=False, softening_kernel="spline",
        dt_base=jnp.float32(1.0), eps_rung=jnp.float32(0.004),
    )
    o1 = rung_substep(st1, 1.0, 1.0, jnp.float32(1e-4), kicks,
                      engine="pallas", interpret=True,
                      rext=ext_rung[1], sext=ext_occ, **common)
    o2 = rung_substep(st2, 1.0, 1.0, jnp.float32(1e-4), kicks,
                      engine="xla", **common)
    (s1, (ka1, t1, v1)), (s2, (ka2, t2, v2)) = o1, o2
    m = np.asarray(s2.valid)
    np.testing.assert_allclose(np.asarray(s1.pos)[:, m],
                               np.asarray(s2.pos)[:, m], rtol=2e-5,
                               atol=1e-7)
    # kick applies only on rows < K_r: compare those
    np.testing.assert_allclose(np.asarray(s1.mom)[:, :8][:, m[:8]],
                               np.asarray(s2.mom)[:, :8][:, m[:8]],
                               rtol=2e-4, atol=1e-8)
