"""Direct cell-layout Pallas deposit/gather (grid/pallas_cells.py) vs
the exact scatter/gather interpolation path (grid/interp.py) — the
unified-layout kernels must reproduce CIC deposit and force gather
bitwise-closely from the short-range (K, C) slot layout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concept_tpu.grid.interp import deposit, gather
from concept_tpu.grid.pallas_cells import (
    LANES, deposit_pallas_cells, gather_pallas_cells,
)

CB = 4


def _layout(pos, n, box, nc, K):
    """Bucket positions into the (K, C) slot layout (x-major cell ids,
    z fastest — forces/shortrange.bucketize convention)."""
    N = pos.shape[0]
    cw = box / nc
    ijk = np.clip((pos / cw).astype(np.int64), 0, nc - 1)
    cell = (ijk[:, 0] * nc + ijk[:, 1]) * nc + ijk[:, 2]
    order = np.argsort(cell, kind="stable")
    C = nc**3
    px = np.zeros((K, C), np.float32)
    py = np.zeros((K, C), np.float32)
    pz = np.zeros((K, C), np.float32)
    w = np.zeros((K, C), np.float32)
    rank = np.zeros(C, np.int64)
    for i in order:
        c = cell[i]
        r = rank[c]
        assert r < K, "test capacity too small"
        px[r, c], py[r, c], pz[r, c] = pos[i]
        w[r, c] = 1.0
        rank[c] += 1
    Cp = ((C + LANES - 1) // LANES) * LANES
    pad = ((0, 0), (0, Cp - C))
    return (np.pad(px, pad), np.pad(py, pad), np.pad(pz, pad),
            np.pad(w, pad))


@pytest.mark.parametrize("n,nchunks", [(16, 1), (32, 2)])
def test_deposit_matches_exact(n, nchunks):
    box = 2.0
    nc = n // CB
    rng = np.random.default_rng(3)
    N = 4 * nc**3
    pos = rng.uniform(0, box, (N, 3)).astype(np.float32)
    K = 4 * CB**3 // 4  # ample
    px, py, pz, w = _layout(pos, n, box, nc, K)
    mass = 1.7
    grid_k = deposit_pallas_cells(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        jnp.asarray(w) * mass, n, box, cb=CB, nchunks=nchunks,
        interpret=True,
    )
    grid_ref = deposit(jnp.asarray(pos), mass, n, box, order=2)
    np.testing.assert_allclose(
        np.asarray(grid_k), np.asarray(grid_ref), rtol=2e-5, atol=1e-5
    )


@pytest.mark.parametrize("n,nchunks", [(16, 1), (32, 2)])
def test_gather_matches_exact(n, nchunks):
    box = 3.0
    nc = n // CB
    rng = np.random.default_rng(7)
    N = 3 * nc**3
    pos = rng.uniform(0, box, (N, 3)).astype(np.float32)
    K = 4 * CB**3 // 4
    px, py, pz, w = _layout(pos, n, box, nc, K)
    grids = tuple(
        jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
        for _ in range(3)
    )
    outs = gather_pallas_cells(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), jnp.asarray(w),
        grids, n, box, cb=CB, nchunks=nchunks, interpret=True,
    )
    # reference values at each valid slot
    for d in range(3):
        ref = np.asarray(gather(grids[d], jnp.asarray(pos), box, order=2))
        got = np.asarray(outs[d])
        # map each particle back to its slot
        cw = box / nc
        ijk = np.clip((pos / cw).astype(np.int64), 0, nc - 1)
        cell = (ijk[:, 0] * nc + ijk[:, 1]) * nc + ijk[:, 2]
        rank = {}
        for i in range(N):
            c = int(cell[i])
            r = rank.get(c, 0)
            rank[c] = r + 1
            np.testing.assert_allclose(
                got[r, c], ref[i], rtol=2e-5, atol=1e-5,
                err_msg=f"d={d} particle {i}",
            )
        else:
            continue


def test_adjointness():
    """gather is the exact adjoint of deposit: ⟨G, D(q)⟩ = ⟨g(G), q⟩."""
    n, box = 16, 1.0
    nc = n // CB
    rng = np.random.default_rng(11)
    N = 2 * nc**3
    pos = rng.uniform(0, box, (N, 3)).astype(np.float32)
    K = CB**3
    px, py, pz, w = _layout(pos, n, box, nc, K)
    q = rng.standard_normal(w.shape).astype(np.float32) * (w > 0)
    G = rng.standard_normal((n, n, n)).astype(np.float32)
    args = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz))
    D = deposit_pallas_cells(*args, jnp.asarray(q), n, box, cb=CB,
                             interpret=True)
    g = gather_pallas_cells(*args, jnp.asarray(w), jnp.asarray(G), n, box,
                            cb=CB, interpret=True)
    lhs = float(jnp.vdot(jnp.asarray(G), D))
    rhs = float(jnp.vdot(g, jnp.asarray(q)))
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))


def test_pm_gradient_cells_seq_matches_batched():
    """The 512³-class memory plan (one gradient component at a time —
    p3msim.pm_gradient_cells seq_grads) is bit-compatible with the
    batched 3-component path up to FFT batching differences."""
    from concept_tpu.p3msim import pm_gradient_cells

    rng = np.random.default_rng(3)
    n_mesh, cb = 16, CB
    nc = n_mesh // cb
    K = 16
    box = 32.0
    N = 200
    pos = rng.uniform(0, box, (N, 3)).astype(np.float32)
    px, py, pz, w = _layout(pos, n_mesh, box, nc, K)
    C = nc**3  # _layout pads columns to a LANES multiple; trim back
    pos3 = jnp.stack([jnp.asarray(px[:, :C]), jnp.asarray(py[:, :C]),
                      jnp.asarray(pz[:, :C])])
    valid = jnp.asarray(w[:, :C] > 0)
    args = (pos3, valid, 2.0, 1.0, jnp.float32(1.25 * box / n_mesh),
            box, n_mesh)
    fd_b, _, ms_b = pm_gradient_cells(*args, cb=cb, interpret=True,
                                      seq_grads=False)
    fd_s, _, ms_s = pm_gradient_cells(*args, cb=cb, interpret=True,
                                      seq_grads=True)
    assert float(ms_b) == float(ms_s)
    np.testing.assert_allclose(np.asarray(fd_s), np.asarray(fd_b),
                               rtol=1e-5, atol=1e-7)
