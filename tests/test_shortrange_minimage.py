"""Minimum-image correctness of the short-range sweep at n_cells < 3
(ADVICE r2: the reduced-offset paths applied only one-sided cell-level
box shifts, so a pair whose near image crosses a box face was seen by
only one partner — wrong and momentum-non-conserving forces).

Brute-force reference: all-pairs periodic minimum image with the same
screened force law.
"""

import numpy as np
import jax.numpy as jnp

from concept_tpu.forces.shortrange import (
    shortrange_momentum_updates,
    shortrange_momentum_updates_on_subset,
    shortrange_force_factor,
)


def brute_force(pos, box, scale, cutoff, soft=0.0):
    pos = np.asarray(pos, np.float64)
    N = len(pos)
    acc = np.zeros((N, 3))
    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            d = pos[i] - pos[j]
            d -= box * np.round(d / box)
            r2 = float(d @ d)
            if r2 >= cutoff**2 or r2 == 0:
                continue
            f = float(
                shortrange_force_factor(
                    jnp.asarray(r2, jnp.float64), scale, soft**2, jnp.float64
                )
            )
            acc[i] += f * d
    return acc


def _random_pos(n, box, seed):
    rng = np.random.default_rng(seed)
    # cluster some points near box faces so wraps matter
    pos = rng.uniform(0, box, (n, 3))
    pos[: n // 3] = np.mod(pos[: n // 3] * 0.1 - 0.05 * box, box)
    return pos.astype(np.float32)


def _check(n_cells_expected, cutoff_frac, n=24, seed=0):
    box = 1.0
    cutoff = cutoff_frac * box
    scale = cutoff / 4.5
    pos = _random_pos(n, box, seed)
    m, kick = 2.0, 0.3
    G = 1.0
    dmom = np.asarray(
        shortrange_momentum_updates(
            jnp.asarray(pos), m, box, scale, cutoff, kick,
            n_cells=n_cells_expected, capacity=8 * ((n + 7) // 8),
            G=G, engine="xla",
        )
    )
    expected = G * m * m * kick * brute_force(pos, box, scale, cutoff)
    ref = np.max(np.abs(expected)) + 1e-30
    np.testing.assert_allclose(dmom / ref, expected / ref, atol=5e-5)
    # momentum conservation (Newton's 3rd law incl. wrapped images)
    assert np.max(np.abs(dmom.sum(0))) / ref < 5e-5


def test_sweep_min_image_one_cell():
    _check(1, 0.6)


def test_sweep_min_image_two_cells():
    _check(2, 0.45)


def test_sweep_min_image_two_cells_face_pair():
    """The ADVICE example: x = 0.05 and 0.95 — both partners must see the
    wrapped pair, symmetrically."""
    box = 1.0
    cutoff = 0.45
    scale = cutoff / 4.5
    pos = np.asarray(
        [[0.05, 0.3, 0.3], [0.95, 0.3, 0.3]], np.float32
    )
    dmom = np.asarray(
        shortrange_momentum_updates(
            jnp.asarray(pos), 1.0, box, scale, cutoff, 1.0,
            n_cells=2, capacity=8, engine="xla",
        )
    )
    assert abs(dmom[0, 0]) > 0  # pair separation 0.1 < cutoff: force exists
    np.testing.assert_allclose(dmom[0], -dmom[1], rtol=1e-5)


def test_pair_sweep_min_image_two_cells():
    """One-sided receiver/supplier sweep (the rung kernel) at n_cells = 2."""
    box = 1.0
    cutoff = 0.45
    scale = cutoff / 4.5
    pos = _random_pos(20, box, 3)
    recv = pos[:7]
    dmom = np.asarray(
        shortrange_momentum_updates_on_subset(
            jnp.asarray(recv), jnp.asarray(pos), 1.5, box, scale, cutoff,
            n_cells=2, capacity_recv=8, capacity_sup=24, engine="xla",
        )
    )
    full = brute_force(pos, box, scale, cutoff)
    expected = 1.5 * 1.5 * full[:7]
    ref = np.max(np.abs(expected)) + 1e-30
    np.testing.assert_allclose(dmom / ref, expected / ref, atol=5e-5)
