"""Unified 4-mesh-cell P³M layout vs the tight-cell legacy layout.

The unified layout (cells = 4 mesh cells = 2×2×2 deposit blocks, sweep
reach 2 with gap-pruned offsets — p3mrungs/pm_gradient_cells) computes
the SAME physics as the legacy tight-cell layout (cells ≥ cutoff, ±1
offsets): identical P³M split, pair force law, and PM pipeline.  Only
the cell partition (and hence FP summation order) differs, so early
trajectories must agree to float accuracy well below any physical
tolerance."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import particle_mass
from concept_tpu.p3mrungs import P3MRungSimulation, extract_flat
from concept_tpu.forces.pallas_shortrange import kept_offsets


def test_kept_offsets_coverage():
    """Every pair within cutoff + 2·margin is covered by a kept offset;
    pruned offsets can never hold such a pair."""
    cw, cutoff, margin = 4.0, 5.625, 0.55
    offs = set(kept_offsets(cw, cutoff, margin, reach=2))
    assert (0, 0, 0) in offs
    assert len(offs) == 117  # 5³ minus the 8 corners
    # symmetric set (Newton pairs both directions)
    assert all((-i, -j, -k) in offs for (i, j, k) in offs)
    for (i, j, k) in {(2, 2, 2), (-2, 2, -2)}:
        assert (i, j, k) not in offs
        gap = cw * math.sqrt(sum(max(abs(d) - 1, 0) ** 2 for d in (i, j, k)))
        assert gap > cutoff + 2 * margin


def test_pallas_reach_matches_xla_reach():
    """sweep_pallas_pair_reach (interpret) vs the XLA reach _sweep_pair:
    same offsets, same force law — per-slot accelerations must agree."""
    import jax.numpy as jnp
    from concept_tpu.forces.pallas_shortrange import (
        sweep_pallas_pair_reach, kept_offsets as _ko,
    )
    from concept_tpu.forces.shortrange import _sweep_pair

    nc, box = 6, 24.0
    cw = box / nc
    cutoff = (4.5 * 1.25 / 4.0) * cw
    margin = 0.55 * cw / 4.0
    K = 8
    C = nc**3
    rng = np.random.default_rng(2)
    occ = 3
    h = np.zeros((3, K, C), np.float32)
    valid = np.zeros((K, C), bool)
    cs = np.arange(C)
    zc, yc, xc = cs % nc, (cs // nc) % nc, cs // (nc * nc)
    for k in range(occ):
        h[0, k] = (xc + rng.random(C)) * cw
        h[1, k] = (yc + rng.random(C)) * cw
        h[2, k] = (zc + rng.random(C)) * cw
        valid[k] = True
    hx, hy, hz = (jnp.asarray(h[d]) for d in range(3))
    v = jnp.asarray(valid)
    soft = 0.05 * cw
    scale = 1.25 * cw / 4.0  # the P3M split scale (cutoff = 4.5*scale)
    acc_p = sweep_pallas_pair_reach(
        hx, hy, hz, v, hx, hy, hz, v, nc,
        jnp.asarray(box, jnp.float32), jnp.asarray(scale, jnp.float32),
        jnp.asarray(cutoff, jnp.float32), jnp.asarray(soft, jnp.float32),
        cell_width=cw, margin=margin, reach=2, interpret=True,
    )
    offs = _ko(cw, cutoff, margin, 2)
    acc_x = _sweep_pair(
        hx, hy, hz, v, hx, hy, hz, v, nc,
        jnp.asarray(box, jnp.float32), jnp.asarray(scale, jnp.float32),
        jnp.asarray(cutoff, jnp.float32) ** 2,
        jnp.asarray(soft, jnp.float32) ** 2, offsets_ext=offs,
    )
    ap, ax = np.asarray(acc_p), np.asarray(acc_x)
    # normalized max error (the established pallas-vs-XLA sweep metric,
    # tests/test_pallas_shortrange.py): absorbs the Chebyshev-screening
    # fit and summation-order differences
    assert np.abs(ap - ax).max() / np.abs(ax).max() < 1e-4


@pytest.fixture(scope="module")
def setup():
    h = 0.70
    H0 = 70 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.30)
    box = 8 * units.Mpc / h
    G = constants.G_Newton
    N = 8**3
    mass = particle_mass(0.30, bg.rho_crit_of(G), box, N)
    rng = np.random.default_rng(5)
    lin = (np.arange(8, dtype=np.float32) + 0.5) * (box / 8)
    pos = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    pos = np.mod(
        pos + 0.2 * (box / 8) * rng.standard_normal(pos.shape).astype(np.float32),
        box,
    ).astype(np.float32)
    mom = np.zeros((N, 3), np.float32)
    return dict(bg=bg, box=box, G=G, N=N, mass=mass, pos=pos, mom=mom)


def _evolve(s, unified, a_end=0.05, cb=None):
    sim = P3MRungSimulation(
        8, s["box"], s["mass"], s["G"], mesh=32, bg=s["bg"], N_rungs=4,
        softening=0.03 * s["box"] / 8, softening_kernel="spline",
        unified=unified, unified_cb=cb,
    )
    assert sim.unified == unified
    st = sim.init_state(
        tuple(jnp.asarray(s["pos"][:, d]) for d in range(3)),
        tuple(jnp.asarray(s["mom"][:, d]) for d in range(3)),
    )
    bg = s["bg"]
    st = sim.evolve(st, float(bg.t_of_a_np(0.02)), float(bg.t_of_a_np(a_end)))
    p, m, ids = extract_flat(st, s["N"])
    o = np.argsort(np.asarray(ids))
    return np.asarray(p)[o], np.asarray(m)[o]


@pytest.mark.parametrize("cb", [4, 8])
def test_unified_matches_legacy_layout(setup, cb):
    s = setup
    p_u, m_u = _evolve(s, unified=True, cb=cb)
    p_l, m_l = _evolve(s, unified=False)
    dx = p_u - p_l
    dx -= s["box"] * np.round(dx / s["box"])
    mean_disp = np.mean(np.sqrt((dx**2).sum(1))) / s["box"]
    # same force law, different summation order: far below physical tols
    assert mean_disp < 2e-4, (cb, mean_disp)
