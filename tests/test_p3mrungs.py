"""Production rung stepper (p3mrungs): layout invariants, force
agreement with the global persistent stepper, and the rung economics
(substep receiver rows ≪ full rows on clustered states).
Reference: main.py:1347-1443 (cadence), N_rungs=8 default."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.p3mrungs import (
    P3MRungSimulation, RungState, bucketize_rungs, rebucketize_rungs,
    extract_flat, occupancy_and_activity, rung_substep,
)

G = constants.G_Newton


def _setup(n_part=8, seed=0, clustered=False):
    """Physical cosmological mass (Ω_m-matched): an unphysically heavy
    mass makes the box collapse violently and the per-particle
    comparison chaos-limited."""
    from concept_tpu.components import particle_mass

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    box = 64 * units.Mpc
    N = n_part**3
    mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
    rng = np.random.default_rng(seed)
    if clustered:
        # half the particles in a tight blob, half uniform
        n_blob = N // 2
        blob = 0.5 * box + 0.02 * box * rng.standard_normal((n_blob, 3))
        rest = rng.uniform(0, box, (N - n_blob, 3))
        pos = np.mod(np.concatenate([blob, rest]), box).astype(np.float32)
    else:
        from concept_tpu.components import lattice_positions

        pos = np.asarray(lattice_positions(n_part, box))
        pos = np.mod(
            pos + 0.1 * (box / n_part) * rng.standard_normal(pos.shape), box
        ).astype(np.float32)
    mom = (rng.standard_normal((N, 3)) * 1e-6 * mass).astype(np.float32)
    return bg, box, pos, mom, mass


def test_bucketize_roundtrip_preserves_particles():
    bg, box, pos, mom, mass = _setup()
    N = pos.shape[0]
    sim = P3MRungSimulation(8, box, mass, G, mesh=16, bg=bg, N_rungs=4)
    st = sim.init_state(
        tuple(jnp.asarray(pos[:, d]) for d in range(3)),
        tuple(jnp.asarray(mom[:, d]) for d in range(3)),
    )
    p2, m2, ids = extract_flat(st, N)
    order = np.argsort(np.asarray(ids))
    np.testing.assert_allclose(np.asarray(p2)[order], pos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2)[order], mom, atol=1e-8)
    # rung-major column order after a rebucket
    st2, kept = rebucketize_rungs(st, box, sim.nc, sim.capacity, N, sim.NR)
    assert int(kept) == N
    r = np.asarray(st2.rungs)
    v = np.asarray(st2.valid)
    for c in range(r.shape[1]):
        col = r[v[:, c], c]
        assert np.all(np.diff(col) <= 0), "columns must be rung-descending"


def test_zero_integral_substep_is_identity():
    bg, box, pos, mom, mass = _setup()
    sim = P3MRungSimulation(8, box, mass, G, mesh=16, bg=bg, N_rungs=4)
    st = sim.init_state(
        tuple(jnp.asarray(pos[:, d]) for d in range(3)),
        tuple(jnp.asarray(mom[:, d]) for d in range(3)),
    )
    ref_pos = np.asarray(st.pos).copy()
    ref_mom = np.asarray(st.mom).copy()
    st2, _ = rung_substep(
        st, mass, G, jnp.float32(0.0), jnp.zeros((4,), jnp.float32),
        box, sim.nc, jnp.float32(sim.scale), jnp.float32(sim.cutoff),
        jnp.float32(sim.softening), K_r=st.valid.shape[0],
        interpret=True, NR=4,
    )
    np.testing.assert_allclose(np.asarray(st2.pos), ref_pos, atol=0)
    np.testing.assert_allclose(np.asarray(st2.mom), ref_mom, atol=0)


def test_rung_evolution_matches_global_stepper():
    """Short evolution: the rung stepper's positions track the global
    persistent P³M stepper within the nprocs-style tolerance."""
    from concept_tpu.p3msim import P3MSimulation

    bg, box, pos, mom, mass = _setup(n_part=8, seed=2)
    N = pos.shape[0]
    t0 = float(bg.t_of_a_np(0.05))
    t1 = float(bg.t_of_a_np(0.12))

    simg = P3MSimulation(8, box, mass, G, mesh=16, bg=bg)
    stg = simg.init_state(
        tuple(jnp.asarray(pos[:, d]) for d in range(3)),
        tuple(jnp.asarray(mom[:, d]) for d in range(3)),
    )
    stg = simg.evolve(stg, t0, t1)
    # global stepper has no ids: recover identity by re-sorting a tagged
    # copy — instead evolve the rung stepper and compare sorted P(k)-free
    # statistics: match particles via the rung stepper's ids against the
    # ORIGINAL positions evolved by the global stepper in flat order.
    simr = P3MRungSimulation(8, box, mass, G, mesh=16, bg=bg, N_rungs=4)
    str_ = simr.init_state(
        tuple(jnp.asarray(pos[:, d]) for d in range(3)),
        tuple(jnp.asarray(mom[:, d]) for d in range(3)),
    )
    str_ = simr.evolve(str_, t0, t1)
    pr, mr, ids = extract_flat(str_, N)
    pr = np.asarray(pr)[np.argsort(np.asarray(ids))]

    # the global stepper's state also lost flat order (slot layout);
    # compare as point sets via nearest-neighbour displacement
    from scipy.spatial import cKDTree

    flatg = np.asarray(stg.pos).reshape(3, -1).T
    vg = np.asarray(stg.valid).reshape(-1)
    flatg = flatg[vg]
    tree = cKDTree(flatg, boxsize=box)
    d, _ = tree.query(pr)
    assert np.mean(d) / box < 2e-3, np.mean(d) / box
    assert np.max(d) / box < 2e-2, np.max(d) / box


def test_rung_economics_on_clustered_state():
    """Clustered config: deep rungs appear and the substep receiver rows
    stay well below what full-population substeps would pay (VERDICT r2
    item 2 'clustered bench shows the rung win')."""
    bg, box, pos, mom, mass = _setup(n_part=8, seed=3, clustered=True)
    sim = P3MRungSimulation(8, box, mass * 50, G, mesh=16, bg=bg,
                            N_rungs=6)
    st = sim.init_state(
        tuple(jnp.asarray(pos[:, d]) for d in range(3)),
        tuple(jnp.asarray(mom[:, d]) for d in range(3)),
    )
    t0 = float(bg.t_of_a_np(0.1))
    t1 = float(bg.t_of_a_np(0.12))
    sim.evolve(st, t0, t1)
    assert sim.stats["max_rung"] >= 2, sim.stats
    assert sim.stats["receiver_rows"] < 0.7 * sim.stats["full_rows"], sim.stats
