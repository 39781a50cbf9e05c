"""Component-pair gravity (VERDICT r2 item 4): P³M acting between
DISTINCT particle components — cross-component short range + screened
shared long range — must reproduce the combined-set PP-Ewald force.
Reference: component_component/domain_domain pairing,
interactions.py:122-615."""

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.sim import SimConfig
from concept_tpu.sim_multi import MultiSimulation, MultiState
from concept_tpu.components import ComponentSpec, ParticleState

G = constants.G_Newton


def _setup_two_components(seed=0):
    box = 32 * units.Mpc
    rng = np.random.default_rng(seed)
    N_a, N_b = 96, 64
    pos_a = rng.uniform(0, box, (N_a, 3)).astype(np.float32)
    pos_b = rng.uniform(0, box, (N_b, 3)).astype(np.float32)
    # a close cross-component pair so the SR term matters
    pos_b[0] = pos_a[0] + np.asarray([0.3, 0.1, 0.0]) * units.Mpc
    m_a, m_b = 2.0e4, 5.0e4
    return box, pos_a, pos_b, m_a, m_b


def test_two_component_p3m_matches_combined_pp():
    from concept_tpu.forces.pp import pp_momentum_updates, make_ewald_table

    box, pos_a, pos_b, m_a, m_b = _setup_two_components()
    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    mesh = 32
    spec_a = ComponentSpec(name="compA", species="matter", N=pos_a.shape[0],
                           mass=m_a, forces=(("gravity", "p3m"),))
    spec_b = ComponentSpec(name="compB", species="matter", N=pos_b.shape[0],
                           mass=m_b, forces=(("gravity", "p3m"),))
    cfg = SimConfig(boxsize=box, potential_gridsize=mesh, G=G,
                    interpolation_order=3)
    sim = MultiSimulation([spec_a, spec_b], [], cfg, bg)
    assert sim.p3m_names == ["compA", "compB"]
    state = MultiState(
        particles={
            "compA": ParticleState(pos=jnp.asarray(pos_a),
                                   mom=jnp.zeros_like(jnp.asarray(pos_a))),
            "compB": ParticleState(pos=jnp.asarray(pos_b),
                                   mom=jnp.zeros_like(jnp.asarray(pos_b))),
        },
        fluids={},
    )
    sim._refresh_sr_capacities(state)
    int_kick = 1.0
    a = jnp.float32(1.0)
    kicked = sim._kick(state, jnp.float32(int_kick), a, {}, {})
    dm_a = np.asarray(kicked.particles["compA"].mom)
    dm_b = np.asarray(kicked.particles["compB"].mom)

    # oracle: brute-force PP-Ewald on the combined set with TRUE
    # per-particle masses (minimum image + tabulated periodic correction)
    from concept_tpu.forces.ewald import ewald_correction_lookup

    table = make_ewald_table(32)
    pos_all = np.concatenate([pos_a, pos_b]).astype(np.float64)
    N_a = pos_a.shape[0]
    m_all = np.concatenate([
        np.full(N_a, m_a), np.full(pos_b.shape[0], m_b)
    ])
    dx = pos_all[:, None, :] - pos_all[None, :, :]
    dx -= box * np.round(dx / box)
    r2 = (dx**2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    acc = -(dx / r2[..., None] ** 1.5 * m_all[None, :, None]).sum(1)
    corr = np.array(ewald_correction_lookup(
        table, jnp.asarray(dx / box, jnp.float32)
    ))
    np.einsum("iid->id", corr)[...] = 0.0
    acc += (corr * m_all[None, :, None]).sum(1) / box**2
    dm_ref = G * m_all[:, None] * acc * int_kick

    ref = np.max(np.abs(dm_ref))
    err_a = np.max(np.abs(dm_a - dm_ref[:N_a])) / ref
    err_b = np.max(np.abs(dm_b - dm_ref[N_a:])) / ref
    # P³M vs PP: split-scale truncation + CIC/mesh errors; the reference
    # holds trajectories to 1.2e-2 — single-force agreement is ~1e-2
    assert err_a < 2e-2, err_a
    assert err_b < 2e-2, err_b
    # Newton's 3rd law across components: total momentum conserved
    total = dm_a.sum(0) * 1.0 + dm_b.sum(0)
    assert np.max(np.abs(total)) / ref < 2e-2


def test_lapse_interaction_applies():
    """A decaying fluid + a 'lapse' supplier: the lapse kick changes the
    decaying component's J and leaves others untouched (reference
    interactions.py:2963-3037)."""
    box = 32 * units.Mpc
    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    n = 8
    from concept_tpu.components import FluidState

    dcdm = ComponentSpec(name="dcdm", species="decaying cold dark matter",
                         representation="fluid", gridsize=n, w=0.0,
                         boltzmann_order=1, decay_rate=0.1 / units.Gyr)
    lapse = ComponentSpec(name="lapse", species="lapse",
                          representation="fluid", gridsize=n, w=0.0,
                          boltzmann_order=0)
    cfg = SimConfig(boxsize=box, potential_gridsize=n)
    sim = MultiSimulation([], [dcdm, lapse], cfg, bg)
    assert sim.lapse_supplier == "lapse"
    rng = np.random.default_rng(0)
    rho_d = jnp.asarray(1.0 + 0.1 * rng.standard_normal((n, n, n)),
                        jnp.float32)
    rho_l = jnp.asarray(0.5 + 0.2 * rng.standard_normal((n, n, n)),
                        jnp.float32)
    st = MultiState(
        particles={},
        fluids={
            "dcdm": FluidState(varrho=rho_d,
                               J=jnp.zeros((3, n, n, n), jnp.float32),
                               P=None),
            "lapse": FluidState(varrho=rho_l, J=None, P=None),
        },
    )
    weff = {"dcdm": jnp.float32(0.0), "lapse": jnp.float32(0.0)}
    w = {"dcdm": jnp.float32(0.0), "lapse": jnp.float32(0.0)}
    a = jnp.float32(0.5)
    no_lapse = sim._kick(st, jnp.float32(0.0), a, weff, w, lapse_ints=None)
    with_lapse = sim._kick(
        st, jnp.float32(0.0), a, weff, w,
        lapse_ints={"dcdm": jnp.float32(0.3)},
    )
    J0 = np.asarray(no_lapse.fluids["dcdm"].J)
    J1 = np.asarray(with_lapse.fluids["dcdm"].J)
    assert not np.allclose(J0, J1)  # the lapse kick acted
    assert np.allclose(J0, 0.0, atol=1e-6)  # zero gravity integral
    # lapse integrals scale linearly (pure kick term)
    with_lapse2 = sim._kick(
        st, jnp.float32(0.0), a, weff, w,
        lapse_ints={"dcdm": jnp.float32(0.6)},
    )
    J2 = np.asarray(with_lapse2.fluids["dcdm"].J)
    np.testing.assert_allclose(J2, 2 * J1, rtol=1e-5, atol=1e-8)

    # and the host-side integral machinery produces nonzero integrals
    sim.eos["dcdm"] = sim.eos["dcdm"]
    li = sim.lapse_step_scalars(float(bg.t_of_a_np(0.3)),
                                float(bg.t_of_a_np(0.31)))
    assert "dcdm" in li and float(li["dcdm"]) > 0
