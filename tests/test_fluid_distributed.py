"""Fluids on an explicit device mesh: the multi-component (particles +
fluid) step sharded over 8 devices must agree with the single-device
step — the fluid analogue of test_distributed.py (reference fluids are
fully domain-decomposed over MPI domains with explicit ghost
communication, fluid.py:103-723 + communicate_ghosts
communication.py:563; here the KT/MacCormack jnp.roll stencils and the
shared PM FFT ride GSPMD-inserted collectives over the mesh)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.components import ComponentSpec, FluidState, ParticleState
from concept_tpu.sim import SimConfig
from concept_tpu.grid.fft import GridDistribution
from concept_tpu.sim_multi import (
    MultiSimulation, MultiState, shard_multi_state,
)

H0 = 67 * units.km / (units.s * units.Mpc)
OM = 0.319
BOX = 1024 * units.Mpc
NG = 16


def _make_state(bg, rho_mean, with_particles=True, with_sigma=False,
                seed=0):
    rng = np.random.default_rng(seed)
    # smooth random fluid: a few long-wavelength modes, small amplitude
    x = (np.arange(NG) + 0.5) * BOX / NG
    kx = 2 * math.pi * 2 / BOX
    ky = 2 * math.pi * 1 / BOX
    delta = (
        0.01 * np.cos(kx * x)[:, None, None]
        + 0.008 * np.sin(ky * x)[None, :, None]
    ) * np.ones((NG, NG, NG))
    varrho = rho_mean * (1 + delta)
    J = 0.002 * rho_mean * rng.standard_normal((3, NG, NG, NG))
    fl = FluidState(
        varrho=jnp.asarray(varrho, jnp.float32),
        J=jnp.asarray(J, jnp.float32),
        P=jnp.zeros((NG, NG, NG), jnp.float32),
        sigma=(jnp.asarray(
            1e-4 * rho_mean * rng.standard_normal((6, NG, NG, NG)),
            jnp.float32) if with_sigma else None),
    )
    particles = {}
    if with_particles:
        NGp = 8
        N = NGp**3
        lin = (np.arange(NGp) + 0.5) * BOX / NGp
        grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"),
                        axis=-1).reshape(-1, 3)
        pos = (grid + rng.normal(0, 0.05 * BOX / NGp, (N, 3))) % BOX
        particles["cdm"] = ParticleState(
            pos=jnp.asarray(pos, jnp.float32),
            mom=jnp.zeros((N, 3), jnp.float32),
        )
    return MultiState(particles=particles,
                      fluids={"dust": fl})


@pytest.fixture(scope="module")
def setup():
    bg = Background(H0=H0, Omega_m=OM)
    G = constants.G_Newton
    rho_crit = bg.rho_crit_of(G)
    rho_mean = OM * rho_crit
    NGp = 8
    N = NGp**3
    pspec = ComponentSpec(name="cdm", species="matter", N=N,
                          mass=0.5 * rho_mean * BOX**3 / N)
    fspec = ComponentSpec(
        name="dust", species="matter", representation="fluid",
        gridsize=NG, w=0.0, boltzmann_order=1,
    )
    config = SimConfig(boxsize=BOX, potential_gridsize=NG, G=G)
    sim = MultiSimulation([pspec], [fspec], config, bg,
                          light_speed=constants.light_speed)
    return bg, sim, rho_mean


def _dist8():
    devices = np.array(jax.devices()[:8])
    return GridDistribution(mesh=Mesh(devices, ("x",)), axis="x")


def test_fluid_step_distributed_matches_single(setup):
    bg, sim, rho_mean = setup
    state = _make_state(bg, rho_mean)
    dist = _dist8()
    state_d = shard_multi_state(jax.tree.map(jnp.copy, state), dist)
    # one coupled particle+fluid PM step with real integrals
    a0 = 0.05
    t0 = float(bg.t_of_a_np(a0))
    out_s, _ = sim.evolve(jax.tree.map(jnp.copy, state), a0, 0.06,
                          max_steps=50)
    # evolve mutates no host state that differs per sharding: same
    # scalars, same step chain — only the array placement differs
    out_d, _ = sim.evolve(state_d, a0, 0.06, max_steps=50)
    f_s = out_s.fluids["dust"]
    f_d = out_d.fluids["dust"]
    scale = float(jnp.max(jnp.abs(f_s.varrho)))
    np.testing.assert_allclose(
        np.asarray(f_d.varrho) / scale, np.asarray(f_s.varrho) / scale,
        atol=2e-6)
    jscale = float(jnp.max(jnp.abs(f_s.J))) or 1.0
    np.testing.assert_allclose(
        np.asarray(f_d.J) / jscale, np.asarray(f_s.J) / jscale, atol=2e-5)
    p_s, p_d = out_s.particles["cdm"], out_d.particles["cdm"]
    np.testing.assert_allclose(
        np.asarray(p_d.pos) / BOX, np.asarray(p_s.pos) / BOX, atol=1e-5)


def test_fluid_sigma_sharding_roundtrip(setup):
    """boltzmann_order-2 grids (P, packed 6-component ς) shard without
    error and survive the placement unchanged."""
    bg, sim, rho_mean = setup
    state = _make_state(bg, rho_mean, with_particles=False,
                        with_sigma=True)
    dist = _dist8()
    state_d = shard_multi_state(state, dist)
    fl, fl_d = state.fluids["dust"], state_d.fluids["dust"]
    for a, b in ((fl.varrho, fl_d.varrho), (fl.J, fl_d.J),
                 (fl.P, fl_d.P), (fl.sigma, fl_d.sigma)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # grids are actually distributed (leading spatial axis split 8-ways)
    shards = state_d.fluids["dust"].varrho.sharding
    assert len(shards.device_set) == 8
