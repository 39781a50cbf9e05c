"""Every parsed parameter changes behavior (VERDICT r2 item 6):
fluid_scheme_select dispatches MacCormack, select_softening_length /
softening_kernel reach the force kernels.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units


def test_maccormack_rigid_advection():
    """maccormack_step advects a bump rigidly (sanity of the scheme that
    fluid_scheme_select now dispatches; reference fluid.py:724)."""
    from concept_tpu.fluid import maccormack_step

    N, BOX = 64, 1.0
    DX = BOX / N
    x = (np.arange(N) + 0.5) * DX
    prof = 1.0 + 0.5 * np.exp(
        -(((x - 0.5 + BOX / 2) % BOX) - BOX / 2) ** 2 / (2 * 0.1**2)
    )
    rho = jnp.asarray(
        np.broadcast_to(prof[:, None, None], (N, N, N)).copy(), jnp.float32
    )
    u = 0.25
    J = jnp.stack([rho * u, jnp.zeros_like(rho), jnp.zeros_like(rho)])
    P = jnp.zeros_like(rho)
    t_total, n_steps = 0.2, 80
    dt = t_total / n_steps
    for i in range(n_steps):
        rho, J, P = maccormack_step(rho, J, P, dt, 1.0, 1.0, BOX, 0.0,
                                    step_parity=i & 1)
    prof2 = 1.0 + 0.5 * np.exp(
        -(((x - 0.5 - u * t_total + BOX / 2) % BOX) - BOX / 2) ** 2
        / (2 * 0.1**2)
    )
    got = np.asarray(rho)[:, N // 2, N // 2]
    err = np.max(np.abs(got - prof2)) / 0.5
    assert err < 0.12, err
    # conservation (f32 summation over 256k cells)
    assert np.isclose(float(jnp.sum(rho)), float(np.sum(prof)) * N * N,
                      rtol=1e-4)


def test_fluid_scheme_select_dispatches():
    """MultiSimulation must route per-component schemes from
    fluid_scheme_select (previously parsed-and-ignored)."""
    from concept_tpu.sim_multi import MultiSimulation
    from concept_tpu.sim import SimConfig
    from concept_tpu.components import ComponentSpec
    from concept_tpu.cosmology.background import Background

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.3)
    f1 = ComponentSpec(name="fluidA", species="dark energy", gridsize=8,
                       representation="fluid", w=0.0, boltzmann_order=1)
    f2 = ComponentSpec(name="fluidB", species="dark energy", gridsize=8,
                       representation="fluid", w=0.0, boltzmann_order=1)
    cfg = SimConfig(boxsize=10.0, potential_gridsize=8)
    sim = MultiSimulation(
        [], [f1, f2], cfg, bg,
        fluid_scheme_select={"fluidA": "MacCormack", "fluidB": "Kurganov-Tadmor"},
    )
    assert sim.fluid_scheme == {"fluidA": "maccormack",
                                "fluidB": "kurganovtadmor"}
    with pytest.raises(ValueError):
        MultiSimulation([], [f1], cfg, bg,
                        fluid_scheme_select={"all": "upwind-magic"})


def test_softening_kernel_properties():
    """Spline softening (GADGET-2 kernel, h = 2.8ε): Newtonian beyond h,
    continuous at the branch points, finite at r → 0, and the jitted
    force paths actually change with the kernel."""
    from concept_tpu.forces.shortrange import softened_r3inv

    eps = 0.1
    h = 2.8 * eps
    r = np.linspace(1e-3, 2 * h, 2001)
    r2 = jnp.asarray(r * r, jnp.float32)
    spline = np.asarray(softened_r3inv(r2, eps, "spline", jnp.float32))
    plummer = np.asarray(softened_r3inv(r2, eps, "plummer", jnp.float32))
    none = np.asarray(softened_r3inv(r2, eps, "none", jnp.float32))
    # beyond h: exactly Newtonian
    far = r >= h
    np.testing.assert_allclose(spline[far], 1 / r[far] ** 3, rtol=1e-5)
    np.testing.assert_allclose(none, 1 / r**3, rtol=1e-5)
    # softened below h
    assert np.all(spline[r < 0.8 * h] < 1 / r[r < 0.8 * h] ** 3)
    # continuity at u = 1/2 and u = 1 (force F ∝ r·r3inv)
    F = r * spline
    assert np.max(np.abs(np.diff(F))) < 0.05 * np.max(F)
    # r → 0: harmonic core, F → (32/3)·r/h³ → 0 linearly
    assert np.isclose(F[0], (32.0 / 3.0) * r[0] / h**3, rtol=1e-3)
    # plummer differs from spline in the softened regime
    assert not np.allclose(spline[r < h], plummer[r < h], rtol=0.05)


def test_softening_kernel_reaches_sweep():
    """shortrange_momentum_updates with kernel='spline' differs from
    'plummer' for close pairs and matches it for distant ones."""
    from concept_tpu.forces.shortrange import shortrange_momentum_updates

    box, eps = 1.0, 0.02
    cutoff = 0.3
    scale = cutoff / 4.5
    pos = jnp.asarray(
        [[0.50, 0.5, 0.5], [0.52, 0.5, 0.5],   # r = 0.02 < h = 0.056
         [0.10, 0.1, 0.1], [0.28, 0.1, 0.1]],  # r = 0.18 > h
        jnp.float32,
    )
    out = {}
    for kern in ("plummer", "spline", "none"):
        out[kern] = np.asarray(shortrange_momentum_updates(
            pos, 1.0, box, scale, cutoff, 1.0, n_cells=3, capacity=8,
            softening=eps, engine="xla", softening_kernel=kern,
        ))
    assert not np.isclose(out["plummer"][0, 0], out["spline"][0, 0],
                          rtol=0.02)
    # spline has compact support: exactly Newtonian beyond h = 2.8ε
    np.testing.assert_allclose(out["none"][2], out["spline"][2], rtol=1e-3)
    # plummer softens at all r (non-compact support) — differs even far
    assert not np.isclose(out["plummer"][2, 0], out["spline"][2, 0],
                          rtol=1e-3)


def test_select_softening_length_honored():
    """run.softening_length evaluates the per-component selector
    expression (previously hardcoded 0.025·boxsize/∛N)."""
    from concept_tpu.run import softening_length
    from concept_tpu.param import RunConfig
    from concept_tpu.components import ComponentSpec

    cfg = RunConfig()
    cfg.boxsize = 100.0
    cfg.select_softening_length = {"matter": "0.05*boxsize/cbrt(N)"}
    spec = ComponentSpec(name="matter", species="matter", N=8**3, mass=1.0)
    got = softening_length(cfg, spec, 16)
    assert np.isclose(got, 0.05 * 100.0 / 8.0)
    cfg.select_softening_length = {"all": 2.5}
    assert softening_length(cfg, spec, 16) == 2.5
    # default expression when nothing matches
    cfg.select_softening_length = {}
    assert np.isclose(softening_length(cfg, spec, 16), 0.025 * 100.0 / 8.0)


def test_select_approximations_p_eq_wrho():
    """select_approximations 'P=wρ' (reference species.py:1320-1351):
    spelling variants accepted; forced True when 𝒫 is not an
    independently realized variable; and the selected approximation
    replaces the linear-𝒫 closure by 𝒫 = w·c²·ϱ in the re-realization."""
    from concept_tpu.run import p_eq_wrho_selected
    from concept_tpu.param import RunConfig
    from concept_tpu.components import ComponentSpec

    spec = ComponentSpec(name="nu", species="neutrino",
                         representation="fluid", gridsize=8, w=1 / 3,
                         boltzmann_order=1, boltzmann_closure="class")
    cfg = RunConfig()
    assert p_eq_wrho_selected(cfg, spec) is False  # default False
    for key in ("P=wρ", "P = wρ", "P=w*rho", "P=ρw"):
        cfg.select_approximations = {"all": {key: True}}
        assert p_eq_wrho_selected(cfg, spec) is True, key
    cfg.select_approximations = {"all": {"P=wρ": False}}
    assert p_eq_wrho_selected(cfg, spec) is False
    # forced True for components without an independent 𝒫
    low = ComponentSpec(name="nu", species="neutrino",
                        representation="fluid", gridsize=8, w=1 / 3,
                        boltzmann_order=0, boltzmann_closure="truncate")
    assert p_eq_wrho_selected(cfg, low) is True


def test_delta_a_max_honored():
    """Δa_max_early/late reach the base-timestep limiter (reference
    commons.py:3883-3885; previously hardcoded module constants)."""
    from concept_tpu.sim import Simulation, SimConfig
    from concept_tpu.components import ComponentSpec
    from concept_tpu.cosmology.background import Background

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.3)
    spec = ComponentSpec(name="m", species="matter", N=8, mass=0.0)

    def dt_at(a, **kw):
        cfg = SimConfig(boxsize=100.0, potential_gridsize=8, method="pm",
                        **kw)
        sim = Simulation(spec, cfg, bg, None)
        return sim.timestep_size(a)

    # tighten the late bound 100×: Δa limiter binds and scales linearly
    a = 0.5
    dt_ref = dt_at(a)
    dt_tight = dt_at(a, da_max_late=0.022 / 100)
    assert dt_tight < dt_ref
    H = float(bg.hubble_np(a))
    assert np.isclose(dt_tight, (0.022 / 100) / (a * H), rtol=0.05)
    # early-epoch bound at a < 0.1
    dt_early = dt_at(0.05, da_max_early=1e-6)
    assert np.isclose(dt_early, 1e-6 / (0.05 * float(bg.hubble_np(0.05))),
                      rtol=0.05)


def test_enable_terminal_formatting_honored(capsys):
    """enable_terminal_formatting = False strips ANSI escapes
    (reference param/example_explanatory:539)."""
    from concept_tpu.utils import terminal

    old = terminal._enable_formatting
    try:
        terminal.set_formatting(False)
        terminal.masterwarn("plain warning")
        out = capsys.readouterr()
        assert "\033[" not in out.out + out.err
        terminal.set_formatting(True)
        terminal.masterwarn("fancy warning")
        out = capsys.readouterr()
        assert "\033[" in out.out + out.err
    finally:
        terminal._enable_formatting = old


def test_bispec_antialiasing_honored():
    """bispec_antialiasing toggles the cell-shell overlap weights: binary
    shells count different mode numbers than anti-aliased ones."""
    from concept_tpu.analysis.bispec import bispec

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 50.0, (200, 3)).astype(np.float32))
    out_aa = bispec([pos], [1.0], 16, 50.0, configuration="equilateral 4",
                    antialias=True)
    out_bin = bispec([pos], [1.0], 16, 50.0, configuration="equilateral 4",
                     antialias=False)
    assert not np.allclose(np.asarray(out_aa["n_triangles"]),
                           np.asarray(out_bin["n_triangles"]))


def test_snapshot_wrap_honored(tmp_path):
    """snapshot_wrap = True wraps out-of-bounds particles on load;
    False aborts (reference out_of_bounds_check, snapshot.py:3359)."""
    from concept_tpu.io import snapshot as snap
    from concept_tpu.components import ComponentSpec, ParticleState
    from concept_tpu.param import RunConfig
    from concept_tpu.run import run
    from concept_tpu.units import UnitSystem

    usys = UnitSystem("Mpc", "Gyr", "10**10 m_sun")
    box = 32 * usys.Mpc
    N = 8
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, box, (N, 3))
    pos[0, 0] = box * 1.25  # out of bounds
    spec = ComponentSpec(name="matter", species="matter", N=N, mass=1e5)
    st = ParticleState(pos=jnp.asarray(pos), mom=jnp.zeros((N, 3)))
    meta = snap.SnapshotMeta(a=0.5, boxsize=box, H0=67 * usys.km / (usys.s * usys.Mpc),
                             Omega_b=0.049, Omega_cdm=0.27,
                             unit_length="Mpc", unit_time="Gyr",
                             unit_mass="10**10 m_sun")
    fn = str(tmp_path / "oob.hdf5")
    snap.save_concept(fn, meta, {"matter": (spec, st)})

    def make_cfg(wrap):
        cfg = RunConfig()
        cfg.H0 = 67 * usys.km / (usys.s * usys.Mpc)
        cfg.boxsize = box
        cfg.initial_conditions = fn
        cfg.snapshot_wrap = wrap
        cfg.units = usys
        cfg.output_dirs = {"snapshot": str(tmp_path / "out")}
        cfg.output_times = {"a": {}}
        cfg.select_forces = {"all": {"gravity": "pm"}}
        cfg.potential_options = {"gridsize": 8}
        cfg.boltzmann_backend = "eh"
        return cfg

    with pytest.raises(SystemExit):
        run(make_cfg(False), max_steps=0)
    sim, state, a = run(make_cfg(True), max_steps=0)
    p = np.asarray(state.pos)
    assert p.min() >= 0 and p.max() < box


def test_select_particle_id_honored(tmp_path):
    """select_particle_id controls whether realized particles carry IDs
    (reference select_particle_id, param/example_explanatory:151)."""
    from concept_tpu.param import RunConfig
    from concept_tpu.run import run
    from concept_tpu.units import UnitSystem

    usys = UnitSystem("Mpc", "Gyr", "10**10 m_sun")

    def make_cfg(sel):
        cfg = RunConfig()
        cfg.H0 = 67 * usys.km / (usys.s * usys.Mpc)
        cfg.boxsize = 32 * usys.Mpc
        cfg.initial_conditions = {"species": "matter", "N": 4**3}
        cfg.select_particle_id = sel
        cfg.units = usys
        cfg.output_times = {"a": {}}
        cfg.select_forces = {"all": {"gravity": "pm"}}
        cfg.potential_options = {"gridsize": 4}
        cfg.a_begin = 0.5
        cfg.boltzmann_backend = "eh"
        return cfg

    sim, state, a = run(make_cfg({"all": True}), max_steps=0)
    assert state.ids is not None
    ids = np.sort(np.asarray(state.ids).ravel())
    assert np.array_equal(ids, np.arange(4**3))
    sim, state, a = run(make_cfg({}), max_steps=0)
    assert state.ids is None


def test_powerspec_options_binning_honored():
    """powerspec_options 'bins per decade' / 'k_max' reach the estimator
    (reference powerspec_options, param/example_explanatory:246-266)."""
    from concept_tpu.analysis.powerspec import powerspec

    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(0, 100.0, (500, 3)).astype(np.float32))
    pk_lo = powerspec([pos], [1.0], 32, 100.0, 500, bins_per_decade=10)
    pk_hi = powerspec([pos], [1.0], 32, 100.0, 500, bins_per_decade=80)
    assert len(pk_hi["k"]) > len(pk_lo["k"])
    k_cut = float(pk_hi["k"][len(pk_hi["k"]) // 2])
    pk_cut = powerspec([pos], [1.0], 32, 100.0, 500, bins_per_decade=80,
                       k_max=k_cut)
    assert pk_cut["k"].max() <= k_cut + 1e-12
    assert len(pk_cut["k"]) < len(pk_hi["k"])


def test_gadget_snapshot_params_honored(tmp_path):
    """gadget_snapshot_params snapformat/dataformat/particles-per-file
    reach the product snapshot dump (previously save_gadget ran with
    hardcoded defaults)."""
    from concept_tpu.param import RunConfig
    from concept_tpu.run import dump
    from concept_tpu.units import UnitSystem
    from concept_tpu.components import ComponentSpec, ParticleState
    from concept_tpu.io import snapshot as snap
    from concept_tpu.sim import Simulation, SimConfig
    from concept_tpu.cosmology.background import Background

    usys = UnitSystem("Mpc", "Gyr", "10**10 m_sun")
    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.3)
    N = 27
    spec = ComponentSpec(name="matter", species="matter", N=N, mass=1e3)
    simcfg = SimConfig(boxsize=32.0, potential_gridsize=8, method="pm",
                       G=1.0)
    sim = Simulation(spec, simcfg, bg, None)
    rng = np.random.default_rng(0)
    state = ParticleState(pos=jnp.asarray(rng.uniform(0, 32, (N, 3))),
                          mom=jnp.zeros((N, 3)))
    cfg = RunConfig()
    cfg.H0 = H0
    cfg.boxsize = 32.0
    cfg.units = usys
    cfg.snapshot_type = "gadget"
    cfg.output_dirs = {"snapshot": str(tmp_path)}
    cfg.output_bases = {"snapshot": "snap"}
    cfg.gadget_snapshot_params = {
        "snapformat": 1, "dataformat": 64, "particles per file": 10,
    }
    dump(cfg, sim, state, 0.5, "snapshot", usys, None)
    files = sorted(tmp_path.glob("snap_a=0.5.*"))
    assert len(files) == 3, files  # 27 particles / 10 per file
    # SnapFormat 1: first block is the bare 256-byte header record
    import struct
    with open(files[0], "rb") as f:
        first = struct.unpack("<I", f.read(4))[0]
    assert first == 256, first  # snapformat 2 would lead with 8 ('HEAD')
    # dataformat 64: POS block is f64 (record length 3*8*n)
    meta, comps = snap.load(str(files[0]).replace(".0", ""), usys)
    (name, (sp, st)), = comps.items()
    assert sp.N == N
