"""Parameter-file system and CLI end-to-end tests (analogue of reference
test/basic: run with a param file, produce output).  Param surface:
reference param/example_basic and commons.py:1757-2045."""

import math
import os
import textwrap

import numpy as np
import pytest

from concept_tpu.param import load_params, is_selected
from concept_tpu.units import UnitSystem


EXAMPLE_BASIC = textwrap.dedent(
    """
    # matter-only ΛCDM, ICs generated on the fly (example_basic analogue)
    initial_conditions = {
        'species': 'matter',
        'N'      : 16**3,
    }
    output_dirs = 'OUTDIR'
    output_times = {'powerspec': 1.0}

    boxsize = 256*Mpc/h
    potential_options = 32

    H0 = 67*km/(s*Mpc)
    Ωb = 0.049
    Ωcdm = 0.27
    a_begin = 0.05
    primordial_spectrum = {
        'A_s': 2.1e-9,
        'n_s': 0.96,
    }
    """
)


def test_load_example_basic(tmp_path):
    path = tmp_path / "param_basic.py"
    path.write_text(EXAMPLE_BASIC.replace("OUTDIR", str(tmp_path / "out")))
    cfg = load_params(str(path))
    u = cfg.units
    assert math.isclose(cfg.h, 0.67, rel_tol=1e-12)
    # boxsize given in Mpc/h resolves with the file's own H0
    assert math.isclose(cfg.boxsize, 256 / 0.67 * u.Mpc, rel_tol=1e-12)
    assert cfg.potential_options["gridsize"] == 32
    assert cfg.initial_conditions["N"] == 4096
    assert cfg.output_times["a"]["powerspec"] == (1.0,)
    assert cfg.Omega_m == pytest.approx(0.319)


def test_command_line_overrides(tmp_path):
    path = tmp_path / "p.py"
    path.write_text(EXAMPLE_BASIC.replace("OUTDIR", str(tmp_path)))
    cfg = load_params(str(path), overrides=["Ωcdm = 0.30", "a_begin = 0.1"])
    assert cfg.Omega_cdm == 0.30
    assert cfg.a_begin == 0.1


def test_selector_matching():
    from concept_tpu.components import ComponentSpec

    spec = ComponentSpec(name="my matter", species="matter")
    sel = {"all": {"gravity": "p3m"}}
    assert is_selected(spec, sel)["gravity"] == "p3m"
    sel2 = {("my matter", "other"): 1, "all": 2}
    assert is_selected(spec, sel2) == 1
    sel3 = {"neutrino": 5}
    assert is_selected(spec, sel3, default="x") == "x"


def test_cli_end_to_end(tmp_path):
    """Full mini simulation through the CLI: param file → run → powerspec
    text output exists (analogue of reference test/basic)."""
    from concept_tpu import cli

    param = tmp_path / "run.py"
    param.write_text(
        EXAMPLE_BASIC.replace("OUTDIR", str(tmp_path / "out")).replace(
            "output_times = {'powerspec': 1.0}",
            "output_times = {'powerspec': 0.25}",
        ).replace("a_begin = 0.05", "a_begin = 0.1")
        + "\nselect_forces = {'all': {'gravity': 'pm'}}\n"
    )
    rc = cli.main(["-p", str(param)])
    assert rc == 0
    outs = list((tmp_path / "out").glob("powerspec*.txt"))
    assert outs, "no powerspec output written"
    data = np.loadtxt(outs[0])
    assert data.shape[1] >= 4  # k, modes, P, corrected(, linear)
    assert np.all(data[:, 0] > 0)


def test_cli_all_output_kinds(tmp_path):
    """Run with every output kind scheduled — snapshot, powerspec, bispec,
    render2D, render3D must all be produced (analogue of the reference's
    multi-output runs)."""
    from concept_tpu import cli

    param = tmp_path / "allout.py"
    param.write_text(
        EXAMPLE_BASIC.replace("OUTDIR", str(tmp_path / "out")).replace(
            "output_times = {'powerspec': 1.0}",
            "output_times = {'powerspec': 0.12, 'snapshot': 0.12, "
            "'bispec': 0.12, 'render2D': 0.12, 'render3D': 0.12}",
        ).replace("a_begin = 0.05", "a_begin = 0.1")
        + "\nselect_forces = {'all': {'gravity': 'pm'}}\n"
    )
    rc = cli.main(["-p", str(param)])
    assert rc == 0
    out = tmp_path / "out"
    assert list(out.glob("powerspec*.txt"))
    assert list(out.glob("snapshot*.hdf5"))
    assert list(out.glob("bispec*.txt"))
    assert list(out.glob("render2D*.png"))
    assert list(out.glob("render3D*.png"))


def test_run_from_snapshot(tmp_path):
    """initial_conditions = '<snapshot path>' starts the run from the file
    (reference get_initial_conditions, snapshot.py:3425)."""
    from concept_tpu import cli

    # 1) produce a snapshot at a=0.1
    p1 = tmp_path / "make_ic.py"
    p1.write_text(
        EXAMPLE_BASIC.replace("OUTDIR", str(tmp_path / "out1")).replace(
            "output_times = {'powerspec': 1.0}",
            "output_times = {'snapshot': 0.1}",
        ).replace("a_begin = 0.05", "a_begin = 0.1")
        + "\nselect_forces = {'all': {'gravity': 'pm'}}\n"
    )
    assert cli.main(["-p", str(p1)]) == 0
    snap_file = next((tmp_path / "out1").glob("snapshot*.hdf5"))
    # 2) continue from it to a=0.15
    p2 = tmp_path / "continue.py"
    p2.write_text(
        EXAMPLE_BASIC.replace("OUTDIR", str(tmp_path / "out2")).replace(
            "initial_conditions = {\n    'species': 'matter',\n    'N'      : 16**3,\n}",
            f"initial_conditions = {str(str(snap_file))!r}",
        ).replace(
            "output_times = {'powerspec': 1.0}",
            "output_times = {'powerspec': 0.15}",
        )
        + "\nselect_forces = {'all': {'gravity': 'pm'}}\n"
    )
    assert cli.main(["-p", str(p2)]) == 0
    assert list((tmp_path / "out2").glob("powerspec*.txt"))


def test_multi_component_run_with_fluid(tmp_path):
    """Particles + a dust fluid coupled through PM gravity, configured
    entirely from a parameter file (example_nonlinnu structure,
    reference param/example_explanatory:11-25)."""
    from concept_tpu import cli

    param = tmp_path / "multi.py"
    param.write_text(
        """
initial_conditions = [
    {'species': 'matter', 'N': 16**3},
    {'species': 'matter', 'name': 'dust fluid', 'gridsize': 16,
     'boltzmann order': 1},
]
output_dirs = 'OUT'
output_times = {'powerspec': 0.15, 'snapshot': 0.15}
boxsize = 512*Mpc
potential_options = 16
H0 = 67*km/(s*Mpc)
Ωb = 0.049
Ωcdm = 0.27
a_begin = 0.1
primordial_spectrum = {'A_s': 2.1e-9, 'n_s': 0.96}
""".replace("OUT", str(tmp_path / "out"))
    )
    rc = cli.main(["-p", str(param)])
    assert rc == 0
    outs = list((tmp_path / "out").glob("powerspec*matter*.txt"))
    assert outs, "particle spectrum missing"
    fl = list((tmp_path / "out").glob("powerspec*dust fluid*.txt"))
    assert fl, "fluid spectrum missing"
    assert list((tmp_path / "out").glob("snapshot*.hdf5"))


def test_component_lives(tmp_path):
    """select_lives: a component activating mid-run (reference
    activate_terminate, main.py:1726-1803, Appendix D)."""
    from concept_tpu import cli

    param = tmp_path / "lives.py"
    param.write_text(
        """
initial_conditions = [
    {'species': 'matter', 'N': 12**3},
    {'species': 'matter', 'name': 'late fluid', 'gridsize': 12},
]
select_lives = {'late fluid': (0.2, 0.28), 'all': (0, float('inf'))}
output_dirs = 'OUT'
output_times = {'powerspec': [0.15, 0.25, 0.3]}
boxsize = 512*Mpc
potential_options = 12
H0 = 67*km/(s*Mpc)
Ωb = 0.049
Ωcdm = 0.27
a_begin = 0.1
primordial_spectrum = {'A_s': 2.1e-9, 'n_s': 0.96}
""".replace("OUT", str(tmp_path / "out"))
    )
    rc = cli.main(["-p", str(param)])
    assert rc == 0
    out = tmp_path / "out"
    # fluid spectrum exists at a=0.25 (active) but not at 0.15 (pre-birth)
    # nor 0.3 (terminated)
    assert list(out.glob("powerspec_late fluid_a=0.25*"))
    assert not list(out.glob("powerspec_late fluid_a=0.15*"))
    assert not list(out.glob("powerspec_late fluid_a=0.3*"))
    assert list(out.glob("powerspec_matter_a=0.3*"))


def test_potential_options_per_method_gridsizes():
    """Per-force grid sizes survive canonicalization (reference multigrid
    semantics: pm and p3m meshes differ, param/example_nonlinnu)."""
    from concept_tpu.param import load_params

    cfg = load_params(None, text="""
boxsize = 100*Mpc
potential_options = {
    'gridsize': {'global': {'gravity': {'pm': 40, 'p3m': 160}}},
}
initial_conditions = {'species': 'matter', 'N': 8**3}
""")
    assert cfg.potential_options["gridsize_per_method"] == {"pm": 40, "p3m": 160}
    assert cfg.potential_options["gridsize"] == 160


def test_is_selected_reference_semantics():
    """Reference commons.py:5471 is_selected: precedence ladder
    ('default' < 'all' < representation < species part < species <
    name), case-insensitive + regex fallback, and component-COMBINATION
    keys matched as sets with the 'all combinations' wildcard (the
    pair-selector form, e.g. powerspec_select[('a', 'b')])."""
    from concept_tpu.param import is_selected

    class S:
        def __init__(self, name, species, rep="particles"):
            self.name, self.species, self.representation = name, species, rep

    m = S("matter", "matter")
    nu = S("nu", "neutrino", "fluid")
    assert is_selected(m, {"all": 1, "matter": 2}) == 2
    assert is_selected(nu, {"all": 1, "neutrino": 3, "nu": 4}) == 4
    assert is_selected(m, {"default": 0, "all": 1}) == 1
    assert is_selected(m, {"default": 7}, default=None) == 7
    assert is_selected(nu, {"neutr.*": 5}) == 5
    assert is_selected(m, {"neutr.*": 5}, default=-1) == -1
    assert is_selected(nu, {"fluid": 6}) == 6
    assert is_selected((m, nu), {("matter", "nu"): 11}) == 11
    assert is_selected((m, nu), {("matter", "neutrino"): 12}) == 12
    assert is_selected((m, nu), {"all combinations": 13}) == 13
    assert is_selected((m, nu), {("matter", "other"): 14}, default=-2) == -2
    assert is_selected(
        (m, nu),
        {"all combinations": 1, ("matter", "neutrino"): 2,
         ("matter", "nu"): 3},
    ) == 3
    cb = S("cb", "cdm+baryon")
    assert is_selected(cb, {"cdm": 21}) == 21
    assert is_selected(cb, {"cdm+baryon": 22, "cdm": 21}) == 22


def test_life_output_order_canonicalization():
    """Reference normalization (commons.py:2912-2929): prefixes,
    case-insensitive, missing actions appended, errors on junk."""
    from concept_tpu.param import _canonicalize_life_output_order as canon

    assert canon(()) == ("terminate", "activate", "dump")
    assert canon(("out",)) == ("dump", "terminate", "activate")
    assert canon(("Deactivate", "OUTPUT")) == ("terminate", "dump", "activate")
    assert canon(("act", "term", "dump")) == ("activate", "terminate", "dump")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        canon(("sideways",))


def test_life_output_order_honored(tmp_path):
    """A termination coinciding with a dump: default order terminates
    BEFORE the dump (no spectrum); 'dump first' emits the spectrum
    (reference life_output_order, main.py:1726-1803)."""
    from concept_tpu import cli

    def run_with(order, sub):
        param = tmp_path / f"loo_{sub}.py"
        param.write_text(
            """
initial_conditions = [
    {'species': 'matter', 'N': 8**3},
    {'species': 'matter', 'name': 'dying fluid', 'gridsize': 8},
]
select_lives = {'dying fluid': (0, 0.3), 'all': (0, float('inf'))}
life_output_order = ORDER
output_dirs = 'OUT'
output_times = {'powerspec': [0.3]}
boxsize = 512*Mpc
potential_options = 8
H0 = 67*km/(s*Mpc)
Ωb = 0.049
Ωcdm = 0.27
a_begin = 0.1
primordial_spectrum = {'A_s': 2.1e-9, 'n_s': 0.96}
""".replace("OUT", str(tmp_path / "out" / sub)).replace("ORDER", repr(order))
        )
        rc = cli.main(["-p", str(param)])
        assert rc == 0
        return tmp_path / "out" / sub

    out = run_with(("terminate", "activate", "dump"), "default")
    assert not list(out.glob("powerspec_dying fluid_a=0.3*"))
    assert list(out.glob("powerspec_matter_a=0.3*"))
    out = run_with(("dump", "terminate", "activate"), "dumpfirst")
    assert list(out.glob("powerspec_dying fluid_a=0.3*"))


def test_example_explanatory_loads():
    """The full-catalogue example parameter file must load cleanly and
    canonicalize every documented parameter."""
    from concept_tpu.param import load_params

    cfg = load_params("param/example_explanatory.py")
    assert cfg.potential_options["gridsize_per_method"] == {"pm": 16, "p3m": 32}
    assert cfg.N_rungs == 8
    assert cfg.softening_kernel == "spline"
    assert cfg.life_output_order == ("terminate", "activate", "dump")
    assert cfg.fluid_scheme_select == {"all": "kurganovtadmor"}
    assert cfg.realization_options["lpt"] == 2


def test_main_script_option(tmp_path):
    """-m SCRIPT executes a custom main with cfg and units in scope
    (reference `-m MAIN`; its tests' analyze.py pattern)."""
    from concept_tpu import cli

    script = tmp_path / "custom.py"
    marker = tmp_path / "ran.txt"
    script.write_text(
        f"open({str(marker)!r}, 'w').write(str(cfg.boxsize))\n"
    )
    rc = cli.main(["-m", str(script), "-c", "boxsize = 77*Mpc"])
    assert rc == 0
    assert marker.read_text() == "77.0"


def test_descoped_params_warn(capsys):
    """Setting a deliberately-unsupported reference parameter warns with
    the reason instead of silently ignoring it."""
    from concept_tpu.param import load_params

    load_params(None, text=(
        "boxsize = 100*Mpc\n"
        "random_generator = 'PCG64DXSM'\n"
        "fftw_wisdom_rigor = 'measure'\n"
    ))
    err = capsys.readouterr()
    out = err.out + err.err
    assert "random_generator" in out and "not supported" in out
    assert "fftw_wisdom_rigor" in out


def test_dcdm_gr_recipe_end_to_end(tmp_path):
    """The documented decaying-CDM GR setup (matter + dcdm + metric +
    lapse, lapse force selected) runs through the product loop
    (reference interactions.py:2980-3037 lapse application)."""
    from concept_tpu.param import load_params
    from concept_tpu.run import run

    cfg = load_params(None, text=f"""
initial_conditions = [
    {{'species': 'matter', 'N': 4**3}},
    {{'species': 'decaying cold dark matter', 'gridsize': 8}},
    {{'species': 'metric', 'gridsize': 8, 'boltzmann order': -1}},
    {{'species': 'lapse',  'gridsize': 8, 'boltzmann order': -1}},
]
class_params = {{'Gamma_dcdm': 50}}
select_forces = {{
    'all' : {{'gravity': 'pm'}},
    'decaying cold dark matter': {{'gravity': 'pm', 'lapse': 'pm'}},
}}
boxsize = 64*Mpc
potential_options = 8
H0 = 67*km/(s*Mpc)
Ωb = 0.049
Ωcdm = 0.27
a_begin = 0.1
output_times = {{'powerspec': [0.11]}}
output_dirs = '{tmp_path}'
""")
    sim, st, a = run(cfg, max_steps=2000)
    assert abs(a - 0.11) < 1e-6
    assert sim.lapse_supplier == "lapse"
    assert list(tmp_path.glob("powerspec_matter_*.txt"))


def test_interactive_option(tmp_path):
    """-i drops into an interactive session with cfg/units in scope
    (reference `-i`); with only -c snippets no simulation runs."""
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from concept_tpu.cli import main;"
         "sys.exit(main(['-i', '-c', 'boxsize = 55*Mpc']))"],
        input="print('BOX', cfg.boxsize, units.Mpc)\n",
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert "BOX 55.0 1.0" in r.stdout
    assert "Realizing" not in r.stdout  # no simulation ran


def test_concept_env_var_mirrors(monkeypatch):
    """CONCEPT_* environment variables mirror every long CLI option's
    default (reference concept:1017-1035), dashes mapped to
    underscores."""
    from concept_tpu.cli import make_parser

    monkeypatch.setenv("CONCEPT_param", "/tmp/somewhere.py")
    monkeypatch.setenv("CONCEPT_nprocs", "4")
    monkeypatch.setenv("CONCEPT_pure_python", "True")
    monkeypatch.setenv("CONCEPT_command_line_params", "boxsize=1*Mpc")
    args = make_parser().parse_args([])
    assert args.param == "/tmp/somewhere.py"
    assert args.nprocs == "4"
    assert args.pure_python is True
    assert args.command_line_params == ["boxsize=1*Mpc"]
    # explicit CLI flags still win over the environment
    args = make_parser().parse_args(["-p", "other.py", "-n", "2"])
    assert args.param == "other.py"
    assert args.nprocs == "2"


def test_running_bins_per_decade_dict():
    """powerspec_options 'bins per decade' in the reference's running
    dict form (param/example_explanatory:242-247): control points
    {k_expr: bins} interpolated in log k — coarse at low k, fine at
    high k."""
    import jax.numpy as jnp
    from concept_tpu.analysis.powerspec import powerspec

    rng = np.random.default_rng(0)
    box, n, N = 100.0, 32, 2000
    pos = jnp.asarray(rng.uniform(0, box, (N, 3)).astype(np.float32))
    pk_run = powerspec([pos], [1.0], n, box, N,
                       bins_per_decade={"4*k_min": 4, "100*k_min": 40})
    pk_int = powerspec([pos], [1.0], n, box, N, bins_per_decade=40)
    assert np.all(np.isfinite(pk_run["power"]))
    assert np.all(np.diff(pk_run["k"]) > 0)
    # the running form is coarser at low k than the fixed-40 hybrid
    assert len(pk_run["k"]) < len(pk_int["k"])
    # log-bin widths grow finer (more bins/decade) toward high k
    logk = np.log10(pk_run["k"])
    widths = np.diff(logk)
    assert widths[-1] < widths[0]


def test_bispec_shellthickness_expressions():
    """bispec_options 'shellthickness' accepts the reference's
    expression dict (param/example_explanatory:268-276)."""
    import jax.numpy as jnp
    from concept_tpu.analysis.bispec import bispec, _shellthickness_at
    import math

    kf = 2 * math.pi / 100.0
    spec = {"1*k_fundamental": "0.25*k_fundamental",
            "4*k_fundamental": "max(3*k_fundamental, 1/20*log(10)*k)"}
    # control points evaluate per the reference vocabulary
    assert np.isclose(_shellthickness_at(spec, kf, kf, 32), 0.25 * kf)
    th_hi = _shellthickness_at(spec, 10 * kf, kf, 32)
    assert th_hi >= 3 * kf
    rng = np.random.default_rng(1)
    box, n, N = 100.0, 16, 512
    pos = jnp.asarray(rng.uniform(0, box, (N, 3)).astype(np.float32))
    out = bispec([pos], [1.0], n, box, configuration="equilateral 3",
                 shellthickness=spec)
    assert np.isfinite(out["B"]).any()
