"""Utility CLI tests (reference util/* + utilities.py surface)."""

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units
from concept_tpu.components import ComponentSpec, ParticleState
from concept_tpu.io import snapshot as snap
from concept_tpu import cli


@pytest.fixture
def snap_file(tmp_path):
    rng = np.random.default_rng(0)
    N = 64
    spec = ComponentSpec(name="matter", species="matter", N=N, mass=2.0)
    state = ParticleState(
        pos=jnp.asarray(rng.uniform(0, 10.0, (N, 3)).astype(np.float32)),
        mom=jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32)),
    )
    meta = snap.SnapshotMeta(
        a=1.0, boxsize=10.0, H0=67 * units.km / (units.s * units.Mpc),
        Omega_b=0.049, Omega_cdm=0.27,
    )
    return snap.save_concept(str(tmp_path / "s.hdf5"), meta, {"matter": (spec, state)})


def test_util_info(snap_file, capsys):
    rc = cli.main(["-u", "info", snap_file])
    assert rc == 0
    out = capsys.readouterr().out
    assert "concept snapshot" in out
    assert "N=64" in out


def test_util_powerspec(snap_file, tmp_path):
    rc = cli.main(["-u", "powerspec", snap_file])
    assert rc == 0
    import glob

    assert glob.glob(snap_file + "_powerspec*")


def test_util_convert_gadget(snap_file):
    rc = cli.main(["-u", "convert", snap_file, "snapshot_type=gadget"])
    assert rc == 0
    out = snap_file + ".gadget"
    assert snap.snapshot_type(out) == "gadget"
    meta, comps = snap.load(out)
    (spec, state), = comps.values()
    assert spec.N == 64


def test_util_render2d(snap_file):
    rc = cli.main(["-u", "render2D", snap_file])
    assert rc == 0
    import os

    assert os.path.exists(snap_file + "_render2D_matter.png")


def test_util_class(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["-u", "class", str(tmp_path / "out.hdf5")])
    assert rc == 0
    import h5py

    with h5py.File(tmp_path / "out.hdf5") as f:
        assert "background" in f
        assert "perturbations" in f


def test_util_play(tmp_path, capsys):
    log = tmp_path / "log"
    frame = "\033[38;2;1;2;3m\033[48;2;4;5;6m▀\033[0m"
    log.write_text(f"header\n{frame}\n{frame}\nfooter\n{frame}\n")
    rc = cli.main(["-u", "play", str(log), "--fps=100"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "\033[38;2;1;2;3m" in out


def test_cli_version(capsys):
    rc = cli.main(["--version"])
    assert rc == 0
    assert "concept_tpu" in capsys.readouterr().out


class TestNewUtilities:
    def test_watch_prints_latest_job_log(self, tmp_path, capsys, monkeypatch):
        import types
        from concept_tpu.utilities import delegate

        monkeypatch.chdir(tmp_path)
        (tmp_path / "job" / "7").mkdir(parents=True)
        (tmp_path / "job" / "7" / "log").write_text("line A\nline B\n")
        ca = types.SimpleNamespace(command_line_params=[])
        rc = delegate(["watch", "timeout=0.6"], ca)
        assert rc == 0
        out = capsys.readouterr().out
        assert "line A" in out and "line B" in out

    def test_gadget_writes_matched_param_file(self, tmp_path):
        import types
        from concept_tpu.utilities import delegate

        ca = types.SimpleNamespace(command_line_params=[])
        out = tmp_path / "gg"
        rc = delegate(
            ["gadget", "/root/repo/param/example_pm_quick.py",
             f"output={out}"], ca,
        )
        assert rc == 0
        text = (out / "gadget.param").read_text()
        assert "PMGRID" in text and "BoxSize" in text
        import numpy as np

        a_out = np.loadtxt(out / "outputlist.txt", ndmin=1)
        assert np.all(a_out > 0) and np.all(a_out <= 1)

    def test_update_reports_non_tracking(self):
        import types
        from concept_tpu.utilities import delegate

        ca = types.SimpleNamespace(command_line_params=[])
        # the test repo has no upstream: update must fail gracefully
        rc = delegate(["update"], ca)
        assert rc != 0 or rc == 0  # no crash; rc depends on git state


def test_info_generate_params(tmp_path):
    """-u info --generate-params writes a loadable parameter file
    matching the snapshot (reference info --generate-params)."""
    import numpy as np
    import jax.numpy as jnp
    from concept_tpu.io import snapshot as snap
    from concept_tpu.components import ComponentSpec, ParticleState
    from concept_tpu.cli import main
    from concept_tpu.param import load_params

    meta = snap.SnapshotMeta(a=0.5, boxsize=32.0, H0=0.0683,
                             Omega_b=0.049, Omega_cdm=0.27)
    spec = ComponentSpec(name="matter", species="matter", N=8, mass=1e5)
    st = ParticleState(pos=jnp.asarray(np.random.default_rng(0).random((8, 3)) * 32),
                       mom=jnp.zeros((8, 3)))
    fn = str(tmp_path / "s.hdf5")
    snap.save_concept(fn, meta, {"matter": (spec, st)})
    assert main(["-u", "info", fn, "--generate-params"]) == 0
    cfg = load_params(fn + ".params.py")
    assert cfg.boxsize == 32.0
    assert cfg.a_begin == 0.5
    assert cfg.initial_conditions == fn


def test_util_class_options(tmp_path):
    """-u class honors --kmin/--kmax/--modes/--times/--gauge
    (reference util/class option surface)."""
    import h5py
    from concept_tpu.cli import main

    out = str(tmp_path / "c.hdf5")
    rc = main(["-u", "class", out, "--kmin", "1e-3", "--kmax", "2",
               "--modes", "32", "--times", "0.5,1.0",
               "--gauge", "synchronous"])
    assert rc == 0
    with h5py.File(out) as f:
        assert f["perturbations/k"].shape == (32,)
        assert set(f["perturbations"].keys()) == {"k", "a=0.5", "a=1.0"}
        assert f.attrs["gauge"] == "synchronous"
