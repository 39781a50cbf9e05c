"""Output selection masks: bispec_select / render2D_select /
render3D_select (reference param/example_explanatory:77-159; each
output kind honors a per-component selector with fine-grained artifact
flags).
"""

import textwrap

import numpy as np

from concept_tpu.param import load_params
from concept_tpu.run import _output_flags


PARAM = textwrap.dedent(
    """
    initial_conditions = {'species': 'matter', 'N': 8**3}
    output_dirs = 'OUTDIR'
    output_times = {'bispec': 0.12, 'render2D': 0.12, 'render3D': 0.12}
    boxsize = 128*Mpc/h
    potential_options = 16
    a_begin = 0.1
    select_forces = {'all': {'gravity': 'pm'}}
    """
)


def _cfg_with(tmp_path, extra):
    param = tmp_path / "p.py"
    param.write_text(PARAM.replace("OUTDIR", str(tmp_path / "out")) + extra)
    return str(param)


def test_output_flags_semantics():
    class Spec:
        name = "matter"
        species = "matter"
        representation = "particles"

    keys = ("data", "reduced", "treelevel", "plot")
    # bool shorthand: column family on, plot off
    f = _output_flags(Spec(), {"all": True}, keys, "data")
    assert f == {"data": True, "reduced": True, "treelevel": True,
                 "plot": False}
    assert not any(_output_flags(Spec(), {"all": False}, keys,
                                 "data").values())
    # fine-grained dict
    f = _output_flags(Spec(), {"matter": {"data": True, "plot": True}},
                      keys, "data")
    assert f == {"data": True, "reduced": False, "treelevel": False,
                 "plot": True}
    # render2D keys: bool leaves 'terminal image' off
    f = _output_flags(Spec(), {"all": True},
                      ("data", "image", "terminal image"), "image")
    assert f["image"] and f["data"] and not f["terminal image"]


def test_bispec_select_off_suppresses_output(tmp_path):
    from concept_tpu import cli

    p = _cfg_with(tmp_path, "bispec_select = {'all': False}\n"
                            "render2D_select = {'all': False}\n"
                            "render3D_select = {'all': False}\n")
    assert cli.main(["-p", p]) == 0
    out = tmp_path / "out"
    assert not list(out.glob("bispec*"))
    assert not list(out.glob("render2D*"))
    assert not list(out.glob("render3D*"))


def test_bispec_reduced_column(tmp_path):
    from concept_tpu import cli

    p = _cfg_with(
        tmp_path,
        "bispec_select = {'all': {'data': True, 'reduced': True}}\n"
        "render2D_select = {'all': {'data': True, 'image': False}}\n"
        "render3D_select = {'all': False}\n",
    )
    assert cli.main(["-p", p]) == 0
    out = tmp_path / "out"
    (bs,) = list(out.glob("bispec*.txt"))
    header = open(bs).readline()
    assert "Q_reduced" in header
    data = np.loadtxt(bs)
    assert data.shape[1] == 6  # k1 k2 k3 triangles B Q
    # render2D: data HDF5 requested, png suppressed
    assert list(out.glob("render2D*.hdf5"))
    assert not list(out.glob("render2D*.png"))
    assert not list(out.glob("render3D*"))
