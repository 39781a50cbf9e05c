"""Autosave/resume round trip (reference main.py:1821-2010) and
jit-vs-eager equivalence (the analogue of the reference's compiled vs
pure-Python tests, test/pure_python_pm, tolerance 1e-10 there — here the
computation is identical math so agreement is bitwise-exact up to op
reordering)."""

import os
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest


PARAM = textwrap.dedent(
    """
    initial_conditions = {'species': 'matter', 'N': 16**3}
    output_dirs = 'OUTDIR'
    output_times = {'powerspec': [0.3]}
    boxsize = 512*Mpc
    potential_options = 16
    H0 = 67*km/(s*Mpc)
    Ωb = 0.049
    Ωcdm = 0.27
    a_begin = 0.1
    primordial_spectrum = {'A_s': 2.1e-9, 'n_s': 0.96}
    select_forces = {'all': {'gravity': 'pm'}}
    """
)


def test_autosave_roundtrip(tmp_path):
    from concept_tpu.param import load_params
    from concept_tpu.run import (
        run, write_autosave, check_autosave, clear_autosave, build_cosmology,
    )

    pfile = tmp_path / "auto.py"
    pfile.write_text(PARAM.replace("OUTDIR", str(tmp_path / "out")))
    cfg = load_params(str(pfile))
    sim, state, a = run(cfg)
    events = [[0.5, "powerspec"]]
    units, consts, bg, lin = build_cosmology(cfg)
    write_autosave(cfg, sim, state, a, events, units)
    resumed = check_autosave(cfg)
    assert resumed is not None
    st2, a2, ev2, _hyst, _steps = resumed
    assert np.isclose(a2, a)
    assert ev2 == [(0.5, "powerspec")]
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(state.pos), rtol=1e-6)
    clear_autosave(cfg)
    assert check_autosave(cfg) is None


def test_resume_continues_run(tmp_path):
    """A run interrupted after an autosave resumes and completes."""
    from concept_tpu.param import load_params
    from concept_tpu.run import run, write_autosave, build_cosmology

    pfile = tmp_path / "resume.py"
    pfile.write_text(
        PARAM.replace("OUTDIR", str(tmp_path / "out")).replace(
            "output_times = {'powerspec': [0.3]}",
            "output_times = {'powerspec': [0.2, 0.3]}",
        )
    )
    cfg = load_params(str(pfile))
    # simulate an interruption: run to 0.2 manually then autosave
    cfg_partial = load_params(str(pfile))
    sim, state, a = run(
        load_params(
            str(pfile),
            overrides=["output_times = {'powerspec': [0.2]}"],
        )
    )
    units, consts, bg, lin = build_cosmology(cfg)
    write_autosave(cfg, sim, state, a, [[0.3, "powerspec"]], units)
    # resuming run picks up the autosave and finishes the 0.3 dump
    sim2, state2, a2 = run(cfg)
    assert np.isclose(a2, 0.3, rtol=1e-6)
    outs = list((tmp_path / "out").glob("powerspec*0.3*.txt"))
    assert outs


def test_jit_vs_eager_step():
    """One PM step computed jitted vs eagerly (jax.disable_jit) must agree
    — the analogue of compiled-vs-pure-python (reference
    test/pure_python_pm/analyze.py tolerance 1e-10; f32 here)."""
    import __graft_entry__ as ge

    sim, state = ge._build(n_grid=16)
    i1, i2 = jnp.float32(1e-3), jnp.float32(2e-3)
    out_jit, _ = jax.jit(sim._step)(state, i1, i2)
    with jax.disable_jit():
        out_eager, _ = sim._step(state, i1, i2)
    np.testing.assert_allclose(
        np.asarray(out_jit.pos), np.asarray(out_eager.pos), atol=2e-5
    )
    scale = float(jnp.max(jnp.abs(out_eager.mom)))
    np.testing.assert_allclose(
        np.asarray(out_jit.mom) / scale, np.asarray(out_eager.mom) / scale,
        atol=1e-5,
    )
