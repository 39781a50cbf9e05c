"""example_relativistic-class configuration end-to-end (scaled down):
GR multi-species — matter particles + decaying cold dark matter (dcdm)
+ decay radiation (dr) + metric + lapse corrections — with bispectrum
output, on the explicit 8-device mesh (`-n 8`), asserting the dcdm
suppression signature against a Γ = 0 twin run.

Reference: param/example_relativistic + the dcdm/GR-correction pairing
interactions.py:2963-3037; BASELINE 'example_relativistic' target (GR
multi-species + bispec, multi-chip)."""

import glob
import os

import numpy as np
import pytest

from concept_tpu.cli import main


def _run(tmp_path, tag, gamma_kms_mpc):
    out = str(tmp_path / f"out_{tag}")
    rc = main([
        "-p", "param/example_relativistic.py",
        "-n", "8",
        "-c", "initial_conditions=["
              "{'species':'matter','N':8**3},"
              "{'name':'dcdm','species':'dcdm','gridsize':8,"
              "'boltzmann order':1,'decay to':'dr'},"
              "{'name':'dr','species':'radiation','gridsize':8,"
              "'boltzmann order':-1,'boltzmann closure':'class'},"
              "{'name':'metric','species':'metric','gridsize':8,"
              "'boltzmann order':-1},"
              "{'name':'lapse','species':'lapse','gridsize':8,"
              "'boltzmann order':-1}]",
        "-c", "potential_options=16",
        "-c", f"output_dirs='{out}'",
        "-c", "output_times={'powerspec': [0.3], 'bispec': [0.3]}",
        "-c", "a_begin=0.05",
        "-c", "boxsize=256*Mpc",
        "-c", f"class_params={{'Omega_dcdm': 0.2, "
              f"'Gamma_dcdm': {gamma_kms_mpc}}}",
        "-c", "Omega_cdm=0.07",
        "-c", "boltzmann_options={'modes_per_decade':3,'rtol':1e-4,"
              "'l_max_g':8,'l_max_ur':8,'k_max':1.0}",
        "-c", "powerspec_select={'matter': True}",
        "-c", "bispec_select={'matter': True}",
        "-c", "bispec_options={'configuration': 'equilateral 3'}",
    ])
    assert rc == 0, f"run {tag} failed"
    return out


def test_gr_multispecies_dcdm_suppression(tmp_path):
    out_d = _run(tmp_path, "dcdm", 250.0)   # Γ ≈ 2.6 H0: decays by a=0.3
    out_0 = _run(tmp_path, "nodecay", 0.0)

    # bispectrum written for the matter component
    bis = glob.glob(os.path.join(out_d, "bispec*"))
    assert bis, "no bispectrum written"
    bdata = np.loadtxt(bis[0])
    assert bdata.size and np.all(np.isfinite(bdata))

    def pk(out):
        files = glob.glob(os.path.join(out, "powerspec*a=0.3*"))
        assert files, os.listdir(out)
        d = np.loadtxt(files[0])
        return d[:, 0], d[:, 2]

    k_d, p_d = pk(out_d)
    k_0, p_0 = pk(out_0)
    np.testing.assert_allclose(k_d, k_0)
    # dcdm suppression signature: the decaying run's matter P(k) sits
    # BELOW the Γ=0 twin (identical primordial noise — fixed amplitude)
    # — the energy leaving the clustering dcdm sector slows growth.
    sel = np.isfinite(p_d) & np.isfinite(p_0) & (p_0 > 0)
    ratio = np.median(p_d[sel] / p_0[sel])
    assert ratio < 0.98, f"no dcdm suppression: median P ratio {ratio}"
