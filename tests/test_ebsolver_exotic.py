"""Exotic species in the internal Einstein-Boltzmann solver: CPL
dark-energy fluid (w0/wa, c_s²=1), decaying cold dark matter and its
dark radiation (density-weighted G_l hierarchy), curvature in H(a).

Reference obtains all of these from CLASS via class_params
(linear.py:3517-3595); here they are solved by cosmology/ebsolver.py.
"""

import math

import numpy as np
import pytest

from concept_tpu.cosmology.ebsolver import (
    EBParams, EBSolver, EBBackground, solve_tables,
)

H = 0.67
OB, OCDM = 0.049, 0.27
A_OUT = np.logspace(-3, 0, 48)
H0_MPC = H / 2997.92458  # 1/Mpc


def _growth(rows, j, a_from=0.1):
    i0 = int(np.argmin(np.abs(A_OUT - a_from)))
    return rows["d_cdm"][-1, j] / rows["d_cdm"][i0, j]


def test_fld_suppresses_growth():
    """w0 = −0.5 fluid was denser in the past than Λ ⇒ subhorizon growth
    a = 0.1 → 1 is suppressed vs ΛCDM (this is the 'P(k) shifts in the
    right direction' check of the verdict)."""
    ks = np.array([0.05])
    p_l = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM)
    p_f = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM,
                   Omega_fld=1 - OB - OCDM - 0.0, w0_fld=-0.5)
    # Omega_fld replaces Λ entirely (flat closure puts Ω_Λ ≈ tiny rad gap)
    r_l = solve_tables(p_l, ks, a_out=A_OUT, rtol=1e-4)
    r_f = solve_tables(p_f, ks, a_out=A_OUT, rtol=1e-4)
    g_l = _growth(r_l, 0)
    g_f = _growth(r_f, 0)
    assert g_f < 0.97 * g_l, (g_f, g_l)


def test_fld_near_lambda_matches_lcdm():
    """w0 = −0.999 fluid is indistinguishable from Λ to < 1%."""
    ks = np.array([0.05])
    p_l = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM)
    p_f = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM,
                   Omega_fld=1 - OB - OCDM, w0_fld=-0.999)
    r_l = solve_tables(p_l, ks, a_out=A_OUT, rtol=1e-4)
    r_f = solve_tables(p_f, ks, a_out=A_OUT, rtol=1e-4)
    np.testing.assert_allclose(
        r_f["d_cdm"][-1], r_l["d_cdm"][-1], rtol=1e-2
    )


def test_dcdm_background_invariant():
    """EBBackground dcdm sector: u(a) = u_i·e^{−Γ·t(a)} exactly (proper
    time t by quadrature of dt = dlna/H), and flat closure."""
    Gamma = 3 * H0_MPC
    bg = EBBackground(EBParams(h=H, Omega_b=OB, Omega_cdm=0.22,
                               Omega_dcdm=0.05, Gamma_dcdm=Gamma))
    assert bg.Omega_dr > 1e-3
    total = (bg.Omega_m + bg.Omega_g + bg.Omega_ur + bg.Omega_L
             + bg.p.Omega_dcdm + bg.Omega_dr)
    assert total == pytest.approx(1.0, abs=1e-8)
    # proper time between a1, a2
    a1, a2 = 0.05, 1.0
    lna = np.linspace(math.log(a1), math.log(a2), 20001)
    t12 = np.trapezoid([1.0 / bg.H(math.exp(x)) for x in lna], lna)
    assert bg.u_dcdm(a2) / bg.u_dcdm(a1) == pytest.approx(
        math.exp(-Gamma * t12), rel=1e-3
    )


def test_dcdm_small_gamma_matches_lcdm():
    """Γ → 0 dcdm is just more CDM (δ_dcdm ≡ δ_cdm, background a⁻³)."""
    ks = np.array([0.05])
    p_l = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM)
    p_d = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM - 0.05,
                   Omega_dcdm=0.05, Gamma_dcdm=1e-9)
    r_l = solve_tables(p_l, ks, a_out=A_OUT, rtol=1e-4)
    r_d = solve_tables(p_d, ks, a_out=A_OUT, rtol=1e-4)
    np.testing.assert_allclose(
        r_d["d_cdm"][-1], r_l["d_cdm"][-1], rtol=1e-2
    )
    np.testing.assert_allclose(r_d["d_dcdm"], r_d["d_cdm"], rtol=1e-12)


def test_dcdm_decay_mode_physics():
    """Strong decay (Γ ≈ 3H0): the dr transfer functions are physical —
    superhorizon ℛ stays conserved, δ_dr is finite and tracks δ_dcdm
    direction, σ_dr small vs δ_dr, and growth is SUPPRESSED vs a no-decay
    cosmology with the SAME EARLY matter content (matched u(a→0): fixing
    Ω_dcdm TODAY instead would compare different pasts — the decaying
    universe then had more matter AND has less Λ, which wins)."""
    Gamma = 3 * H0_MPC
    ks = np.array([1e-4, 0.05])
    p_d = EBParams(h=H, Omega_b=OB, Omega_cdm=0.22,
                   Omega_dcdm=0.05, Gamma_dcdm=Gamma)
    r_d = solve_tables(p_d, ks, a_out=A_OUT, rtol=1e-4)
    # superhorizon curvature conservation survives the decay sector
    R = r_d["R_com"][:, 0]
    assert np.all(np.abs(R + 1.0) < 2e-2), np.max(np.abs(R + 1.0))
    # dr exists and is finite at late times on the subhorizon mode
    d_dr = r_d["d_dr"][-1, 1]
    d_dc = r_d["d_dcdm"][-1, 1]
    assert np.isfinite(d_dr)
    assert d_dr * d_dc > 0  # same sign
    assert abs(d_dr) < abs(d_dc)  # radiation clusters less than matter
    # shear is a sub-dominant moment
    assert abs(r_d["s_dr"][-1, 1]) < abs(d_dr)
    # matched-early-matter comparison: non-decaying twin carries the
    # decaying sector's EARLY comoving density u(a→0) as plain CDM
    u_early = EBBackground(p_d).u_dcdm(1e-6)
    p_0 = EBParams(h=H, Omega_b=OB, Omega_cdm=0.22 + u_early)
    r_0 = solve_tables(p_0, ks[1:], a_out=A_OUT, rtol=1e-4)
    g_d = _growth(r_d, 1)
    g_0 = _growth(r_0, 0)
    assert g_d < g_0, (g_d, g_0)


def test_curvature_in_eb_background():
    """Ω_k enters H(a) (flat-perturbation approximation documented)."""
    p = EBParams(h=H, Omega_b=OB, Omega_cdm=OCDM, Omega_k=0.03)
    bg = EBBackground(p)
    a = 0.5
    E2_no_k = ((bg.Omega_g + bg.Omega_ur) / a**4 + bg.Omega_m / a**3
               + bg.Omega_L)
    assert bg.H(a) == pytest.approx(
        bg.H0 * math.sqrt(E2_no_k + 0.03 / a**2), rel=1e-12
    )
    assert bg.Omega_L == pytest.approx(
        1 - bg.Omega_m - bg.Omega_g - bg.Omega_ur - 0.03, abs=1e-12
    )
