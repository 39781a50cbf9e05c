"""Tabulated Boltzmann layer: tables, interpolation, gauges, caching.

Covers reference linear.py's CosmoResults/TransferFunction role
(linear.py:56-1480, 1481-2521, 2730-2870) as mapped to dense (a, k)
tables in cosmology/boltzmann.py.
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.cosmology.boltzmann import (
    TransferTables, tabulate_eh, k_grid_log,
)


@pytest.fixture(scope="module")
def lin():
    bg = Background(H0=67 * units.km / (units.s * units.Mpc), Omega_m=0.31)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96)
    return LinearCosmology(bg=bg, primordial=prim, Omega_b=0.049,
                           Omega_cdm=0.261,
                           light_speed=constants.light_speed, Mpc=units.Mpc)


def test_tabulated_matches_direct_eh(lin):
    """Interpolating the EH-tabulated tables reproduces the direct EH
    transfer to interpolation accuracy at off-grid (k, a)."""
    tables = tabulate_eh(lin)
    k = jnp.asarray(
        np.logspace(-3, 1, 57) / lin.Mpc * 1.0371, jnp.float32
    )  # off the table's grid points
    for a in (0.013, 0.21, 0.87):
        direct = np.asarray(lin.transfer_delta(k, a))
        tab = np.asarray(tables.interp("matter", "delta", k, a))
        rel = np.abs(tab - direct) / np.abs(direct)
        assert rel.max() < 5e-3, rel.max()
        d_t = np.asarray(lin.transfer_theta(k, a))
        t_t = np.asarray(tables.interp("matter", "theta", k, a))
        assert (np.abs(t_t - d_t) / np.abs(d_t)).max() < 5e-3


def test_linear_cosmology_uses_tables(lin):
    """LinearCosmology with tables installed routes through interp."""
    tables = tabulate_eh(lin)
    lin2 = LinearCosmology(bg=lin.bg, primordial=lin.primordial,
                           Omega_b=lin.Omega_b, Omega_cdm=lin.Omega_cdm,
                           light_speed=lin.light_speed, Mpc=lin.Mpc,
                           tables=tables)
    k = jnp.asarray(np.logspace(-2, 0, 11) / lin.Mpc, jnp.float32)
    a = 0.5
    via_tables = np.asarray(lin2.transfer_delta(k, a))
    direct = np.asarray(lin.transfer_delta(k, a))
    assert np.allclose(via_tables, direct, rtol=5e-3)


def test_nbody_gauge_transform(lin):
    """N-body gauge transform semantics (reference linear.py:2791):
    δᴺᵇ = δˢ + 3aH(1+w)/c²·θ_tot/k² — verified against the hand formula
    on synthetic tables, with the k → ∞ limit unchanged."""
    k = k_grid_log(1e-3 / lin.Mpc, 10 / lin.Mpc, 20)
    a = np.logspace(-2, 0, 40)
    Na, Nk = len(a), len(k)
    delta_s = np.outer(a, np.ones(Nk))          # δˢ ∝ a (matter-like)
    theta_tot = -np.outer(a**0.5, k / k[0])     # arbitrary smooth shape
    tabs = TransferTables(
        k=k, a=a,
        tables={("matter", "delta"): delta_s},
        aux={"theta_tot": theta_tot},
        gauge="synchronous",
    )
    c = constants.light_speed
    nb = tabs.to_gauge("nbody", lin.bg, c)
    got = nb.tables[("matter", "delta")]
    H = np.asarray([float(lin.bg.hubble_np(ai)) for ai in a])
    expected = delta_s + (3 * a * H / c**2)[:, None] * theta_tot / k[None, :] ** 2
    np.testing.assert_allclose(got, expected, rtol=1e-12)
    # gauge correction decays as k⁻²: negligible at the high-k end
    corr = np.abs(got - delta_s) / np.abs(delta_s)
    assert corr[:, -1].max() < corr[:, 0].min()


def test_tables_save_load_roundtrip(tmp_path, lin):
    from concept_tpu.cosmology.class_bridge import save_tables, load_tables

    tables = tabulate_eh(lin, a=np.logspace(-2, 0, 10))
    path = str(tmp_path / "tables.npz")
    save_tables(tables, path)
    back = load_tables(path)
    assert back.gauge == tables.gauge
    np.testing.assert_allclose(back.k, tables.k)
    for key, tab in tables.tables.items():
        np.testing.assert_allclose(back.tables[key], tab)
    np.testing.assert_allclose(back.aux["theta_tot"], tables.aux["theta_tot"])


def test_class_bridge_with_fake_classy(tmp_path, monkeypatch, lin):
    """ClassBridge plumbing (params → tables → cache) without classy:
    a stub classy module supplies synthetic CLASS-like transfer dicts."""
    k_hmpc = np.logspace(-3, 0, 32)

    class FakeClass:
        def set(self, params):
            self.params = params

        def compute(self):
            pass

        def h(self):
            return 0.67

        def sigma8(self):
            return 0.8

        def get_transfer(self, z=0.0):
            aa = 1.0 / (1 + z)
            return {
                "k (h/Mpc)": k_hmpc,
                "d_tot": -aa * (k_hmpc / k_hmpc[0]) ** 0.5,
                "d_cdm": -aa * (k_hmpc / k_hmpc[0]) ** 0.5 * 1.02,
                "t_tot": -(aa**0.5) * k_hmpc,
                "h_prime": aa * k_hmpc**2,
            }

        def get_background(self):
            z = np.linspace(0, 99, 100)
            return {"z": z, "proper time [Gyr]": 14 / (1 + z) ** 1.5,
                    "H [1/Mpc]": 2.2e-4 * (1 + z) ** 1.5}

    fake = types.ModuleType("classy")
    fake.Class = FakeClass
    monkeypatch.setitem(sys.modules, "classy", fake)
    import concept_tpu.utils.cache as cache_mod

    monkeypatch.setattr(cache_mod, "CACHE_ROOT", str(tmp_path), raising=False)

    from concept_tpu.cosmology import class_bridge
    assert class_bridge.available()
    bridge = class_bridge.ClassBridge({"H0": 67.0})
    bridge._cache_file = str(tmp_path / "class_test")
    tables = bridge.build_tables(lin, a=np.logspace(-1, 0, 8))
    assert tables.has("matter", "delta")
    assert tables.has("cdm", "delta")
    assert "theta_tot" in tables.aux and "h_prime" in tables.aux
    # expected unit conversion: k = k_hmpc · h / Mpc
    np.testing.assert_allclose(tables.k, k_hmpc * 0.67 / lin.Mpc, rtol=1e-12)
    # cache hit returns identical tables without recompute
    import os
    assert os.path.exists(bridge._cache_file + ".npz")
    again = bridge.build_tables(lin, a=np.logspace(-1, 0, 8))
    np.testing.assert_allclose(again.tables[("matter", "delta")],
                               tables.tables[("matter", "delta")])
    # the N-body gauge path runs on CLASS-shaped tables (θ + hʹ present)
    nb = tables.to_gauge("nbody", lin.bg, constants.light_speed)
    assert nb.gauge == "nbody"
    assert nb.has("matter", "theta")


def test_metric_and_lapse_species_construction(lin):
    """Fictitious metric/lapse species δ from metric perturbation tables
    (reference construct_delta_metric/lapse, linear.py:845-985): verified
    against the hand formulas on synthetic H_Tʹ/φ/ψ/θ_tot tables."""
    from concept_tpu.cosmology.boltzmann import (
        TransferTables, construct_metric_delta, construct_lapse_delta,
        k_grid_log,
    )

    k = k_grid_log(1e-3 / lin.Mpc, 1.0 / lin.Mpc, 12)
    a = np.logspace(-2, 0, 30)
    Na, Nk = len(a), len(k)
    rng = np.random.default_rng(0)
    HT = np.outer(a, k)  # smooth synthetic H_Tʹ(a, k)
    phi = np.outer(np.ones(Na), 1 / k**2)
    psi = 0.9 * phi
    theta = -np.outer(a**0.5, k)
    tabs = TransferTables(k=k, a=a, tables={},
                          aux={"H_T_prime": HT, "phi": phi, "psi": psi,
                               "theta_tot": theta})
    G = constants.G_Newton
    c = constants.light_speed
    rho_m = 1.7
    construct_metric_delta(tabs, lin.bg, G, c, rho_m)
    assert tabs.has("metric", "delta")
    # hand formula at one (a, k) point (interior, away from edges)
    ia, ik = 10, 5
    H = float(lin.bg.hubble_np(a[ia]))
    dHT_da = np.gradient(HT, a, axis=0)[ia, ik]
    k2g = -a[ia] * H * (a[ia] * dHT_da + HT[ia, ik]) + k[ik] ** 2 * (
        phi[ia, ik] - psi[ia, ik]
    )
    rho_bar = rho_m / a[ia] ** 3
    expect = k2g / (4 * np.pi * G * a[ia] ** 2 * rho_bar)
    expect -= 3 * a[ia] * H / c**2 * theta[ia, ik] / k[ik] ** 2
    np.testing.assert_allclose(tabs.tables[("metric", "delta")][ia, ik],
                               expect, rtol=1e-12)
    construct_lapse_delta(tabs, lin.bg, G, c, rho_m)
    assert tabs.has("lapse", "delta")
    assert np.isfinite(tabs.tables[("lapse", "delta")]).all()


def test_newtonian_gauge_transform_identities():
    """Synchronous → Newtonian (MB95 eq. 27): θ_N(cdm) = c²k²α exactly
    (θ_s(cdm) ≡ 0), δ_N − δ_s = 3ℋ(1+w)α per species, σ invariant."""
    import numpy as np
    from concept_tpu.cosmology.boltzmann import TransferTables
    from concept_tpu.cosmology.background import Background
    from concept_tpu.units import units

    rng = np.random.default_rng(0)
    a = np.linspace(0.1, 1.0, 8)
    k = np.array([0.01, 0.1, 1.0])
    c = 299.792458  # Mpc/Gyr-ish scale; any consistent value works
    alpha = rng.random((8, 3))
    tables = {
        ("cdm", "delta"): rng.random((8, 3)),
        ("cdm", "theta"): np.zeros((8, 3)),
        ("photon", "delta"): rng.random((8, 3)),
        ("photon", "sigma"): rng.random((8, 3)),
    }
    tt = TransferTables(k=k, a=a, tables={kk: v.copy() for kk, v in tables.items()},
                        aux={"alpha": alpha}, gauge="synchronous")
    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.3)
    out = tt.to_gauge("newtonian", bg, c,
                      w_of_a={"photon": lambda ai: 1.0 / 3.0})
    assert out.gauge == "newtonian"
    aH = np.asarray([ai * float(bg.hubble_np(ai)) for ai in a])
    np.testing.assert_allclose(
        out.tables[("cdm", "theta")], c**2 * k[None, :] ** 2 * alpha,
        rtol=1e-12)
    np.testing.assert_allclose(
        out.tables[("cdm", "delta")] - tables[("cdm", "delta")],
        3.0 * aH[:, None] * alpha, rtol=1e-12)
    np.testing.assert_allclose(
        out.tables[("photon", "delta")] - tables[("photon", "delta")],
        3.0 * aH[:, None] * (4.0 / 3.0) * alpha, rtol=1e-12)
    np.testing.assert_allclose(out.tables[("photon", "sigma")],
                               tables[("photon", "sigma")], rtol=0)
