"""Snapshot I/O round-trip tests (reference format parity: snapshot.py:53-638
CONCEPT-HDF5, :639-2642 GADGET)."""

import numpy as np
import jax.numpy as jnp
import pytest

from concept_tpu.units import units
from concept_tpu.components import ComponentSpec, ParticleState
from concept_tpu.io import snapshot as snap


@pytest.fixture
def example(tmp_path):
    rng = np.random.default_rng(5)
    N = 100
    box = 64 * units.Mpc
    spec = ComponentSpec(name="matter", species="matter", N=N, mass=7.5)
    state = ParticleState(
        pos=jnp.asarray(rng.uniform(0, box, (N, 3)).astype(np.float32)),
        mom=jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32)),
        ids=jnp.arange(N, dtype=jnp.int32),
    )
    meta = snap.SnapshotMeta(
        a=0.5, boxsize=box,
        H0=67 * units.km / (units.s * units.Mpc),
        Omega_b=0.049, Omega_cdm=0.27,
    )
    return tmp_path, meta, spec, state


def test_concept_roundtrip(example):
    tmp, meta, spec, state = example
    fn = snap.save_concept(str(tmp / "snap.hdf5"), meta, {"matter": (spec, state)})
    assert snap.snapshot_type(fn) == "concept"
    meta2, comps = snap.load_concept(fn)
    spec2, state2 = comps["matter"]
    assert spec2.N == spec.N
    assert np.isclose(spec2.mass, spec.mass)
    assert np.isclose(meta2.a, meta.a)
    np.testing.assert_allclose(state2.pos, np.asarray(state.pos), rtol=1e-6)
    np.testing.assert_allclose(state2.mom, np.asarray(state.mom), rtol=1e-6)
    np.testing.assert_array_equal(state2.ids, np.asarray(state.ids))


@pytest.mark.parametrize("snapformat", [1, 2])
def test_gadget_roundtrip(example, snapformat):
    tmp, meta, spec, state = example
    fn = snap.save_gadget(
        str(tmp / f"gadget_{snapformat}"), meta, spec, state, units,
        snapformat=snapformat,
    )
    assert snap.snapshot_type(fn) == "gadget"
    meta2, comps = snap.load_gadget(fn, units)
    (spec2, state2), = comps.values()
    assert spec2.N == spec.N
    assert np.isclose(spec2.mass, spec.mass, rtol=1e-6)
    assert np.isclose(meta2.a, meta.a)
    assert np.isclose(meta2.boxsize, meta.boxsize, rtol=1e-6)
    np.testing.assert_allclose(state2.pos, np.asarray(state.pos), rtol=1e-5)
    # momentum round-trips through the u = v/√a velocity convention
    np.testing.assert_allclose(
        state2.mom, np.asarray(state.mom), rtol=1e-4, atol=1e-6
    )


def test_dispatch_load(example):
    tmp, meta, spec, state = example
    fn = snap.save_concept(str(tmp / "c.hdf5"), meta, {"matter": (spec, state)})
    meta2, comps = snap.load(fn)
    assert "matter" in comps
