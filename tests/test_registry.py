"""Interaction registry tests (reference interactions.py:2456-2827)."""

import pytest

from concept_tpu.components import ComponentSpec
from concept_tpu.forces.registry import find_interactions, register, get, registered


def test_builtin_forces_registered():
    reg = registered()
    assert "gravity" in reg and "lapse" in reg
    assert "p3m" in reg["gravity"].methods


def test_find_interactions_grouping():
    a = ComponentSpec(name="a", species="matter", forces=(("gravity", "p3m"),))
    b = ComponentSpec(name="b", species="cdm", forces=(("gravity", "p3m"),))
    c = ComponentSpec(name="c", species="neutrino", forces=(("gravity", "pm"),))
    out = find_interactions([a, b, c])
    assert len(out) == 2
    (f1, m1, recv1, _), (f2, m2, recv2, _) = out
    assert {m1, m2} == {"p3m", "pm"}
    p3m_group = recv1 if m1 == "p3m" else recv2
    assert {s.name for s in p3m_group} == {"a", "b"}


def test_find_interactions_range_split():
    a = ComponentSpec(name="a", species="matter", forces=(("gravity", "p3m"),))
    c = ComponentSpec(name="c", species="x", forces=(("gravity", "ppnonperiodic"),))
    long = find_interactions([a, c], "long-range")
    short = find_interactions([a, c], "short-range")
    assert [m for _, m, _, _ in long] == ["p3m"]
    assert sorted(m for _, m, _, _ in short) == ["p3m", "ppnonperiodic"]


def test_unknown_method_rejected():
    bad = ComponentSpec(name="z", species="matter", forces=(("gravity", "tree"),))
    with pytest.raises(ValueError):
        find_interactions([bad])
