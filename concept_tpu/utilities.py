"""In-code utilities reachable via `concept-tpu -u <name> ...`.

Counterpart of reference src/utilities.py (delegate :67, powerspec :465,
info :617, convert :125) and the util/* bash wrappers (SURVEY.md §2
rows 46-47).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from concept_tpu.utils.terminal import masterprint, abort


def delegate(util_args: list[str], cli_args) -> int:
    name, *rest = util_args
    fn = {
        "powerspec": util_powerspec,
        "info": util_info,
        "convert": util_convert,
    }.get(name)
    if fn is None:
        abort(f"unknown utility {name!r} (have: powerspec, info, convert)")
    return fn(rest, cli_args)


def util_info(paths: list[str], cli_args) -> int:
    """Print snapshot metadata (reference utilities.py:617)."""
    from concept_tpu.io import snapshot as snap

    for path in paths:
        kind = snap.snapshot_type(path)
        if kind is None:
            print(f"{path}: not a recognized snapshot")
            continue
        meta, comps = snap.load(path)
        print(f"{path}: {kind} snapshot")
        print(f"  a = {meta.a}, boxsize = {meta.boxsize}, H0 = {meta.H0}")
        print(f"  Ωb = {meta.Omega_b}, Ωcdm = {meta.Omega_cdm}")
        for name, (spec, state) in comps.items():
            print(f"  component {name!r}: species={spec.species}, N={spec.N}, mass={spec.mass}")
    return 0


def util_powerspec(paths: list[str], cli_args) -> int:
    """Measure P(k) of existing snapshots (reference utilities.py:465)."""
    import jax.numpy as jnp
    from concept_tpu.io import snapshot as snap
    from concept_tpu.analysis.powerspec import powerspec
    from concept_tpu.analysis.output import save_powerspec_txt

    for path in paths:
        meta, comps = snap.load(path)
        for name, (spec, state) in comps.items():
            gridsize = 2 * round(spec.N ** (1 / 3))
            pk = powerspec(
                [jnp.asarray(state.pos, jnp.float32)], [1.0],
                gridsize, meta.boxsize, spec.N,
            )
            out = path + f"_powerspec_{name}.txt"
            save_powerspec_txt(out, pk, meta.a, meta.boxsize)
            masterprint(f"Saved {out}")
    return 0


def util_convert(args: list[str], cli_args) -> int:
    """Convert snapshots between formats (reference utilities.py:125).

    usage: -u convert <path> [snapshot_type=gadget|concept]
    """
    from concept_tpu.io import snapshot as snap
    from concept_tpu.units import units

    paths = [a for a in args if "=" not in a]
    opts = dict(a.split("=", 1) for a in args if "=" in a)
    target = opts.get("snapshot_type", "concept")
    for path in paths:
        meta, comps = snap.load(path)
        if target == "gadget":
            (name, (spec, state)), = comps.items()
            out = snap.save_gadget(path + ".gadget", meta, spec, state, units)
        else:
            out = snap.save_concept(path + ".hdf5", meta, comps)
        masterprint(f"Converted {path} → {out}")
    return 0
