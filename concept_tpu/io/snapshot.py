"""Snapshot I/O: CONCEPT-HDF5 and GADGET-2 formats (TIPSY read planned).

TPU-native counterpart of reference src/snapshot.py (ConceptSnapshot :53,
GadgetSnapshot :639, type autodetect :3206, save/load :3045/3120).
Host-side (NumPy/h5py); device arrays are pulled once per dump.  The
CONCEPT-HDF5 layout is byte-compatible with the reference
(snapshot.py:136-288): root attrs {'unit time','unit length','unit mass',
'H0','a','boxsize','Ωb','Ωcdm'}, groups components/<name> with attrs
{'species','mass','N'} and datasets pos/mom (N,3) float64, optional ids.

Momentum conventions:
  CONCEPT: mom = a²·m·ẋ (internal = file)
  GADGET-2: file stores u with peculiar velocity v = u·√a
            (reference snapshot.py:639-2642 handles the same factors)
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass, field

import numpy as np

from concept_tpu.components import ComponentSpec, ParticleState


@dataclass
class SnapshotMeta:
    a: float
    boxsize: float
    H0: float
    Omega_b: float
    Omega_cdm: float
    unit_length: str = "Mpc"
    unit_time: str = "Gyr"
    unit_mass: str = "10**10 m_sun"


# --------------------------------------------------------------------- #
# CONCEPT HDF5
# --------------------------------------------------------------------- #
def save_concept(filename: str, meta: SnapshotMeta, components: dict,
                 select: dict | None = None):
    """components: {name: (ComponentSpec, ParticleState | FluidState)}.

    Particle components store pos/mom(/ids); fluid components store the
    Boltzmann-hierarchy grids ϱ/J(/𝒫/ς) (reference ConceptSnapshot fluid
    datasets, snapshot.py:130-638).  ``select`` is the snapshot_select
    save mask: {component name: {variable: bool}} (reference
    snapshot_select semantics, param/example_explanatory:37-57).
    """
    import h5py

    def want(name, var):
        if not select:
            return True
        sel = select.get(name, select.get("all", True))
        if isinstance(sel, dict):
            return bool(sel.get(var, sel.get("all", True)))
        return bool(sel)

    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with h5py.File(filename, "w") as f:
        f.attrs["unit time"] = meta.unit_time
        f.attrs["unit length"] = meta.unit_length
        f.attrs["unit mass"] = meta.unit_mass
        f.attrs["H0"] = meta.H0
        f.attrs["a"] = meta.a
        f.attrs["boxsize"] = meta.boxsize
        f.attrs["Ωb"] = meta.Omega_b
        f.attrs["Ωcdm"] = meta.Omega_cdm
        for name, (spec, state) in components.items():
            g = f.create_group(f"components/{name}")
            g.attrs["species"] = spec.species
            if getattr(spec, "representation", "particles") == "fluid" or not hasattr(state, "pos"):
                g.attrs["gridsize"] = spec.gridsize or np.asarray(state.varrho).shape[0]
                g.attrs["boltzmann_order"] = spec.boltzmann_order
                g.attrs["boltzmann_closure"] = spec.boltzmann_closure
                g.attrs["w"] = spec.w
                if want(name, "ϱ"):
                    g.create_dataset("ϱ", data=np.asarray(state.varrho, dtype=np.float64))
                if state.J is not None and want(name, "J"):
                    g.create_dataset("J", data=np.asarray(state.J, dtype=np.float64))
                if state.P is not None and want(name, "𝒫"):
                    g.create_dataset("𝒫", data=np.asarray(state.P, dtype=np.float64))
                if state.sigma is not None and want(name, "ς"):
                    g.create_dataset("ς", data=np.asarray(state.sigma, dtype=np.float64))
                continue
            g.attrs["mass"] = spec.mass
            g.attrs["N"] = spec.N
            if want(name, "pos"):
                g.create_dataset("pos", data=np.asarray(state.pos, dtype=np.float64))
            if want(name, "mom"):
                g.create_dataset("mom", data=np.asarray(state.mom, dtype=np.float64))
            if state.ids is not None and want(name, "ids"):
                g.create_dataset("ids", data=np.asarray(state.ids, dtype=np.int64))
            if getattr(state, "rungs", None) is not None and want(name, "rungs"):
                # rung indices (autosave exactness: a resumed run keeps
                # its adaptive-rung populations instead of re-probing)
                g.create_dataset("rungs", data=np.asarray(state.rungs,
                                                          dtype=np.int8))
    return filename


def load_concept(filename: str):
    import h5py

    components = {}
    with h5py.File(filename, "r") as f:
        meta = SnapshotMeta(
            a=float(f.attrs["a"]),
            boxsize=float(f.attrs["boxsize"]),
            H0=float(f.attrs["H0"]),
            Omega_b=float(f.attrs["Ωb"]),
            Omega_cdm=float(f.attrs["Ωcdm"]),
            unit_length=str(f.attrs.get("unit length", "Mpc")),
            unit_time=str(f.attrs.get("unit time", "Gyr")),
            unit_mass=str(f.attrs.get("unit mass", "10**10 m_sun")),
        )
        for name, g in f["components"].items():
            if "gridsize" in g.attrs:  # fluid component
                from concept_tpu.components import FluidState

                spec = ComponentSpec(
                    name=name,
                    species=str(g.attrs["species"]),
                    representation="fluid",
                    gridsize=int(g.attrs["gridsize"]),
                    w=float(g.attrs.get("w", 0.0)),
                    boltzmann_order=int(g.attrs.get("boltzmann_order", 1)),
                    boltzmann_closure=str(g.attrs.get("boltzmann_closure",
                                                      "truncate")),
                )
                state = FluidState(
                    varrho=np.asarray(g["ϱ"], dtype=np.float64),
                    J=np.asarray(g["J"], dtype=np.float64) if "J" in g else None,
                    P=np.asarray(g["𝒫"], dtype=np.float64) if "𝒫" in g else None,
                    sigma=np.asarray(g["ς"], dtype=np.float64) if "ς" in g else None,
                )
                components[name] = (spec, state)
                continue
            spec = ComponentSpec(
                name=name,
                species=str(g.attrs["species"]),
                N=int(g.attrs["N"]),
                mass=float(g.attrs["mass"]),
            )
            state = ParticleState(
                pos=np.asarray(g["pos"], dtype=np.float64),
                mom=np.asarray(g["mom"], dtype=np.float64),
                ids=np.asarray(g["ids"]) if "ids" in g else None,
                rungs=np.asarray(g["rungs"]) if "rungs" in g else None,
            )
            components[name] = (spec, state)
    return meta, components


def is_concept_snapshot(filename: str) -> bool:
    try:
        import h5py

        with h5py.File(filename, "r") as f:
            return "Ωcdm" in f.attrs
    except Exception:
        return False


# --------------------------------------------------------------------- #
# GADGET-2
# --------------------------------------------------------------------- #
_GADGET_HEADER = struct.Struct("<6I6dddii6Iiiddddii6Ii60x")  # 256 bytes


def _gadget_header_bytes(npart, masses, time, redshift, boxsize,
                         omega0, omega_lambda, hubble_param, num_files=1,
                         nall=None, overrides: dict | None = None):
    """``overrides``: reference gadget_snapshot_params['header'] field
    overrides by GADGET header-field name (snapshot.py:673-702)."""
    nall_arr = list(npart)
    if nall is not None:
        nall_arr = [0, int(nall), 0, 0, 0, 0]
    fields = {
        "Time": time, "Redshift": redshift, "BoxSize": boxsize,
        "Omega0": omega0, "OmegaLambda": omega_lambda,
        "HubbleParam": hubble_param, "NumFilesPerSnapshot": num_files,
        "FlagSfr": 0, "FlagFeedback": 0, "FlagCooling": 0,
        "FlagAge": 0, "FlagMetals": 0, "FlagEntropyICs": 0,
    }
    for key, val in (overrides or {}).items():
        if key not in fields:
            raise ValueError(f"unknown GADGET header field {key!r}")
        fields[key] = val
    return _GADGET_HEADER.pack(
        *npart, *masses, fields["Time"], fields["Redshift"],
        fields["FlagSfr"], fields["FlagFeedback"], *nall_arr,
        fields["FlagCooling"], fields["NumFilesPerSnapshot"],
        fields["BoxSize"], fields["Omega0"], fields["OmegaLambda"],
        fields["HubbleParam"], fields["FlagAge"], fields["FlagMetals"],
        *([0] * 6), fields["FlagEntropyICs"],
    )


def save_gadget(
    filename: str,
    meta: SnapshotMeta,
    spec: ComponentSpec,
    state: ParticleState,
    units,
    snapformat: int = 2,
    single_precision: bool = True,
    num_files: int = 1,
    nall: int | None = None,
    header_overrides: dict | None = None,
):
    """Write a GADGET-2 snapshot (particle type 1 = halo/cdm).

    GADGET units: kpc/h (length), 1e10 m_sun/h (mass), km/s (velocity,
    u = v_peculiar/√a).  Reference: snapshot.py:639-2642.
    """
    h = meta.H0 / (100 * units.km / (units.s * units.Mpc))
    kpc_h = units.kpc / h
    msun10_h = 1e10 * units.m_sun / h
    kms = units.km / units.s
    a = meta.a
    dtype = np.float32 if single_precision else np.float64

    pos = np.asarray(state.pos, np.float64) / kpc_h
    # u = v_pec/√a = mom/(a^1.5 m)
    vel = np.asarray(state.mom, np.float64) / (a**1.5 * spec.mass) / kms
    ids = (
        np.asarray(state.ids, np.uint32)
        if state.ids is not None
        else np.arange(spec.N, dtype=np.uint32)
    )
    npart = [0, spec.N, 0, 0, 0, 0]
    masses = [0.0, spec.mass / msun10_h, 0.0, 0.0, 0.0, 0.0]
    header = _gadget_header_bytes(
        npart, masses, a, 1 / a - 1, meta.boxsize / kpc_h,
        meta.Omega_b + meta.Omega_cdm,
        1 - meta.Omega_b - meta.Omega_cdm, h,
        num_files=num_files, nall=nall if nall is not None else spec.N,
        overrides=header_overrides,
    )

    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "wb") as f:
        def block(name, payload):
            if snapformat == 2:
                f.write(struct.pack("<I", 8))
                f.write(name.encode().ljust(4))
                f.write(struct.pack("<I", len(payload) + 8))
                f.write(struct.pack("<I", 8))
            f.write(struct.pack("<I", len(payload)))
            f.write(payload)
            f.write(struct.pack("<I", len(payload)))

        block("HEAD", header)
        block("POS ", pos.astype(dtype).tobytes())
        block("VEL ", vel.astype(dtype).tobytes())
        block("ID  ", ids.tobytes())
    return filename


def save_gadget_components(
    filename: str,
    meta: SnapshotMeta,
    comps: dict,
    units,
    types: dict | None = None,
    snapformat: int = 2,
    single_precision: bool = True,
):
    """Write a GADGET-2 snapshot holding MULTIPLE particle components as
    distinct GADGET particle types (reference snapshot.py GADGET type
    machinery; gadget_snapshot_params dict maps components→types).

    comps: {name: (ComponentSpec, ParticleState)} — particle components
    only.  ``types``: optional {name: gadget_type 0-5}; defaults to
    type 1 (halo) for the first/matter component and 2, 3, 4, 5 for the
    rest in order.  POS/VEL/ID blocks are concatenated in type order.
    """
    h = meta.H0 / (100 * units.km / (units.s * units.Mpc))
    kpc_h = units.kpc / h
    msun10_h = 1e10 * units.m_sun / h
    kms = units.km / units.s
    a = meta.a
    dtype = np.float32 if single_precision else np.float64

    if types is None:
        types = {}
        pool = [1, 2, 3, 4, 5, 0]
        for name, (spec, _) in comps.items():
            types[name] = pool.pop(0)
    by_type = sorted(comps.items(), key=lambda kv: types[kv[0]])
    npart = [0] * 6
    masses = [0.0] * 6
    pos_parts, vel_parts, id_parts = [], [], []
    id_offset = 0
    for name, (spec, state) in by_type:
        t = types[name]
        npart[t] = spec.N
        masses[t] = spec.mass / msun10_h
        pos_parts.append(np.asarray(state.pos, np.float64) / kpc_h)
        vel_parts.append(
            np.asarray(state.mom, np.float64) / (a**1.5 * spec.mass) / kms
        )
        ids = (
            np.asarray(state.ids, np.uint32)
            if state.ids is not None
            else np.arange(id_offset, id_offset + spec.N, dtype=np.uint32)
        )
        id_parts.append(ids)
        id_offset += spec.N
    header = _gadget_header_bytes(
        npart, masses, a, 1 / a - 1, meta.boxsize / kpc_h,
        meta.Omega_b + meta.Omega_cdm,
        1 - meta.Omega_b - meta.Omega_cdm, h,
        num_files=1, nall=None,
    )
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "wb") as f:
        def block(name, payload):
            if snapformat == 2:
                f.write(struct.pack("<I", 8))
                f.write(name.encode().ljust(4))
                f.write(struct.pack("<I", len(payload) + 8))
                f.write(struct.pack("<I", 8))
            f.write(struct.pack("<I", len(payload)))
            f.write(payload)
            f.write(struct.pack("<I", len(payload)))

        block("HEAD", header)
        block("POS ", np.concatenate(pos_parts).astype(dtype).tobytes())
        block("VEL ", np.concatenate(vel_parts).astype(dtype).tobytes())
        block("ID  ", np.concatenate(id_parts).tobytes())
    return filename


def save_gadget_multifile(filename_base: str, meta: SnapshotMeta,
                          spec: ComponentSpec, state: ParticleState, units,
                          particles_per_file: int, snapformat: int = 2,
                          single_precision: bool = True,
                          header_overrides: dict | None = None):
    """Split a component over snapshot.0, snapshot.1, ... files
    (reference multi-file GADGET snapshots, snapshot.py:639-2642;
    gadget_snapshot_params['particles per file'])."""
    import numpy as np

    N = spec.N
    n_files = max(1, -(-N // particles_per_file))
    pos = np.asarray(state.pos)
    mom = np.asarray(state.mom)
    ids = np.asarray(state.ids) if state.ids is not None else np.arange(N)
    files = []
    for i in range(n_files):
        sl = slice(i * particles_per_file, min((i + 1) * particles_per_file, N))
        n_i = sl.stop - sl.start
        sub_spec = ComponentSpec(
            name=spec.name, species=spec.species, N=n_i, mass=spec.mass,
        )
        sub_state = ParticleState(pos=pos[sl], mom=mom[sl], ids=ids[sl])
        fn = f"{filename_base}.{i}" if n_files > 1 else filename_base
        save_gadget(fn, meta, sub_spec, sub_state, units,
                    snapformat=snapformat, single_precision=single_precision,
                    num_files=n_files, nall=N,
                    header_overrides=header_overrides)
        files.append(fn)
    return files


def load_gadget_multifile(filename_base: str, units):
    """Load snapshot.0, .1, ... and concatenate."""
    import numpy as np

    files = []
    i = 0
    while os.path.exists(f"{filename_base}.{i}"):
        files.append(f"{filename_base}.{i}")
        i += 1
    if not files:
        return load_gadget(filename_base, units)
    metas, poss, moms, idss = None, [], [], []
    spec0 = None
    for fn in files:
        meta, comps = load_gadget(fn, units)
        (name, (spec, state)), = comps.items()
        metas = meta
        spec0 = spec
        poss.append(np.asarray(state.pos))
        moms.append(np.asarray(state.mom))
        idss.append(np.asarray(state.ids))
    N = sum(len(p) for p in poss)
    spec = ComponentSpec(name=spec0.name, species=spec0.species, N=N,
                         mass=spec0.mass)
    state = ParticleState(
        pos=np.concatenate(poss), mom=np.concatenate(moms),
        ids=np.concatenate(idss),
    )
    return metas, {spec.name: (spec, state)}


def load_gadget(filename: str, units):
    """Read a GADGET-2 snapshot (SnapFormat 1 or 2, single file)."""
    with open(filename, "rb") as f:
        raw = f.read()
    off = 0

    def read_block():
        nonlocal off
        size = struct.unpack_from("<I", raw, off)[0]
        off += 4
        name = None
        if size == 8:  # SnapFormat 2 marker
            name = raw[off : off + 4].decode().strip()
            off += 8 + 4  # name + next-size + trailing marker size
            size = struct.unpack_from("<I", raw, off)[0]
            off += 4
        payload = raw[off : off + size]
        off += size
        tail = struct.unpack_from("<I", raw, off)[0]
        off += 4
        assert tail == size, "corrupt GADGET block"
        return name, payload

    name, header = read_block()
    vals = _GADGET_HEADER.unpack(header.ljust(256, b"\0")[:_GADGET_HEADER.size])
    npart = vals[0:6]
    masses = vals[6:12]
    time_, redshift = vals[12], vals[13]
    # layout: ...Nall(16-21) FlagCooling(22) NumFiles(23) BoxSize(24)
    # Omega0(25) OmegaLambda(26) HubbleParam(27)
    boxsize_g, omega0, omega_lambda, hubble = vals[24], vals[25], vals[26], vals[27]
    N = int(sum(npart))
    name, pos_raw = read_block()
    name, vel_raw = read_block()
    name, ids_raw = read_block()
    per = len(pos_raw) // (3 * N)
    fdtype = np.float32 if per == 4 else np.float64
    pos = np.frombuffer(pos_raw, fdtype).reshape(N, 3).astype(np.float64)
    vel = np.frombuffer(vel_raw, fdtype).reshape(N, 3).astype(np.float64)
    ids = np.frombuffer(ids_raw, np.uint32 if len(ids_raw) == 4 * N else np.uint64)
    # MASS block: present iff any populated type has header mass 0 —
    # it then carries individual masses for exactly those particles, in
    # type order (GADGET-2 format; reference snapshot.py:639-2642
    # handles per-particle masses the same way)
    n_mass = sum(int(npart[t]) for t in range(6)
                 if npart[t] and masses[t] == 0)
    mass_arr = None
    if n_mass:
        _, mass_raw = read_block()
        mdtype = np.float32 if len(mass_raw) == 4 * n_mass else np.float64
        mass_arr = np.frombuffer(mass_raw, mdtype).astype(np.float64)
        assert mass_arr.size == n_mass, (mass_arr.size, n_mass)

    h = hubble
    kpc_h = units.kpc / h
    msun10_h = 1e10 * units.m_sun / h
    kms = units.km / units.s
    a = time_
    H0 = 100 * h * units.km / (units.s * units.Mpc)
    meta = SnapshotMeta(
        a=a, boxsize=boxsize_g * kpc_h, H0=H0,
        Omega_b=0.0, Omega_cdm=omega0,
    )
    # one component per populated particle type (reference GADGET type
    # names, snapshot.py: gas/halo/disk/bulge/stars/bndry)
    type_names = ("gas", "halo", "disk", "bulge", "stars", "bndry")
    comps = {}
    start = 0
    mcur = 0
    for t in range(6):
        n_t = int(npart[t])
        if n_t == 0:
            continue
        if masses[t] == 0 and mass_arr is not None:
            # per-particle masses from the MASS block: momenta use the
            # TRUE mass of each particle; the component-level scalar is
            # the mean (with a warning when they genuinely vary — the
            # framework's dynamics take one mass per component, as the
            # reference warns for TIPSY; uniform MASS blocks are exact)
            m_t = mass_arr[mcur : mcur + n_t] * msun10_h
            mcur += n_t
            mass = float(np.mean(m_t))
            if not np.all(m_t == m_t[0]):
                from concept_tpu.utils.terminal import warn

                warn(
                    f"GADGET type '{type_names[t]}' has per-particle "
                    f"masses; momenta are exact, the component mass is "
                    f"the mean"
                )
            mom_t = vel[start : start + n_t] * kms * (a**1.5) * m_t[:, None]
        else:
            mass = masses[t] * msun10_h
            mom_t = vel[start : start + n_t] * kms * (a**1.5) * mass
        name = f"GADGET {type_names[t]}"
        spec = ComponentSpec(name=name, species="matter", N=n_t, mass=mass)
        state = ParticleState(
            pos=pos[start : start + n_t] * kpc_h,
            mom=mom_t,
            ids=ids[start : start + n_t],
        )
        comps[name] = (spec, state)
        start += n_t
    return meta, comps


def is_gadget_snapshot(filename: str) -> bool:
    try:
        with open(filename, "rb") as f:
            head = f.read(8)
        size = struct.unpack_from("<I", head, 0)[0]
        return size == 8 and head[4:8] == b"HEAD" or size == 256
    except Exception:
        return False


# --------------------------------------------------------------------- #
# TIPSY (read-only, like the reference: snapshot.py:2643-3044)
# --------------------------------------------------------------------- #
_TIPSY_HEADER_FMT = "{e}d i i i i i 4x"  # time nbodies ndim nsph ndark nstar


def _tipsy_header(raw: bytes):
    """Unpack the TIPSY header, probing both endiannesses by the ndim
    sanity check (reference read_header, snapshot.py:2770-2789).
    Returns (time, nbodies, ndim, nsph, ndark, nstar, endianness)."""
    for e in ("<", ">"):
        s = struct.Struct(_TIPSY_HEADER_FMT.format(e=e))
        vals = s.unpack(raw[: s.size])
        if vals[2] in (1, 2, 3):
            return (*vals, e)
    raise ValueError("not a TIPSY snapshot (no endianness matches)")


def is_tipsy_snapshot(filename: str) -> bool:
    try:
        with open(filename, "rb") as f:
            head = f.read(32)
        t, nbodies, ndim, nsph, ndark, nstar, _ = _tipsy_header(head)
        return ndim == 3 and 0 < nbodies < 2**40 and nsph + ndark + nstar == nbodies
    except Exception:
        return False


def load_tipsy(filename: str, units, boxsize: float | None = None,
               H0: float | None = None):
    """Read a TIPSY snapshot (dark-matter particles; little- or
    big-endian standard format).

    TIPSY system of units (reference snapshot.py:2930-2985): positions
    in [−0.5, 0.5] map as (0.5 + x)·boxsize; the mass unit is the
    critical-density box mass 3H₀²/(8πG)·boxsize³; the momentum unit is
    boxsize·H₀·√(3/(8π))·a²·mass.  boxsize/H₀ are not stored in the
    file — the caller supplies them (the reference takes both from the
    simulation parameters); without them the dimensionless values are
    returned as-is (unit box, unit-H₀ momenta).  Per-particle masses
    are collapsed to the mean with a warning, as the reference does.

    Dark particle struct: mass, pos[3], vel[3], eps, phi (9×f32).
    """
    from concept_tpu.units import constants
    from concept_tpu.utils.terminal import warn

    with open(filename, "rb") as f:
        raw = f.read()
    t, nbodies, ndim, nsph, ndark, nstar, e = _tipsy_header(raw[:32])
    off = 32
    gas_size = 12 * 4
    off += nsph * gas_size
    dark = np.frombuffer(
        raw, dtype=np.dtype(f"{e}f4"), count=ndark * 9, offset=off
    ).reshape(ndark, 9).astype(np.float64)
    masses = dark[:, 0]
    mass = float(masses[0])
    if np.unique(masses).size > 1:
        mass = float(np.mean(masses))
        warn(
            "TIPSY particles have independent masses; "
            "using the mean particle mass (as the reference does)"
        )
    pos = dark[:, 1:4]
    vel = dark[:, 4:7]
    L = boxsize if boxsize is not None else 1.0
    H0v = H0 if H0 is not None else 0.0
    a = t
    if H0 is not None:
        # reference unit conversions (snapshot.py:2946-2982)
        mass = mass * (3 * H0v**2 / (8 * math.pi * constants.G_Newton)
                       * L**3)
        mom_unit = L * H0v * math.sqrt(3 / (8 * math.pi)) * a**2 * mass
    else:
        # no H₀ supplied: keep the file's dimensionless system (mass as
        # stored; momenta = a²·mass·vel, i.e. unit H₀·boxsize)
        mom_unit = a**2 * mass
    meta = SnapshotMeta(a=a, boxsize=L, H0=H0v, Omega_b=0.0, Omega_cdm=0.0)
    spec = ComponentSpec(name="TIPSY dark", species="matter", N=ndark, mass=mass)
    state = ParticleState(
        pos=(pos + 0.5) * L,
        mom=vel * mom_unit,
        ids=np.arange(ndark),
    )
    return meta, {spec.name: (spec, state)}


# --------------------------------------------------------------------- #
# Dispatch (reference snapshot.py:3206 get_snapshot_type)
# --------------------------------------------------------------------- #
def snapshot_type(filename: str) -> str | None:
    probe = filename if os.path.exists(filename) else filename + ".0"
    if not os.path.exists(probe):
        return None
    if is_concept_snapshot(probe):
        return "concept"
    if is_gadget_snapshot(probe):
        return "gadget"
    if is_tipsy_snapshot(probe):
        return "tipsy"
    return None


def load(filename: str, units=None, boxsize: float | None = None,
         H0: float | None = None):
    """``boxsize``/``H0``: simulation parameters needed by formats that
    do not store them (TIPSY); ignored by self-describing formats."""
    if units is None:
        from concept_tpu.units import units as default_units

        units = default_units
    kind = snapshot_type(filename)
    if kind == "concept":
        return load_concept(filename)
    if kind == "gadget":
        if not os.path.exists(filename) or os.path.exists(filename + ".0"):
            return load_gadget_multifile(filename, units)
        return load_gadget(filename, units)
    if kind == "tipsy":
        return load_tipsy(filename, units, boxsize=boxsize, H0=H0)
    raise ValueError(f"unrecognized snapshot format: {filename}")
