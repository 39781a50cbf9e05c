"""Benchmark: PM-gravity particle updates per second per chip.

North-star target (BASELINE.json): ≥ 1e8 particle-updates/s/chip at 512³
on TPU v5p.  Times the full jitted KDK step (deposit → FFT → Poisson →
gradient → gather → kick → drift) and prints ONE JSON line.

Timing uses a hard host-readback sync (scalar device→host pull): on the
axon tunnel backend, block_until_ready alone does not synchronize.
Grid/particle count auto-scales down on OOM / compiler limits.
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: first-run compiles through the remote
# helper are slow; cache them next to the repo
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def _sync(state):
    return float(state.pos[0, 0])


def bench_once(n_grid):
    """Time the flagship persistent-bucket PM step (concept_tpu/bucketsim)."""
    import numpy as np
    from concept_tpu.bucketsim import BucketSimulation

    box = 512.0
    n = n_grid
    N = n**3
    rng = np.random.default_rng(0)
    # lattice + sub-cell jitter: how real cosmological ICs start (2LPT
    # displaces a lattice), and bounded per-block bucket occupancy
    lin = (np.arange(n, dtype=np.float32) + 0.5) * (box / n)
    comps = (
        np.broadcast_to(lin[:, None, None], (n, n, n)).reshape(-1),
        np.broadcast_to(lin[None, :, None], (n, n, n)).reshape(-1),
        np.broadcast_to(lin[None, None, :], (n, n, n)).reshape(-1),
    )
    jit_amp = 0.3 * (box / n)
    pos = tuple(
        jnp.asarray(
            np.mod(c + rng.uniform(-jit_amp, jit_amp, N).astype(np.float32), box)
        )
        for c in comps
    )
    mom = tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))
    # sub-half-cell jitter never moves a particle off its lattice cell, so
    # every 2³-cell block holds exactly 8 particles — capacity 8 is
    # lossless here and halves the state (needed to fit 512³ in 16 GB);
    # smaller runs keep clustering headroom
    capacity = 8 if n_grid >= 512 else 16
    sim = BucketSimulation(n_grid, box, 2.0, 1.0, capacity=capacity)
    state = sim.init_state(pos, mom)
    assert int(jnp.sum(state.valid)) == N
    int1, int2 = 1e-3, 1e-3
    state, _ = sim.step(state, int1, int2)  # warmup/compile
    _ = float(state.pos[0, 0, 0])
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, _ = sim.step(state, int1, int2)
    _ = float(state.pos[0, 0, 0])
    dt = (time.perf_counter() - t0) / n_iter
    return dt


def _jittered_lattice_components(n_part, box, seed=0, amp=0.3):
    import numpy as np

    N = n_part**3
    rng = np.random.default_rng(seed)
    lin = (np.arange(n_part, dtype=np.float32) + 0.5) * (box / n_part)
    comps = (
        np.broadcast_to(lin[:, None, None], (n_part,) * 3).reshape(-1),
        np.broadcast_to(lin[None, :, None], (n_part,) * 3).reshape(-1),
        np.broadcast_to(lin[None, None, :], (n_part,) * 3).reshape(-1),
    )
    jit_amp = amp * (box / n_part)
    return tuple(
        jnp.asarray(
            np.mod(c + rng.standard_normal(N).astype(np.float32) * jit_amp, box)
        )
        for c in comps
    )


def bench_p3m(n_part=256):
    """Full fused P³M kick (forces/p3m.p3m_kick_components): short-range
    Pallas pencil sweep + Gaussian-split PM long range at mesh 2·n_part
    (reference default), per-eval bucketize.  Returns seconds/eval."""
    from concept_tpu.forces.p3m import p3m_kick_components, pm_block_capacity
    from concept_tpu.forces.shortrange import cell_grid_shape, auto_capacity

    box = 512.0
    mesh = 2 * n_part
    N = n_part**3
    scale = 1.25 * box / mesh
    cutoff = 4.5 * scale
    nc = cell_grid_shape(box, cutoff)
    K = auto_capacity(N, nc)
    comps = _jittered_lattice_components(n_part, box)

    def kick():
        (dx, dy, dz), n_sr, n_pm = p3m_kick_components(
            *comps, 2.0, box, scale, cutoff, 1e-3, mesh, nc, K,
            k_pm=pm_block_capacity(N, mesh), G=1.0,
            max_overflow=max(2048, N // 1024),
        )
        return dx

    dm = kick()
    _ = float(dm[0])  # hard sync (see module doc)
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        dm = kick()
        _ = float(dm[0])
    return (time.perf_counter() - t0) / n_iter


def bench_p3m_persistent(n_part=256):
    """Persistent-layout P³M stepper (p3msim): full KDK step/s with the
    short-range state resident in the slot layout (no per-step SR
    bucketize/write-back)."""
    from concept_tpu.p3msim import P3MSimulation

    box = 512.0
    N = n_part**3
    comps = _jittered_lattice_components(n_part, box)
    mom = tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))
    sim = P3MSimulation(n_part, box, mass=2.0, G=1.0)
    state = sim.init_state(comps, mom)
    state, _ = sim.step(state, 1e-3, 1e-3)  # warmup/compile
    _ = float(state.pos[0, 0, 0])
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, _ = sim.step(state, 1e-3, 1e-3)
    _ = float(state.pos[0, 0, 0])
    return (time.perf_counter() - t0) / n_iter


def bench_p3m_unified(n_part=256, n_steps=4):
    """PRODUCTION P³M: the unified-layout rung stepper (p3mrungs — what
    run()/the CLI execute for p3m), base_step wall time at the jittered-
    lattice state.  One full reach-2 pair sweep + the direct-cell PM
    build per base step (uniform state ⇒ all particles rung 0)."""
    import math

    import numpy as np
    from concept_tpu.p3mrungs import P3MRungSimulation
    from concept_tpu.units import units, constants
    from concept_tpu.cosmology.background import Background
    from concept_tpu.components import particle_mass

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    box = n_part * 2 * units.Mpc
    N = n_part**3
    G = constants.G_Newton
    mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
    # production softening (reference select_softening_length default
    # 0.025·boxsize/∛N): unsoftened jittered-lattice near-pairs produce
    # unbounded accelerations that push every particle to the deepest
    # rung (2^7 substeps/base step — not what production measures)
    soft = 0.025 * box / n_part
    sim = P3MRungSimulation(n_part, box, mass, G, mesh=2 * n_part, bg=bg,
                            N_rungs=8, softening=soft,
                            softening_kernel="spline")
    comps = _jittered_lattice_components(n_part, box)
    mom = tuple(jnp.zeros((N,), jnp.float32) for _ in range(3))
    state = sim.init_state(comps, mom)
    t0h = float(bg.t_of_a_np(0.1))
    dt = sim._timestep(0.1, 0.0)
    state = sim.assign_initial_rungs(state, dt)
    # pre-compile the whole K_r ladder + rebucket so no compile lands in
    # (or immediately before) the timed window
    state = sim.warm_compiles(state)
    # warm the base-step compiles (2 steps: the second touches the
    # staleness-triggered rebucket path)
    state, vmax = sim.base_step(state, t0h, dt, t0h)
    if sim.needs_rebucket:
        state = sim.rebucket(state)
    t = t0h + dt
    dtn = min(sim._timestep(0.1, vmax / sim.mass), dt)
    state, vmax = sim.base_step(state, t, dtn, t)
    _ = float(state.pos[0, 0, 0])
    t += dtn
    t_start = time.perf_counter()
    for _ in range(n_steps):
        if sim.needs_rebucket:
            state = sim.rebucket(state)
        dtn = min(sim._timestep(0.1, vmax / sim.mass), dt)
        state, vmax = sim.base_step(state, t, dtn, t)
        t += dtn
    _ = float(state.pos[0, 0, 0])
    return (time.perf_counter() - t_start) / n_steps


_BENCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_cache")


def _cached_clustered_state(key, make):
    """Evolving 2LPT ICs to the clustered bench state costs minutes; cache
    the final (pos, mom) arrays on disk so reruns (and the driver's
    round-end run after a local run) skip straight to the timed segment."""
    import numpy as np

    path = os.path.join(_BENCH_CACHE, key + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["pos"], z["mom"]
    pos, mom = make()
    try:
        os.makedirs(_BENCH_CACHE, exist_ok=True)
        np.savez(path, pos=pos, mom=mom)
    except OSError:
        pass
    return pos, mom


def bench_p3m_unified_clustered(n_part=256, a_end=0.12, n_steps=3):
    """Production P³M (rung stepper) on an EVOLVED clustered state: 2LPT
    ICs evolved to z ≈ 7 with the stepper itself, then the mean of the
    next base steps — includes the rung sub-cycling and rebucketize
    under real occupancy skew (the honest sustained number VERDICT r2
    asked for alongside the lattice best case)."""
    import numpy as np
    from concept_tpu.p3mrungs import P3MRungSimulation
    from concept_tpu.units import units, constants
    from concept_tpu.cosmology.background import Background
    from concept_tpu.cosmology.primordial import PrimordialSpectrum
    from concept_tpu.cosmology.linear import LinearCosmology
    from concept_tpu.components import ComponentSpec, particle_mass
    from concept_tpu.ic import realize_particles

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    lin = LinearCosmology(
        bg, PrimordialSpectrum(A_s=2.1e-9, n_s=0.96), Omega_b=0.049,
        Omega_cdm=0.27, light_speed=constants.light_speed, Mpc=units.Mpc,
    )
    G = constants.G_Newton
    box = n_part * units.Mpc  # 1 Mpc mean separation: nonlinear by z=4
    N = n_part**3
    mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
    sim = P3MRungSimulation(n_part, box, mass, G, mesh=2 * n_part, bg=bg,
                            N_rungs=8, softening=0.025 * box / n_part,
                            softening_kernel="spline")

    def make():
        from concept_tpu.p3mrungs import extract_flat

        spec = ComponentSpec(name="m", species="matter", N=N, mass=mass)
        st0 = realize_particles(lin, spec, box, 0.02, seed=0, lpt_order=2)
        p0 = np.asarray(st0.pos)
        m0 = np.asarray(st0.mom)
        st = sim.init_state(
            tuple(jnp.asarray(np.ascontiguousarray(p0[:, d])) for d in range(3)),
            tuple(jnp.asarray(np.ascontiguousarray(m0[:, d])) for d in range(3)),
        )
        st = sim.evolve(st, float(bg.t_of_a_np(0.02)),
                        float(bg.t_of_a_np(a_end)))
        pf, mf, _ = extract_flat(st, N)
        return np.asarray(pf).T, np.asarray(mf).T  # (3, N)

    pos, mom = _cached_clustered_state(
        f"p3m_clustered_{n_part}_{a_end}", make)
    state = sim.init_state(
        tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
        tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
    )
    # timed segment at the clustered state (rebucketize included at the
    # stepper's own cadence).  Settle the capacity and warm the step +
    # rebucket compiles FIRST — a capacity regrow inside the timed
    # window would bill ~60 s of retrace as step time (the same trap
    # bench_pm_sustained documents).
    a = a_end
    t = float(bg.t_of_a_np(a))
    dt = sim._timestep(a, 0.0)
    # warm until the capacity is stable: init_state sizes the layout
    # exact-fit, so warm_compiles' own rebucket typically GROWS it
    # (1.3× headroom) — the ladder must then be re-warmed at the new
    # K/K_occ or those compiles land inside the timed window
    cap = -1
    while sim.capacity != cap:
        cap = sim.capacity
        state = sim.warm_compiles(state)  # ladder + rebucket precompiled
    state, vmax = sim.base_step(state, t, dt, t)
    t += dt
    state = sim.rebucket(state)
    state, vmax = sim.base_step(state, t, dt, t)
    _ = float(state.pos[0, 0, 0])
    t += dt
    t0h = time.perf_counter()
    for _ in range(n_steps):
        if sim.needs_rebucket:
            state = sim.rebucket(state)
        dtn = min(sim._timestep(a, vmax / sim.mass), dt * 1.5)
        state, vmax = sim.base_step(state, t, dtn, t)
        t += dtn
        a = float(bg.a_of_t_np(t))
    _ = float(state.pos[0, 0, 0])
    return (time.perf_counter() - t0h) / n_steps


def bench_pm_sustained(n_grid=256, a_end=0.12):
    """Sustained PM throughput on an EVOLVING (clustering) state: 2LPT ICs
    evolved to z = 1/a_end − 1, then the mean of the next 10 steps —
    includes stragglers, rebucketing and capacity growth (the round-1
    bench measured only the freshly-bucketized lattice best case)."""
    import numpy as np
    from concept_tpu.bucketsim import BucketSimulation
    from concept_tpu.units import units, constants
    from concept_tpu.cosmology.background import Background
    from concept_tpu.cosmology.primordial import PrimordialSpectrum
    from concept_tpu.cosmology.linear import LinearCosmology
    from concept_tpu.components import ComponentSpec, particle_mass
    from concept_tpu.ic import realize_particles

    H0 = 67 * units.km / (units.s * units.Mpc)
    bg = Background(H0=H0, Omega_m=0.319)
    lin = LinearCosmology(
        bg, PrimordialSpectrum(A_s=2.1e-9, n_s=0.96), Omega_b=0.049,
        Omega_cdm=0.27, light_speed=constants.light_speed, Mpc=units.Mpc,
    )
    G = constants.G_Newton
    box = n_grid * units.Mpc  # 1 Mpc mean separation: nonlinear by z=4
    N = n_grid**3
    mass = particle_mass(0.319, bg.rho_crit_of(G), box, N)
    sim = BucketSimulation(n_grid, box, mass, G, bg=bg, capacity=16)

    def make():
        from concept_tpu.bucketsim import flatten_state

        spec = ComponentSpec(name="m", species="matter", N=N, mass=mass)
        st0 = realize_particles(lin, spec, box, 0.02, seed=0, lpt_order=2)
        p0 = np.asarray(st0.pos)
        m0 = np.asarray(st0.mom)
        st = sim.init_state(
            tuple(jnp.asarray(np.ascontiguousarray(p0[:, d])) for d in range(3)),
            tuple(jnp.asarray(np.ascontiguousarray(m0[:, d])) for d in range(3)),
        )
        st = sim.evolve(st, float(bg.t_of_a_np(0.02)),
                        float(bg.t_of_a_np(a_end)))
        pf, mf = flatten_state(st)
        return pf.T, mf.T  # (3, N)

    pos, mom = _cached_clustered_state(f"pm_clustered_{n_grid}_{a_end}", make)
    state = sim.init_state(
        tuple(jnp.asarray(np.ascontiguousarray(pos[d])) for d in range(3)),
        tuple(jnp.asarray(np.ascontiguousarray(mom[d])) for d in range(3)),
    )
    # timed segment: 10 more leapfrog steps at the clustered state
    t_now = float(bg.t_of_a_np(a_end))
    int1 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-1)",))["a**(-1)"]
    int2 = bg.integrals_np(t_now, t_now * 1.01, keys=("a**(-2)",))["a**(-2)"]
    # settle the capacity and warm the step+rebucket compiles at the
    # final K BEFORE timing (a capacity retrace inside the timed window
    # would bill ~60 s of compilation as step time)
    state = sim.maybe_rebucket(state)
    state, ns = sim.step(state, int1, int2)
    state = sim.maybe_rebucket(state)
    state, ns = sim.step(state, int1, int2)
    _ = float(state.pos[0, 0, 0])
    # one full rebucket cadence so the amortization is honest (exactly
    # rebucket_every steps + one rebucket in the timed window)
    n_iter = sim.rebucket_every
    t0 = time.perf_counter()
    for i in range(n_iter):
        state, ns = sim.step(state, int1, int2)
        if (i + 1) % sim.rebucket_every == 0:
            state = sim.maybe_rebucket(state)
    _ = float(state.pos[0, 0, 0])
    return (time.perf_counter() - t0) / n_iter


class _SectionTimeout(Exception):
    pass


def _alarm(seconds: int):
    """SIGALRM watchdog: a wedged TPU tunnel hangs inside backend calls
    indefinitely — every section must be bounded so the driver always
    gets the one JSON line."""
    import signal

    def handler(signum, frame):
        raise _SectionTimeout()

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(max(1, int(seconds)))


def _alarm_off():
    import signal

    signal.alarm(0)


_SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_extras.json")


def _emit(payload):
    """Print the bench JSON line and flush HARD (the round-3 bench was
    killed by the driver's outer timeout before its single end-of-run
    print — the measured headline evaporated; never buffer results)."""
    print(json.dumps(payload), flush=True)
    try:
        sys.stdout.flush()
        os.fsync(sys.stdout.fileno())
    except OSError:
        pass


def _write_sidecar(extra):
    """Stream extras to a sidecar file as each completes, so a mid-extras
    kill still leaves every finished measurement on disk."""
    try:
        with open(_SIDECAR, "w") as f:
            json.dump(extra, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
    except OSError as e:
        print(f"# sidecar write failed: {e}", file=sys.stderr)


_EXTRA_FNS = {
    "p3m_production_unified_256_updates_per_s":
        lambda: 256**3 / bench_p3m_unified(256),
    "pm_sustained_clustered_256_updates_per_s":
        lambda: 256**3 / bench_pm_sustained(256),
    "p3m_production_clustered_256_updates_per_s":
        lambda: 256**3 / bench_p3m_unified_clustered(256),
    "p3m_production_unified_512_updates_per_s":
        lambda: 512**3 / bench_p3m_unified(512, n_steps=2),
    "p3m_step_persistent_256_updates_per_s":
        lambda: 256**3 / bench_p3m_persistent(256),
}


def _probe_backend(timeout_s=240):
    """Tiny-matmul probe in a fresh subprocess: distinguishes a wedged
    TPU tunnel (killed jobs can wedge it 10-20 min) from a healthy
    backend.  Returns True once a matmul round-trips."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_headline_subprocess(n_grid, timeout_s):
    """Run the headline measurement for one gridsize in a fresh
    subprocess (VERDICT r4 next #2: the round-4 in-process 512³ attempt
    wedged and its alarm-handler traceback pinned buffers; isolation
    gives the headline the same protection the extras already have).
    Returns updates/s or None."""
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--headline", str(n_grid)],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"# headline {n_grid} timed out ({timeout_s:.0f}s)",
              file=sys.stderr)
        return None
    for line in reversed(res.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)["value"]
            except (json.JSONDecodeError, KeyError):
                pass
    tail = (res.stderr or res.stdout or "").strip().splitlines()[-3:]
    print(f"# headline {n_grid} failed (rc={res.returncode}): "
          + " | ".join(tail)[-300:], file=sys.stderr)
    return None


def _run_extra_subprocess(name, timeout_s):
    """Run one extra in a fresh subprocess.  Isolation matters: the round-4
    bench showed a failed 512³ attempt leaves its buffers live (exception
    tracebacks pin them), OOM-ing every LATER extra in the same process;
    and a remote-compile-helper crash aborts the whole run.  A subprocess
    leaves the parent clean either way; compiles persist via the on-disk
    jax cache, so the re-init cost is backend startup only (~30 s)."""
    import subprocess

    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extra", name],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(f"# extra {name} timed out ({timeout_s:.0f}s)", file=sys.stderr)
        return None
    for line in reversed(res.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)["value"]
            except (json.JSONDecodeError, KeyError):
                pass
    tail = (res.stderr or res.stdout or "").strip().splitlines()[-3:]
    print(f"# extra {name} failed (rc={res.returncode}): "
          + " | ".join(tail)[-300:], file=sys.stderr)
    return None


def main():
    target = 1e8  # particle-updates/s/chip (BASELINE.json north star)
    t_start = time.perf_counter()
    # self-budget: stay comfortably inside the driver's outer timeout
    # (round 3 was killed at rc=124 with its own clock showing time left)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1500))
    extra = {}
    # merge an existing sidecar (from a prior local run this round): a
    # driver rerun then only re-measures what it has budget for, without
    # losing earlier measurements
    if os.path.exists(_SIDECAR):
        try:
            with open(_SIDECAR) as f:
                extra.update(json.load(f))
        except (OSError, json.JSONDecodeError):
            pass

    # headline FIRST (it is the recorded metric; extras must never
    # starve it of the wall-clock budget).  Each gridsize runs isolated
    # in a subprocess; a timed-out 512³ gets ONE retry after a
    # probe-and-wait for the wedged tunnel instead of silently falling
    # through to 256³ (VERDICT r4 next #2).
    headline = None
    for n_grid in (512, 256, 128, 64):
        per_try = min(budget_s * 0.30, max(120.0, budget_s * 0.25))
        ups = _run_headline_subprocess(n_grid, per_try)
        if ups is None and n_grid == 512 and budget_s - (
                time.perf_counter() - t_start) > per_try + 60:
            print("# probing backend before 512 retry ...", file=sys.stderr)
            if _probe_backend(min(240, per_try)):
                ups = _run_headline_subprocess(n_grid, per_try)
        if ups is not None:
            headline = (n_grid, ups)
            break

    def payload():
        if headline is not None:
            n_grid, ups = headline
            return {
                "metric": f"pm_step_particle_updates_per_s_{n_grid}cubed",
                "value": ups,
                "unit": "updates/s/chip",
                "vs_baseline": ups / target,
                "extra": dict(extra),
            }
        return {"metric": "pm_step", "value": 0, "unit": "updates/s/chip",
                "vs_baseline": 0, "extra": dict(extra)}

    # the headline is on the record the moment it exists — a later kill
    # can no longer lose it
    _emit(payload())

    def budget_left():
        return budget_s - (time.perf_counter() - t_start)

    # (name, wall-clock estimate [s] incl. subprocess backend re-init;
    # ordered by VERDICT value).  With warm .jax_cache/.bench_cache the
    # estimates are conservative; cold caches make each slower but the
    # subprocess timeout bounds the damage to one extra.
    # never-measured metrics FIRST (VERDICT r4 next #1: the extras
    # budget must prioritize metrics with no number on record over
    # re-measuring known ones), then the known ones freshest-last
    extras = [
        ("p3m_production_clustered_256_updates_per_s", 420),
        ("p3m_production_unified_512_updates_per_s", 500),
        ("p3m_production_unified_256_updates_per_s", 420),
        ("pm_sustained_clustered_256_updates_per_s", 360),
        ("p3m_step_persistent_256_updates_per_s", 240),
    ]
    # within the order above, run anything NOT yet in the sidecar before
    # re-measuring what already has a recorded value this round
    extras.sort(key=lambda ne: ne[0] in extra)
    for name, est in extras:
        if budget_left() < 0.8 * est:
            print(f"# skipping extra {name}: {budget_left():.0f}s left "
                  f"< {est}s estimate", file=sys.stderr)
            continue
        val = _run_extra_subprocess(
            name, min(est * 1.6, max(30, budget_left())))
        if val is not None:
            extra[name] = val
            _write_sidecar(extra)
            _emit(payload())  # keep the on-record line current as results land

    # final line is a superset of the first (same headline + all extras):
    # correct under both first-JSON-line and last-JSON-line parsing
    if extra:
        _emit(payload())


def _extra_main(name):
    """Child-process entry: measure ONE extra and print its JSON line."""
    fn = _EXTRA_FNS[name]
    _alarm(int(float(os.environ.get("BENCH_EXTRA_ALARM_S", 3600))))
    val = fn()
    _alarm_off()
    print(json.dumps({"name": name, "value": val}), flush=True)


def _headline_main(n_grid):
    """Child-process entry: measure the headline at one gridsize."""
    _alarm(int(float(os.environ.get("BENCH_EXTRA_ALARM_S", 3600))))
    dt = bench_once(n_grid)
    _alarm_off()
    print(json.dumps({"name": f"headline_{n_grid}",
                      "value": n_grid**3 / dt}), flush=True)


def _prepare_main():
    """Build the on-disk clustered-state caches (the expensive 2LPT
    evolutions) so bench runs skip straight to their timed segments.
    Run once per round on the TPU: `python bench.py --prepare`."""
    for key, fn in (
        ("pm", lambda: bench_pm_sustained(256)),
        ("p3m", lambda: bench_p3m_unified_clustered(256, n_steps=1)),
    ):
        t0 = time.perf_counter()
        try:
            fn()
            print(f"# prepared {key} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# prepare {key} failed: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    if "--extra" in sys.argv:
        _extra_main(sys.argv[sys.argv.index("--extra") + 1])
    elif "--headline" in sys.argv:
        _headline_main(int(sys.argv[sys.argv.index("--headline") + 1]))
    elif "--prepare" in sys.argv:
        _prepare_main()
    else:
        main()
