"""float64-on-request (VERDICT weak 9: the reference is f64 throughout;
SURVEY §7(g) plans f64 via jax_enable_x64).

jax_enable_x64 must be set before any jax use, so the f64 pipeline runs
in a subprocess; the in-process tests check dtype plumbing that does not
require the global flag.
"""

import subprocess
import sys
import textwrap


def test_f64_pipeline_subprocess():
    """PM sim in float64: dtypes propagate and momentum conservation is
    at f64 roundoff (~1e-12 relative), far beyond f32 (~1e-6)."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from concept_tpu.components import ComponentSpec, ParticleState
        from concept_tpu.cosmology.background import Background
        from concept_tpu.sim import SimConfig, Simulation

        n = 6
        N = n**3
        box = 100.0
        bg = Background(H0=0.07, Omega_m=0.3)
        spec = ComponentSpec(name="m", species="matter", N=N, mass=2.0)
        cfg = SimConfig(boxsize=box, potential_gridsize=16, G=1.0,
                        dtype=jnp.float64)
        sim = Simulation(spec, cfg, bg)
        rng = np.random.default_rng(0)
        lin = (np.arange(n) + 0.5) * (box / n)
        pos = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        pos = pos.reshape(-1, 3) + rng.standard_normal((N, 3)) * 1.5
        pos = np.mod(pos, box)
        state = ParticleState(
            pos=jnp.asarray(pos, jnp.float64),
            mom=jnp.asarray(rng.standard_normal((N, 3)) * 0.1, jnp.float64),
        )
        mom0 = np.sum(np.asarray(state.mom), axis=0)
        mom_scale = np.mean(np.abs(np.asarray(state.mom)))
        for _ in range(5):
            state = sim.step(state, 1e-3, 1e-3)
        assert state.pos.dtype == jnp.float64, state.pos.dtype
        assert state.mom.dtype == jnp.float64, state.mom.dtype
        mom1 = np.sum(np.asarray(state.mom), axis=0)
        drift = np.max(np.abs(mom1 - mom0)) / (mom_scale * N)
        # PM forces are antisymmetric only up to deposit/gather windows,
        # but total momentum must still conserve to near roundoff
        assert drift < 1e-10, f"f64 momentum drift {drift}"
        print("F64OK", drift)
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "F64OK" in r.stdout


def test_f64_powerspec_subprocess():
    """P(k) measurement in f64 agrees with f32 to f32 precision."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from concept_tpu.analysis.powerspec import powerspec

        rng = np.random.default_rng(1)
        N = 2048
        box = 32.0
        pos = rng.uniform(0, box, (N, 3))
        p32 = powerspec([jnp.asarray(pos, jnp.float32)], [1.0], 16, box,
                        n_particles=N)
        p64 = powerspec([jnp.asarray(pos, jnp.float64)], [1.0], 16, box,
                        n_particles=N)
        rel = np.max(np.abs(p64["power"] - p32["power"])
                     / np.maximum(np.abs(p64["power"]), 1e-30))
        assert rel < 1e-4, rel
        print("F64OK", rel)
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "F64OK" in r.stdout


def test_f64_p3m_jit_vs_eager_subprocess():
    """Full P³M step, float64, jitted vs eager: ≤ 1e-10 — the analogue
    of the reference's pure_python_p3m equivalence at its tolerance
    (test/pure_python_p3m/analyze.py:125).  Also regression-guards the
    x64 dtype discipline of the fused Pallas/overflow paths (lax.cond
    branches must agree on int32)."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import numpy as np, jax.numpy as jnp
        from concept_tpu.units import units, constants
        from concept_tpu.cosmology.background import Background
        from concept_tpu.components import (
            ComponentSpec, ParticleState, particle_mass)
        from concept_tpu.sim import Simulation, SimConfig

        H0 = 67*units.km/(units.s*units.Mpc)
        bg = Background(H0=H0, Omega_m=0.3)
        box = 8*units.Mpc; N = 4**3
        mass = particle_mass(0.3, bg.rho_crit_of(constants.G_Newton),
                             box, N)
        spec = ComponentSpec(name="m", species="matter", N=N, mass=mass,
                             forces=(("gravity", "p3m"),))
        cfg = SimConfig(boxsize=box, potential_gridsize=8, method="p3m",
                        G=constants.G_Newton, dtype=jnp.float64,
                        softening=0.03*box/4, softening_kernel="spline")
        sim = Simulation(spec, cfg, bg, None)
        rng = np.random.default_rng(2)
        st = ParticleState(
            pos=jnp.asarray(rng.uniform(0, box, (N, 3))),
            mom=jnp.asarray(rng.normal(0, 1e-3, (N, 3)) * mass))
        out_j, _ = jax.jit(sim._step)(st, 1e-4, 2e-4)
        with jax.disable_jit():
            out_e, _ = sim._step(st, 1e-4, 2e-4)
        dp = np.max(np.abs(np.asarray(out_j.pos)
                           - np.asarray(out_e.pos))) / box
        mscale = np.max(np.abs(np.asarray(out_e.mom)))
        dm = np.max(np.abs(np.asarray(out_j.mom)
                           - np.asarray(out_e.mom))) / mscale
        assert dp <= 1e-10, dp
        assert dm <= 1e-10, dm
        print("OK", dp, dm)
        """
    )
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout


def test_enable_float64_param_subprocess():
    """enable_float64 / --float64 runs the product loop in f64
    end-to-end (reference precision; SURVEY §7(g) f64-on-request)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from concept_tpu.param import load_params\n"
        "from concept_tpu.run import run\n"
        "cfg = load_params(None, text=(\n"
        "    \"initial_conditions = {'species': 'matter', 'N': 6**3}\\n\"\n"
        "    \"boxsize = 64*Mpc\\n\"\n"
        "    \"potential_options = 8\\n\"\n"
        "    \"H0 = 67*km/(s*Mpc)\\n\"\n"
        "    \"Omega_b = 0.049\\n\"\n"
        "    \"Omega_cdm = 0.27\\n\"\n"
        "    \"a_begin = 0.1\\n\"\n"
        "    \"output_times = {'powerspec': [0.11]}\\n\"\n"
        "    \"output_dirs = '/tmp/out_f64'\\n\"\n"
        "    \"select_forces = {'all': {'gravity': 'pm'}}\\n\"\n"
        "    \"boltzmann_backend = 'eh'\\n\"\n"
        "    \"enable_float64 = True\\n\"))\n"
        "sim, st, a = run(cfg)\n"
        "assert np.asarray(st.pos).dtype == np.float64, st.pos.dtype\n"
        "print('OK', np.asarray(st.pos).dtype)\n"
    )
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK float64" in res.stdout


def test_enable_float64_p3m_rungs_subprocess():
    """The PRODUCTION p3m path (rung stepper) also runs in f64 —
    regression for the int32-vs-int64 lax.cond branches in the
    persistent steppers' overflow compaction."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from concept_tpu.param import load_params\n"
        "from concept_tpu.run import run\n"
        "cfg = load_params(None, text=(\n"
        "    \"initial_conditions = {'species': 'matter', 'N': 4**3}\\n\"\n"
        "    \"boxsize = 32*Mpc\\n\"\n"
        "    \"potential_options = 8\\n\"\n"
        "    \"H0 = 67*km/(s*Mpc)\\n\"\n"
        "    \"Omega_b = 0.049\\n\"\n"
        "    \"Omega_cdm = 0.27\\n\"\n"
        "    \"a_begin = 0.1\\n\"\n"
        "    \"output_times = {'powerspec': [0.12]}\\n\"\n"
        "    \"output_dirs = '/tmp/out_f64_p3m_test'\\n\"\n"
        "    \"select_forces = {'all': {'gravity': 'p3m'}}\\n\"\n"
        "    \"boltzmann_backend = 'eh'\\n\"\n"
        "    \"enable_float64 = True\\n\"))\n"
        "sim, st, a = run(cfg)\n"
        "assert np.asarray(st.pos).dtype == np.float64\n"
        "print('OK', np.asarray(st.pos).dtype)\n"
    )
    res = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK float64" in res.stdout
