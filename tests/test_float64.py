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
