"""Generate the frozen trajectory-oracle fixture for
tests/test_vs_oracle_p3m.py.

Role of the fixture (reference test/concept_vs_gadget_p3m): an EXTERNAL
anchor for the production P³M — positions of the 8³ / 32³-mesh config at
a ∈ {0.1, 0.5, 1.0}.  The reference uses a real GADGET-2 run; GADGET is
not available in this environment (no binary, no network), so the anchor
is a CONVERGED direct-summation run instead: PP with tabulated Ewald
periodic images, float64, at dt/16 (converged: dt/8 vs dt/16 final
positions agree to < 2e-3 box).  The force law is independently
validated against analytic two-body orbits and the native-C Ewald
tabulation, making this the strongest anchor constructible offline.

Run:  python scripts/make_oracle_fixture.py
Writes tests/data/oracle_pp_8cube.npz (ICs + checkpoint positions).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.components import ComponentSpec, particle_mass
from concept_tpu.sim import Simulation, SimConfig


def main(dt_fac=1 / 16, check_convergence=True):
    h = 0.70
    H0 = 70 * units.km / (units.s * units.Mpc)
    Omega_m = 0.30
    box = 8 * units.Mpc / h
    bg = Background(H0=H0, Omega_m=Omega_m)
    prim = PrimordialSpectrum(A_s=2.1e-9, n_s=0.96)
    lin = LinearCosmology(bg=bg, primordial=prim, Omega_b=0.05,
                          Omega_cdm=0.25,
                          light_speed=constants.light_speed, Mpc=units.Mpc)
    N = 8**3
    G = constants.G_Newton
    mass = particle_mass(Omega_m, bg.rho_crit_of(G), box, N)
    softening = 0.03 * box / 8
    spec = ComponentSpec(name="matter", species="matter", N=N, mass=mass,
                         forces=(("gravity", "pp"),))
    cfg = SimConfig(boxsize=box, potential_gridsize=32, G=G,
                    softening=softening, method="pp", dtype=jnp.float64)
    sim = Simulation(spec, cfg, bg, lin)
    state0 = sim.initial_state(a_begin=0.02, seed=0, lpt_order=2)
    ic_pos = np.asarray(state0.pos, np.float64)
    ic_mom = np.asarray(state0.mom, np.float64)

    def run(fac):
        st = state0._replace(pos=jnp.array(state0.pos),
                             mom=jnp.array(state0.mom))
        out = {}
        a = 0.02
        for a_next in (0.1, 0.5, 1.0):
            st, a = sim.evolve(st, a, a_next, dt_fac=fac)
            out[a_next] = np.asarray(st.pos, np.float64)
            print(f"  dt_fac={fac}: a = {a_next} done")
        return out

    print("converged run (dt/16) ...")
    ref = run(dt_fac)
    if check_convergence:
        print("convergence check (dt/8) ...")
        coarse = run(2 * dt_fac)
        for a_chk in (0.1, 0.5, 1.0):
            dx = ref[a_chk] - coarse[a_chk]
            dx -= box * np.round(dx / box)
            conv = np.mean(np.sqrt((dx**2).sum(1))) / box
            print(f"  a={a_chk}: dt/8 vs dt/16 mean |Δx|/box = {conv:.2e}")

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(out_dir, exist_ok=True)
    fn = os.path.join(out_dir, "oracle_pp_8cube.npz")
    np.savez_compressed(
        fn,
        ic_pos=ic_pos, ic_mom=ic_mom, a_begin=0.02,
        pos_a0p1=ref[0.1], pos_a0p5=ref[0.5], pos_a1=ref[1.0],
        boxsize=box, mass=mass, softening=softening,
        H0=H0, Omega_m=Omega_m, Omega_b=0.05, Omega_cdm=0.25,
        A_s=2.1e-9, n_s=0.96,
    )
    print(f"wrote {fn} ({os.path.getsize(fn)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
