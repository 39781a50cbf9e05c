"""External-integrator anchor for the a = 1 chaos floor
(tests/test_vs_oracle_p3m.py TOL_A1_CHAOS).

The frozen oracle fixture is a CONVERGED leapfrog (KDK dt/16, float64)
PP-Ewald run.  The verdict's remaining question: the chaos floor that
justifies the a = 1 tolerance was measured between members of the SAME
integrator family (leapfrog at different dt).  This script integrates
the identical system with scipy DOP853 — an adaptive 8th-order
Runge-Kutta sharing no code or structure with the leapfrog — and
records its checkpoint positions into the fixture:

    dx/dt   = mom / (m a²)
    dmom/dt = G m² · acc(x) / a        (acc from the same validated
                                        PP-Ewald force law)

If leapfrog(dt/16) and DOP853(rtol 1e-9) differ at a = 1 by ~1e-2 while
agreeing at a ∈ {0.1, 0.5}, the divergence is chaos, not integration
error — anchored across integrator families.

Run:  python scripts/anchor_dop853.py
Updates tests/data/oracle_pp_8cube.npz in place (adds dop853_pos_a*).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from scipy.integrate import solve_ivp

from concept_tpu.units import units, constants
from concept_tpu.cosmology.background import Background
from concept_tpu.forces.pp import pp_momentum_updates, make_ewald_table


def main(rtol=1e-9):
    fn = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                      "oracle_pp_8cube.npz")
    fx = dict(np.load(fn))
    box = float(fx["boxsize"])
    mass = float(fx["mass"])
    softening = float(fx["softening"])
    H0 = float(fx["H0"])
    G = constants.G_Newton
    bg = Background(H0=H0, Omega_m=float(fx["Omega_m"]))
    N = fx["ic_pos"].shape[0]
    table = make_ewald_table(64)

    @jax.jit
    def acc_fn(pos):
        # unit kick integral ⇒ pp_momentum_updates returns G m² acc(x)
        return pp_momentum_updates(
            pos, mass, box, jnp.asarray(1.0, jnp.float64), G,
            softening=softening, ewald_table=table,
            softening_kernel="spline",
        )

    t0 = float(bg.t_of_a_np(0.02))
    a_checks = (0.1, 0.5, 1.0)
    t_checks = [float(bg.t_of_a_np(a)) for a in a_checks]

    n_eval = [0]

    def rhs(t, y):
        n_eval[0] += 1
        a = float(bg.a_of_t_np(t))
        x = y[: 3 * N].reshape(N, 3)
        mom = y[3 * N:].reshape(N, 3)
        dx = mom / (mass * a * a)
        dmom = np.asarray(acc_fn(jnp.asarray(np.mod(x, box)))) / a
        return np.concatenate([dx.ravel(), dmom.ravel()])

    y0 = np.concatenate([fx["ic_pos"].ravel(), fx["ic_mom"].ravel()])
    print(f"DOP853 integrating {N} bodies a=0.02 → 1 (rtol={rtol}) ...")
    # scale-aware atol: positions O(box), momenta O(m·box·H)
    atol = np.concatenate([
        np.full(3 * N, 1e-10 * box),
        np.full(3 * N, 1e-10 * mass * box * H0),
    ])
    sol = solve_ivp(rhs, (t0, t_checks[-1]), y0, method="DOP853",
                    rtol=rtol, atol=atol, t_eval=t_checks)
    assert sol.success, sol.message
    print(f"  {n_eval[0]} force evaluations")

    keymap = {0.1: "a0p1", 0.5: "a0p5", 1.0: "a1"}
    for j, a_chk in enumerate(a_checks):
        pos = np.mod(sol.y[: 3 * N, j].reshape(N, 3), box)
        fx[f"dop853_pos_{keymap[a_chk]}"] = pos
        ref = fx[f"pos_{keymap[a_chk]}"]
        d = pos - ref
        d -= box * np.round(d / box)
        disp = np.mean(np.sqrt((d**2).sum(1))) / box
        print(f"  a={a_chk}: leapfrog(dt/16) vs DOP853 mean |Δx|/box"
              f" = {disp:.3e}")

    np.savez_compressed(fn, **fx)
    print(f"updated {fn} ({os.path.getsize(fn)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
