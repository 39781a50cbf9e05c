"""Direct particle-particle (PP) gravity: exact pairwise forces with
Ewald periodic images, plus the non-periodic variant.

TPU-native counterpart of reference gravity.py:121 (gravity_pairwise,
PP + Ewald) and gravity.py:491 (gravity_pairwise_nonperiodic).  The
reference's domain-pairing MPI schedule (interactions.py:398-615) becomes
a dense all-pairs computation evaluated in row-chunks (static shapes,
VPU-vectorized) — appropriate since PP is the validation/small-N method;
P³M covers production scales.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("periodic", "chunk", "softening_kernel"))
def pp_momentum_updates(
    pos,
    mass,
    boxsize: float,
    kick_integral,
    G: float,
    softening: float = 0.0,
    ewald_table=None,
    periodic: bool = True,
    chunk: int = 1024,
    softening_kernel: str = "plummer",
):
    """Δmom for all particles from direct summation.  (N,3).

    periodic=True: minimum-image direct force + Ewald correction lookup
    (requires ewald_table from forces/ewald.py, scaled to the unit box).
    periodic=False: plain 1/r² (reference 'ppnonperiodic' method).
    softening_kernel: 'plummer' | 'spline' | 'none' (reference
    get_softened_r3inv, interactions.py:1846-1910).
    """
    N = pos.shape[0]
    dtype = pos.dtype
    soft2 = jnp.asarray(softening * softening, dtype)
    npad = (-N) % chunk
    pos_pad = jnp.concatenate([pos, jnp.zeros((npad, 3), dtype)], axis=0)
    valid = jnp.concatenate([jnp.ones((N,), bool), jnp.zeros((npad,), bool)])
    n_chunks = (N + npad) // chunk

    def row_block(i, _):
        rows = jax.lax.dynamic_slice(pos_pad, (i * chunk, 0), (chunk, 3))
        rvalid = jax.lax.dynamic_slice(valid, (i * chunk,), (chunk,))
        dx = rows[:, None, :] - pos_pad[None, :, :]  # (chunk, Npad, 3)
        if periodic:
            dx = dx - boxsize * jnp.round(dx / boxsize)  # minimum image
        r2 = jnp.sum(dx * dx, axis=-1)
        mask = rvalid[:, None] & valid[None, :] & (r2 > 0)
        if softening_kernel == "plummer":
            r2s = r2 + soft2
            r3inv = r2s ** (-1.5)
        else:
            from concept_tpu.forces.shortrange import softened_r3inv

            r3inv = softened_r3inv(
                r2, jnp.sqrt(soft2), softening_kernel, dtype
            )
        inv_r3 = jnp.where(mask, r3inv, 0.0)
        acc = -jnp.sum(dx * inv_r3[..., None], axis=1)
        if periodic and ewald_table is not None:
            from concept_tpu.forces.ewald import ewald_correction_lookup

            # correction tabulated for the unit box: physical value is
            # corr(x/L)/L² (dimensional scaling of acceleration fields)
            corr = ewald_correction_lookup(ewald_table, dx / boxsize)
            corr = jnp.where(mask[..., None], corr, 0.0)
            acc = acc + jnp.sum(corr, axis=1) / boxsize**2
        return i + 1, acc

    _, accs = jax.lax.scan(row_block, 0, None, length=n_chunks)
    acc = accs.reshape(-1, 3)[:N]
    return (G * mass * mass * kick_integral) * acc


def make_ewald_table(gridsize: int = 64):
    from concept_tpu.forces.ewald import tabulate_ewald_correction

    return jnp.asarray(tabulate_ewald_correction(gridsize), dtype=jnp.float32)
