"""concept_tpu — a TPU-native cosmological N-body + fluid simulation framework.

A ground-up re-design (not a port) of the capabilities of CO*N*CEPT
(jmd-dk/concept): massively-parallel cosmological structure formation with
PP / PM / P³M gravity, fluid species (massive neutrinos, decaying dark
matter, ...), on-the-fly 1/2/3LPT initial conditions, an embedded linear
Boltzmann layer, and power-spectrum / bispectrum / render outputs.

Architecture (TPU-first):
  * single-controller JAX; one jitted step function over a device mesh
  * grids sharded with ``jax.sharding`` / ``shard_map``; FFT pencil
    transposes ride ICI via ``all_to_all``
  * particles as SoA ``jnp`` arrays; deposit/gather via sort+segment ops
  * host side: background/linear cosmology tables (float64 NumPy/SciPy),
    parameter system, snapshot I/O

Reference behavioral parity is cited throughout as ``reference:
src/<file>.py:<line>``.
"""

__version__ = "0.1.0"

from concept_tpu.units import UnitSystem, units, constants  # noqa: F401
