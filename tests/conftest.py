"""Test configuration: run on CPU with 8 virtual devices so multi-device
sharding (the analogue of the reference's nprocs-invariance tests,
reference concept:1849-1921) is exercised without TPU hardware.

Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in _flags:
    # 8 virtual devices timeshare one physical core here: a device thread
    # can take > the default 40 s to reach a cross-device collective at
    # ≥64³ shapes under load, and XLA CPU hard-aborts the process
    # (rendezvous.cc "Exiting to ensure a consistent program state").
    # These are correctness-neutral watchdog knobs.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3000")
os.environ["XLA_FLAGS"] = _flags

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon site hook force-sets JAX_PLATFORMS=axon at interpreter startup;
# override via jax.config (effective as long as no backend is initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")

# Seed the Einstein-Boltzmann disk cache (.reusable/eb, the analogue of
# the reference's .reusable/class HDF5, commons.py:5593) from checked-in
# fixture tables so CI does not pay the minutes-long hierarchy solves.
# Content-keyed filenames: a stale fixture is simply a cache miss.
import shutil


def _seed_eb_cache():
    here = os.path.dirname(os.path.abspath(__file__))
    fixture_dir = os.path.join(here, "fixtures", "eb")
    if not os.path.isdir(fixture_dir):
        return
    cache_dir = os.path.join(os.getcwd(), ".reusable", "eb")
    os.makedirs(cache_dir, exist_ok=True)
    for name in os.listdir(fixture_dir):
        dst = os.path.join(cache_dir, name)
        if name.endswith(".npz") and not os.path.exists(dst):
            shutil.copy(os.path.join(fixture_dir, name), dst)


_seed_eb_cache()
