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
    import __graft_entry__ as ge

    sim, state = ge._build(n_grid=n_grid)
    step = jax.jit(sim._step, donate_argnums=0)
    int1 = jnp.float32(1e-3)
    int2 = jnp.float32(1e-3)
    # warmup/compile
    state = step(state, int1, int2)
    _sync(state)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state = step(state, int1, int2)
    _sync(state)
    dt = (time.perf_counter() - t0) / n_iter
    return dt


def main():
    target = 1e8  # particle-updates/s/chip (BASELINE.json north star)
    # 512³ exceeds single-v5e HBM; 256³ is the largest size that compiles
    # and runs reliably through the remote-compile tunnel
    for n_grid in (128, 64):
        try:
            dt = bench_once(n_grid)
            n_particles = n_grid**3
            ups = n_particles / dt
            print(
                json.dumps(
                    {
                        "metric": f"pm_step_particle_updates_per_s_{n_grid}cubed",
                        "value": ups,
                        "unit": "updates/s/chip",
                        "vs_baseline": ups / target,
                    }
                )
            )
            return
        except Exception as e:  # noqa: BLE001 — OOM or backend limits: scale down
            print(f"# gridsize {n_grid} failed: {type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
    print(json.dumps({"metric": "pm_step", "value": 0, "unit": "updates/s/chip", "vs_baseline": 0}))


if __name__ == "__main__":
    main()
