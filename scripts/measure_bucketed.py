"""Measure dense-bucket deposit/gather vs plain paths on the local chip."""

import os
import time

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from concept_tpu.grid.bucketed import bucketize_blocks, deposit_bucketed, gather_bucketed
from concept_tpu.grid.interp import deposit, gather


def timeit(fn, reps=5):
    out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.real(leaf.reshape(1)[0] if leaf.ndim == 0 else leaf[(0,) * leaf.ndim]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.real(leaf[(0,) * leaf.ndim]))
    return (time.perf_counter() - t0) / reps


def main(n=128):
    box = 512.0
    N = n**3
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, box, (N, 3)).astype(np.float32))
    K = 32  # capacity per 2³-cell block (mean 8 at 1 ppc)

    f_bucket = jax.jit(lambda p: bucketize_blocks(p, 1.0, n, box, capacity=K))
    print(f"bucketize:       {timeit(lambda: f_bucket(pos))*1000:.1f} ms", flush=True)
    bk = f_bucket(pos)

    f_dep = jax.jit(lambda b, p: deposit_bucketed(b, n, pos=p, boxsize=box, q=1.0))
    print(f"deposit bucketed:{timeit(lambda: f_dep(bk, pos))*1000:.1f} ms", flush=True)

    grids = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    f_gat = jax.jit(lambda b, g, p: gather_bucketed(b, g, n, pos=p, boxsize=box))
    print(f"gather bucketed: {timeit(lambda: f_gat(bk, grids, pos))*1000:.1f} ms", flush=True)

    print(f"deposit sorted:  {timeit(lambda: deposit(pos, 1.0, n, box, order=2, method='sorted'))*1000:.1f} ms", flush=True)
    g0 = grids[0]
    print(f"gather plain x3: {timeit(lambda: jnp.stack([gather(g0, pos, box, order=2) for _ in range(3)]))*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()


def main_pallas(n=128):
    box = 512.0
    N = n**3
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, box, (N, 3)).astype(np.float32))
    K = 32
    from concept_tpu.grid.pallas_pm import deposit_pallas, gather_pallas

    bk = bucketize_blocks(pos, 1.0, n, box, capacity=K)
    f_dep = jax.jit(lambda b: deposit_pallas(b, n))
    print(f"deposit pallas:  {timeit(lambda: f_dep(bk))*1000:.1f} ms", flush=True)
    grids = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    f_gat = jax.jit(lambda b, g: gather_pallas(b, g, n))
    print(f"gather pallas:   {timeit(lambda: f_gat(bk, grids))*1000:.1f} ms", flush=True)


import sys
if len(sys.argv) > 1 and sys.argv[1] == "pallas":
    main_pallas()
    sys.exit(0)
