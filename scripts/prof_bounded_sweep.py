"""TPU microbenchmark: bounded vs unbounded flat pair sweep on the
cached clustered 256³ bench state's occupancy distribution.

Usage: timeout 580 python scripts/prof_bounded_sweep.py [--substep K]
"""

import sys; sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from concept_tpu.p3mrungs import (
        bucketize_rungs, _pencil_occ_ext, _pad16,
    )
    from concept_tpu.forces.pallas_shortrange import sweep_pallas_pair

    d = np.load(".bench_cache/p3m_clustered_256_0.12.npz")
    pos = d["pos"]  # (3, N)
    n_part = 256
    nc = 64
    box = float(pos.max()) * (1 + 1e-6)
    N = pos.shape[1]
    # bucketize at capacity from max occupancy
    cell = ((pos[0] / box * nc).astype(np.int64) * nc
            + (pos[1] / box * nc).astype(np.int64)) * nc \
        + (pos[2] / box * nc).astype(np.int64)
    counts = np.bincount(cell, minlength=nc**3)
    K = max(8, ((int(counts.max()) + 7) // 8) * 8)
    print(f"N={N} nc={nc} max_occ={counts.max()} K={K}", flush=True)
    rungs = jnp.zeros((N,), jnp.int8)
    ids = jnp.arange(N, dtype=jnp.int32)
    st, kept = bucketize_rungs(
        *(jnp.asarray(np.ascontiguousarray(pos[d_])) for d_ in range(3)),
        *(jnp.zeros((N,), jnp.float32) for _ in range(3)),
        rungs, ids, boxsize=box, nc=nc, capacity=K, NR=8, mesh_cells=8,
    )
    assert int(kept) == N
    K_occ = _pad16(int(counts.max()), K)
    ext = _pencil_occ_ext(st.valid, nc)
    big = jnp.float32(1e4 * box)
    sx = jnp.where(st.valid, st.pos[0], big)[:K_occ]
    sy = jnp.where(st.valid, st.pos[1], big)[:K_occ]
    sz = jnp.where(st.valid, st.pos[2], big)[:K_occ]
    v = st.valid[:K_occ]
    mesh = 2 * n_part
    scale = 1.25 * box / mesh
    cutoff = 4.5 * scale
    soft = 0.025 * box / n_part

    def run(tag, **kw):
        t0 = None
        for it in range(4):
            a = sweep_pallas_pair(
                sx, sy, sz, v, sx, sy, sz, v, nc, box, scale, cutoff,
                soft, kernel="spline", sentineled=True, **kw)
            a.block_until_ready()
            if it == 0:
                print(f"{tag}: compiled", flush=True)
                t0 = time.perf_counter()
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag}: {dt:.3f} s/sweep", flush=True)
        return a, dt

    ref, dt0 = run("unbounded")
    out, dt1 = run("bounded  ", rext=ext, sext=ext)
    rel = float(jnp.max(jnp.abs(ref - out)
                        / jnp.maximum(jnp.abs(ref), 1.0)))
    print(f"speedup {dt0 / dt1:.2f}x   max rel diff {rel:.2e}", flush=True)

    # substep-shaped: few active receivers concentrated in dense pencils
    for K_r in (8, 64):
        rext = jnp.minimum(ext, jnp.where(
            ext > np.quantile(np.asarray(ext), 0.97), K_r, 0)).astype(
            jnp.int32)
        bx, by, bz, bv = sx[:K_r], sy[:K_r], sz[:K_r], v[:K_r]

        def run_sub(tag, **kw):
            t0 = None
            for it in range(4):
                a = sweep_pallas_pair(
                    bx, by, bz, bv, sx, sy, sz, v, nc, box, scale,
                    cutoff, soft, kernel="spline", sentineled=True, **kw)
                a.block_until_ready()
                if it == 0:
                    t0 = time.perf_counter()
            print(f"{tag}: {(time.perf_counter() - t0) / 3:.3f} s/sweep",
                  flush=True)

        run_sub(f"substep K_r={K_r} unbounded")
        run_sub(f"substep K_r={K_r} bounded  ", rext=rext, sext=ext)


if __name__ == "__main__":
    main()
