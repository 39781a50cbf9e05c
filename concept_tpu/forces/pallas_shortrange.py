"""Pallas TPU kernel for the P³M short-range pair sweep.

The XLA formulation (shortrange._sweep) is correct and O(C·K) in memory,
but its inner scan re-reads every neighbor-slot array per own-slot
iteration — ~4 TB of HBM traffic at 256³ (measured 5.1 s on v5e).  This
kernel keeps the cell columns VMEM-resident:

  * layout: the one-sided production sweep (sweep_pallas_pair) reads
    pencil windows DIRECTLY from the flat slot-major (K, C) arrays
    (C = n³, z-fastest cell ids, matching shortrange.bucketize): block
    specs slice (K, F·n) column windows, neighbor windows wrap via mod
    arithmetic in the index maps, and the wrapped copies' ±box
    own-coordinate corrections are per-program scalar adds in-kernel —
    no halo-padded copies, no (ci, cj, K, ck) relayout, no output
    transpose (measured ~0.4 s of memory plumbing per full 256³ sweep,
    and 2.2 GB of padded temporaries at 512³).  The two-sided and
    reach-2 variants below keep the original halo-padded
    (K, n+2, n+2, n) formulation;
  * invalid slots carry a FAR sentinel position instead of a mask — the
    r² < cutoff² cut eliminates them for free (one less input stream);
  * each program owns F adjacent z-pencils (lane packing to the 128
    VPU lanes) and reads its 9 neighbor pencil windows as aliased
    inputs of the same array with shifted index maps — every pencil is
    read 9×3 times total (~3 GB at 256³ vs the XLA sweep's ~4 TB);
  * the z direction (±1 cell) is handled in-VMEM by static rolls with a
    ±box correction column at the wrap;
  * the screening factor S(x) = erfc(x/2) + x/√π·e^(−x²/4) (reference
    gravity.py:373 get_shortrange_table) is evaluated as S = 1 + x·g(x²)
    with a Horner fit of g directly on r²/scale² — the reference
    tabulates for the same reason (transcendentals in the pair loop); a
    table is a gather on TPU, a polynomial is FMAs.

Reference semantics: interactions.py:1353-1984 (particle_particle) +
gravity.py:263-373, with the tile→pencil mapping described in
forces/shortrange.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl


# --------------------------------------------------------------------- #
# Polynomial fit of the screening S(x) = erfc(x/2) + x/√π·e^{−x²/4},
# x = r/scale ∈ [0, 4.5+ε].  S − 1 is an ODD entire function of x
# (erfc(−x/2) = 2 − erfc(x/2)), so S(x) = 1 + x·g(x²) with g entire in
# u = x² — the kernel evaluates g directly on u = r²/scale² and folds
# the leftover x into 1/r² (f = S·r⁻³ = r⁻³ + g(u)·r⁻²/scale): no
# r = √r² is ever formed for the screening, and the degree-10 fit in u
# beats the previous degree-12 fit in x (8.5e-7 vs 2e-6 abs in f32)
# at half the FMA count.  The reference tabulates S·r⁻³ for the same
# per-pair-transcendental reason (gravity.py:373).
# --------------------------------------------------------------------- #
_X_MAX = 4.6
_U_MAX = _X_MAX * _X_MAX
_G_DEG = 10


def _fit_screening_g(deg: int = _G_DEG):
    """Monomial (Horner) coefficients of g(t), t = 2u/u_max − 1, highest
    degree first — fitted in float64 via a Chebyshev basis (well
    conditioned), converted to the monomial-in-t form (|t| ≤ 1 keeps the
    Horner recurrence stable in f32)."""
    from math import erfc

    x = np.linspace(1e-9, _X_MAX, 8001)
    S = np.asarray([erfc(0.5 * xi) for xi in x])
    S = S + x / math.sqrt(math.pi) * np.exp(-0.25 * x * x)
    g = (S - 1.0) / x
    t = 2 * (x * x) / _U_MAX - 1
    coef = np.polynomial.chebyshev.chebfit(t, g, deg)
    mono = np.polynomial.chebyshev.cheb2poly(coef)
    Sv = 1.0 + x * np.polynomial.polynomial.polyval(t, mono)
    assert np.abs(Sv - S).max() < 1e-6, np.abs(Sv - S).max()
    return mono[::-1].astype(np.float32)  # highest degree first


_G_COEF = _fit_screening_g()


def screening_g(u):
    """g(u) = (S(√u) − 1)/√u via the Horner fit (float32, jnp — usable
    inside kernels and plain XLA).  u is clamped into the fitted range
    (beyond the cutoff the caller masks the result anyway; the clamp
    keeps far sentinels finite)."""
    t = jnp.minimum(2.0 * u / _U_MAX - 1.0, 1.0)
    g = jnp.full_like(t, _G_COEF[0])
    for c in _G_COEF[1:]:
        g = g * t + c
    return g


def screening_cheb(x):
    """S(x) = 1 + x·g(x²) (kept as the test/compat surface; the kernels
    use screening_g on u = x² directly)."""
    return 1.0 + x * screening_g(x * x)


# --------------------------------------------------------------------- #
# Kernel
# --------------------------------------------------------------------- #


def _make_accum(inv_scale, cutoff2, soft2, dtype, softening_kernel: str):
    """Shared per-neighbor-variant pair accumulation for the pencil
    kernels: (own xyz, neighbor xyz, acc xyz) → updated acc xyz, where
    own is (CH, 1, L), neighbor (·, K_s, L), acc (CH, L).

    For the GADGET spline kernel the r < 2.8ε piecewise correction is
    evaluated UNDER A BRANCH (lax.cond) fired only when the block
    actually contains a sub-spline-radius pair: the spline radius is a
    fraction of a mesh cell, so almost every (chunk × suppliers × lanes)
    block is pure far-field — measured 1.64 s → ~1.15 s on the 256³
    full sweep.  The branch recomputes S exactly (via the g fit), so
    the result is algebraically identical to the fused evaluation."""
    _force_factor = _force_law(inv_scale, soft2, dtype, softening_kernel)
    inv_scale2 = inv_scale * inv_scale

    def accum(ox, oy, oz, nbx, nby, nbz, ax, ay, az):
        dx = ox - nbx
        dy = oy - nby
        dz = oz - nbz
        r2 = dx * dx + dy * dy + dz * dz
        m = (r2 < cutoff2) & (r2 > 0)
        if softening_kernel != "spline":
            f = jnp.where(m, -_force_factor(r2), 0.0)
            return (
                ax + jnp.sum(f * dx, axis=1),
                ay + jnp.sum(f * dy, axis=1),
                az + jnp.sum(f * dz, axis=1),
            )
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, jnp.asarray(1e-30, dtype)))
        inv_r2 = inv_r * inv_r
        g = screening_g(r2 * inv_scale2)
        f = jnp.where(m, -(inv_r2 * (inv_r + inv_scale * g)), 0.0)
        ax = ax + jnp.sum(f * dx, axis=1)
        ay = ay + jnp.sum(f * dy, axis=1)
        az = az + jnp.sum(f * dz, axis=1)
        h2 = 7.84 * soft2  # (2.8 ε)²
        # the cutoff guard keeps the correction consistent with the
        # masked far field if a run is configured with 2.8·ε > cutoff
        # (the correction must never fire where the pair force is zero)
        near_m = (r2 > 0) & (r2 < h2) & (r2 < cutoff2)

        def with_corr(acc3):
            aX, aY, aZ = acc3
            r = r2 * inv_r
            S = 1.0 + (r * inv_scale) * g
            far = inv_r2 * inv_r
            eps = jnp.sqrt(soft2)
            h = 2.8 * eps
            inv_h = jnp.where(h > 0, 1.0 / jnp.maximum(h, 1e-30), 1e30)
            u = r * inv_h
            near = 32.0 * inv_h**3 * (1.0 / 3.0 + u * u * (-6.0 / 5.0 + u))
            mid = (32.0 / 3.0) * far * (
                u**3 * (2.0 + u * (-4.5 + u * (3.6 - u))) - 3.0 / 480.0
            )
            r3inv = jnp.where(u < 0.5, near, mid)
            corr = jnp.where(near_m, -(S * (r3inv - far)), 0.0)
            return (
                aX + jnp.sum(corr * dx, axis=1),
                aY + jnp.sum(corr * dy, axis=1),
                aZ + jnp.sum(corr * dz, axis=1),
            )

        return jax.lax.cond(
            jnp.any(near_m), with_corr, lambda a: a, (ax, ay, az)
        )

    return accum


def _force_law(inv_scale, soft2, dtype, softening_kernel: str):
    """S(x)·r⁻³_softened evaluator used inside the kernels — vector-only
    ops (FMAs + rsqrt + selects), per the softening_kernel static
    (reference get_softened_r3inv, interactions.py:1846-1910).

    Uses S(x) = 1 + x·g(x²):  S·r⁻³ = r⁻³ + g(r²/scale²)·r⁻²/scale,
    so the screening costs one Horner polynomial on the already-known r²
    (no x = r/scale, no clamp-heavy Clenshaw — ~16 fewer ops/pair)."""
    inv_scale2 = inv_scale * inv_scale

    def factor(r2):
        if softening_kernel == "plummer":
            r2s = r2 + soft2
            inv_r = jax.lax.rsqrt(r2s)
            inv_r2 = inv_r * inv_r
            g = screening_g(r2s * inv_scale2)
            return inv_r2 * (inv_r + inv_scale * g)
        inv_r = jax.lax.rsqrt(jnp.maximum(r2, jnp.asarray(1e-30, dtype)))
        inv_r2 = inv_r * inv_r
        far = inv_r2 * inv_r
        if softening_kernel == "none":
            g = screening_g(r2 * inv_scale2)
            return inv_r2 * (inv_r + inv_scale * g)
        r = r2 * inv_r
        S = 1.0 + (r * inv_scale) * screening_g(r2 * inv_scale2)
        # 'spline': GADGET-2 cubic spline, h = 2.8ε (soft2 = ε²)
        eps = jnp.sqrt(soft2)
        h = 2.8 * eps
        inv_h = jnp.where(h > 0, 1.0 / jnp.maximum(h, 1e-30), 1e30)
        u = r * inv_h
        near = 32.0 * inv_h**3 * (1.0 / 3.0 + u * u * (-6.0 / 5.0 + u))
        mid = (32.0 / 3.0) * far * (
            u**3 * (2.0 + u * (-4.5 + u * (3.6 - u))) - 3.0 / 480.0
        )
        r3inv = jnp.where(u >= 1.0, far, jnp.where(u < 0.5, near, mid))
        return S * r3inv

    return factor


def _make_kernel(n: int, K: int, dtype, softening_kernel: str = "plummer"):
    def kernel(scal_ref, *refs):
        # refs: 27 inputs (9 pencils × 3 components, each (1,1,K,n)),
        # then 3 outputs (1,1,K,n).  Last-two block dims (K,n) equal the
        # array dims (Mosaic tiling requirement); the cell axes lead.
        ins, outs = refs[:27], refs[27:]
        inv_scale = scal_ref[0]
        cutoff2 = scal_ref[1]
        soft2 = scal_ref[2]
        boxsize = scal_ref[3]
        own_ref_x, own_ref_y, own_ref_z = ins[4], ins[13], ins[22]
        accum = _make_accum(inv_scale, cutoff2, soft2, dtype,
                            softening_kernel)

        # z-wrap correction columns (static masks)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        wrap_hi = (col == n - 1).astype(dtype) * boxsize  # dk=+1: ck=n−1 ← ck=0
        wrap_lo = (col == 0).astype(dtype) * (-boxsize)   # dk=−1: ck=0 ← ck=n−1

        def shifted(arr, dk, is_z):
            if dk == 0:
                return arr
            out = jnp.roll(arr, -dk, axis=1)
            if is_z:
                out = out + (wrap_hi if dk == 1 else wrap_lo)
            return out

        # 27 shifted neighbor variants, hoisted (VMEM ~81·K·n·4B ≈ 1.3 MB)
        nbs = []
        for p in range(9):
            bx = ins[p][0, 0]
            by = ins[9 + p][0, 0]
            bz = ins[18 + p][0, 0]
            for dk in (-1, 0, 1):
                nbs.append((
                    shifted(bx, dk, False)[None, :, :],  # (1, K, n)
                    shifted(by, dk, False)[None, :, :],
                    shifted(bz, dk, True)[None, :, :],
                ))

        # own slots in chunks of CH: (CH, K, n) pair blocks keep the VMEM
        # stack bounded (a single (K, K, n) block per combo × 27 unrolled
        # combos OOMed the 16 MB scoped vmem at K = 32, n = 91), while a
        # per-slot loop (CH = 1) was issue-bound (3.5 s at 256³).
        CH = 8 if K % 8 == 0 else 1
        nchunk = K // CH

        def body(c, _):
            s = pl.multiple_of(c * CH, CH)
            ox = own_ref_x[0, 0, pl.ds(s, CH), :][:, None, :]  # (CH, 1, n)
            oy = own_ref_y[0, 0, pl.ds(s, CH), :][:, None, :]
            oz = own_ref_z[0, 0, pl.ds(s, CH), :][:, None, :]
            ax = jnp.zeros((CH, n), dtype)
            ay = jnp.zeros((CH, n), dtype)
            az = jnp.zeros((CH, n), dtype)
            for nbx, nby, nbz in nbs:
                ax, ay, az = accum(ox, oy, oz, nbx, nby, nbz, ax, ay, az)
            outs[0][0, 0, pl.ds(s, CH), :] = ax
            outs[1][0, 0, pl.ds(s, CH), :] = ay
            outs[2][0, 0, pl.ds(s, CH), :] = az
            return 0

        jax.lax.fori_loop(0, nchunk, body, 0)

    return kernel


def _make_pair_kernel_flat_bounded(n: int, F: int, K_r: int, K_s: int,
                                   njb: int, SC: int, dtype,
                                   softening_kernel: str = "plummer"):
    """Per-window row-bounded variant of _make_pair_kernel_flat.

    Two scalar-prefetched int32 arrays (n·njb,) carry per-window row
    bounds: rbound (receiver rows that can hold a valid receiver in
    THIS window) and sbound (supplier rows that can hold a valid slot
    in ANY of the window's 9 neighbor windows).  Clustered states skew
    per-cell occupancy hard (256³ bench state: global max 224 rows vs
    pencil-window mean 124, and rung-substep receivers concentrate in
    few windows), so bounding each program by its LOCAL extent instead
    of the global max converts occupancy skew directly into time:

      * rbound == 0 ⇒ the whole program is skipped (outputs zeroed) —
        rung substeps with few active cells skip ~everything;
      * the receiver chunk loop runs ceil(min(rbound, K_r)/CH) chunks;
      * suppliers are processed in SC-row subchunks up to
        ceil(min(sbound, K_s)/SC) — and because the 27 shifted
        neighbor variants are built per SUBCHUNK (not hoisted at full
        K_s), the kernel's live VMEM no longer scales with K_s, which
        also lifts the full-hoist formulation's Mosaic compile ceiling
        (_pack_k_cap) — no outer supplier chunking needed.

    Rows ≥ the bound MUST be invalid (sentinel-filled) in every column
    of the window — the caller derives bounds from per-pencil layout
    extents (see sweep_pallas_pair rext/sext).  Skipped rows produce
    acc = 0, exactly what sentinel pairs produce anyway."""

    def kernel(rbound_ref, sbound_ref, scal_ref, *refs):
        own, ins, outs = refs[:3], refs[3:30], refs[30:]
        inv_scale = scal_ref[0]
        cutoff2 = scal_ref[1]
        soft2 = scal_ref[2]
        boxsize = scal_ref[3]
        accum = _make_accum(inv_scale, cutoff2, soft2, dtype,
                            softening_kernel)
        i = pl.program_id(0)
        j = pl.program_id(1)
        w = i * njb + j
        rmax = jnp.minimum(rbound_ref[w], K_r)
        smax = jnp.minimum(sbound_ref[w], K_s)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        wrap_hi = (col == n - 1).astype(dtype) * boxsize
        wrap_lo = (col == 0).astype(dtype) * (-boxsize)

        def shifted(arr, dk, is_z):
            if dk == 0:
                return arr
            out = jnp.roll(arr, -dk, axis=1)
            if is_z:
                out = out + (wrap_hi if dk == 1 else wrap_lo)
            return out

        def win(c, di, djw):
            return ins[c * 9 + (di + 1) * 3 + (djw + 1)]

        zero = jnp.asarray(0.0, dtype)
        xcorr = {
            -1: jnp.where(i == 0, -boxsize, zero),
            0: zero,
            1: jnp.where(i == n - 1, boxsize, zero),
        }
        ycorr = {
            -1: jnp.where(j == 0, -boxsize, zero),
            0: zero,
            1: jnp.where(j == njb - 1, boxsize, zero),
        }

        CH = 8 if K_r % 8 == 0 else 1
        nF = F * n
        zeros_out = jnp.zeros((K_r, nF), dtype)
        outs[0][...] = zeros_out
        outs[1][...] = zeros_out
        outs[2][...] = zeros_out

        def sup_block(ss):
            """27 shifted (SC, F·n) supplier variants for rows
            [ss, ss+SC) — built on demand per subchunk (the build is
            ~2% of the accum FMAs at CH = 8)."""
            nbs = []
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    pieces = [[], [], []]
                    for h in range(F):
                        p = h + dj
                        djw, hh = p // F, p % F
                        for c in range(3):
                            piece = win(c, di, djw)[
                                pl.ds(ss, SC), hh * n:(hh + 1) * n]
                            if c == 0 and di != 0:
                                piece = piece + xcorr[di]
                            elif c == 1 and djw != 0:
                                piece = piece + ycorr[djw]
                            pieces[c].append(piece)
                    for dk in (-1, 0, 1):
                        nbs.append(tuple(
                            jnp.concatenate(
                                [shifted(p, dk, c == 2) for p in pieces[c]],
                                axis=1,
                            ) if F > 1 else shifted(pieces[c][0], dk, c == 2)
                            for c in range(3)
                        ))
            return nbs

        @pl.when((rmax > 0) & (smax > 0))
        def _run():
            n_rchunk = (rmax + CH - 1) // CH
            n_schunk = (smax + SC - 1) // SC

            def body(ci, _):
                s = pl.multiple_of(ci * CH, CH)
                ox = own[0][pl.ds(s, CH), :][:, None, :]
                oy = own[1][pl.ds(s, CH), :][:, None, :]
                oz = own[2][pl.ds(s, CH), :][:, None, :]

                def sbody(si, accs):
                    ax, ay, az = accs
                    ss = pl.multiple_of(si * SC, SC)
                    for nbx, nby, nbz in sup_block(ss):
                        ax, ay, az = accum(ox, oy, oz, nbx, nby, nbz,
                                           ax, ay, az)
                    return (ax, ay, az)

                ax, ay, az = jax.lax.fori_loop(
                    0, n_schunk, sbody,
                    (jnp.zeros((CH, nF), dtype),
                     jnp.zeros((CH, nF), dtype),
                     jnp.zeros((CH, nF), dtype)),
                )
                outs[0][pl.ds(s, CH), :] = ax
                outs[1][pl.ds(s, CH), :] = ay
                outs[2][pl.ds(s, CH), :] = az
                return 0

            jax.lax.fori_loop(0, n_rchunk, body, 0)

    return kernel


def _window_bounds(ext, n: int, F: int, neighbors: bool):
    """Per-pencil layout extents (n²,) → per-window row bounds (n·njb,)
    at pack factor F.  neighbors=True additionally maxes over the 9
    windows a program reads as suppliers ((i±1) mod n, (j±1) mod njb)."""
    njb = n // F
    w = ext.reshape(n, njb, F).max(axis=2)
    if neighbors:
        m = w
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                m = jnp.maximum(m, jnp.roll(jnp.roll(w, di, 0), dj, 1))
        w = m
    return w.reshape(n * njb)


_SUP_SUBCHUNK = 32  # supplier rows per in-kernel subchunk (sublane ×4)


def _pad_halo(arr, axis_coord: int | None, boxsize, pad: int = 1):
    """(n, n, K, n) → (n+2·pad, n+2·pad, K, n): periodic wrap copies along
    the two leading cell axes; when axis_coord is 0 or 1, the wrapped
    copies of that coordinate get ∓box (position continuity across the
    face)."""
    lo1 = arr[-pad:, :, :, :] + (-boxsize if axis_coord == 0 else 0.0)
    hi1 = arr[:pad, :, :, :] + (boxsize if axis_coord == 0 else 0.0)
    arr = jnp.concatenate([lo1, arr, hi1], axis=0)
    lo2 = arr[:, -pad:, :, :] + (-boxsize if axis_coord == 1 else 0.0)
    hi2 = arr[:, :pad, :, :] + (boxsize if axis_coord == 1 else 0.0)
    return jnp.concatenate([lo2, arr, hi2], axis=1)


def _pack_factor(n: int) -> int:
    """Lane-packing factor F: process F adjacent cj-pencils per kernel
    program with the z-cell lane dimension widened to F·n.  TPU vector
    lanes are 128 wide — at n = 64 (the unified cb=8 layout of a 256³ /
    512-mesh run) an unpacked kernel idles HALF the VPU on every op
    (measured: the whole sweep ran at ~8% of peak).  F must divide n
    (grid tiling) and F·n ≤ 128."""
    best = 1
    for f in range(2, 128 // n + 1 if n <= 64 else 1):
        if n % f == 0 and f * n <= 128:
            best = f
    return best


# Measured Mosaic compile ceilings for the pair kernels on v5e (2026-08,
# remote tpu_compile_helper): the supplier row count K_s above which the
# kernel CRASHES the compiler (subprocess exit 1, not a clean error).
# The ceiling depends on BOTH the pencil length n and the pack factor F
# with no single closed form — verified OK / first-failing points:
#   n=16: F=8 K 32 OK / 64 fail
#   n=32: F=4 K 64 OK / 96 fail
#   n=64: F=2 K 104 OK / 128 fail
# The flat-(K, C) kernel's window lane width is F·n, and the Mosaic
# lowering additionally requires block lane dims be MULTIPLES OF 128 (or
# the whole array): F·n = 128 is the only admissible packing for
# n ≤ 128, so degrading F below the lane-valid factor is NOT a legal
# escape past the ceiling (round-5 failure: K_s = 136 at n = 64 picked
# F = 1 → lane 64 → lowering error).  Past the ceiling the supplier
# axis is CHUNKED into ≤-cap sweeps summed outside the kernel instead —
# slower, never broken.


def _lane_valid_packs(n: int, C: int):
    """Pack factors F whose flat-(K, C) window lane width F·n the Mosaic
    lowering accepts: a multiple of 128, or the entire array (F·n = C).
    F must divide n (grid tiling)."""
    out = []
    for f in range(1, n + 1):
        if n % f:
            continue
        lane = f * n
        if lane > 128:
            break  # wider windows are unverified and only waste VMEM
        if lane == 128 or lane == C:
            out.append(f)
    return out


def _pack_k_cap(n: int, f: int) -> int:
    """Verified-safe supplier-row ceiling for pack factor f at pencil n
    (lane-128 windows; unverified combos get the conservative floor)."""
    caps = {(16, 8): 32, (32, 4): 64, (64, 2): 104}
    if (n, f) in caps:
        return caps[(n, f)]
    # unverified lane-valid combo (e.g. n ≥ 128 at F = 1): the hoisted
    # neighbor windows' VMEM footprint scales with K_s·(F·n) just as the
    # verified n = 64 point, so inherit its ceiling
    return 104


def _auto_pack(n: int, K_s: int, C: int) -> int:
    """Largest lane-valid pack factor admitting K_s supplier rows, or 0
    when every lane-valid factor's ceiling is exceeded (caller must
    chunk the supplier axis at _pack_k_cap(n, _chunk_pack(n, C)))."""
    fs = _lane_valid_packs(n, C)
    if not fs:
        # no lane-valid packing exists (tiny n): fall back to F = 1 and
        # let the lowering complain — such grids belong on the XLA/
        # interpret path
        return 1
    ok = [f for f in fs if K_s <= _pack_k_cap(n, f)]
    return max(ok) if ok else 0


def _chunk_pack(n: int, C: int) -> int:
    """The lane-valid factor with the largest ceiling (chunking target)."""
    fs = _lane_valid_packs(n, C)
    return max(fs, key=lambda f: _pack_k_cap(n, f)) if fs else 1


def _make_pair_kernel_flat(n: int, F: int, K_r: int, K_s: int, njb: int,
                           dtype, softening_kernel: str = "plummer"):
    """Flat-(K, C) lane-packed one-sided kernel: blocks are direct
    column windows of the (K, C) slot arrays (C = n³, z-fastest flat
    cell ids), so the caller needs NO halo padding, NO (ci,cj,K,ck)
    relayout and NO output transpose — measured ~0.4 s of pure memory
    plumbing per full 256³ sweep, and 2.2 GB of padded temporaries at
    512³.  Periodic wrap is handled here: index maps wrap block indices
    (mod), and the wrapped copies' own-coordinate ±box correction is a
    per-program scalar add (x: program row at the i edge; y: per piece
    at the j edge; z: roll correction columns as before).

    refs: scal (4,); 3 receiver blocks (K_r, F·n); 27 supplier windows
    (K_s, F·n) ordered [comp][di ∈ −1,0,1][djw ∈ −1,0,1]; 3 outputs
    (K_r, F·n)."""

    def kernel(scal_ref, *refs):
        own, ins, outs = refs[:3], refs[3:30], refs[30:]
        inv_scale = scal_ref[0]
        cutoff2 = scal_ref[1]
        soft2 = scal_ref[2]
        boxsize = scal_ref[3]
        accum = _make_accum(inv_scale, cutoff2, soft2, dtype,
                            softening_kernel)
        i = pl.program_id(0)
        j = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        wrap_hi = (col == n - 1).astype(dtype) * boxsize
        wrap_lo = (col == 0).astype(dtype) * (-boxsize)

        def shifted(arr, dk, is_z):
            if dk == 0:
                return arr
            out = jnp.roll(arr, -dk, axis=1)
            if is_z:
                out = out + (wrap_hi if dk == 1 else wrap_lo)
            return out

        def win(c, di, djw):
            return ins[c * 9 + (di + 1) * 3 + (djw + 1)]

        zero = jnp.asarray(0.0, dtype)
        xcorr = {
            -1: jnp.where(i == 0, -boxsize, zero),
            0: zero,
            1: jnp.where(i == n - 1, boxsize, zero),
        }
        ycorr = {
            -1: jnp.where(j == 0, -boxsize, zero),
            0: zero,
            1: jnp.where(j == njb - 1, boxsize, zero),
        }

        nbs = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                pieces = [[], [], []]
                for h in range(F):
                    p = h + dj
                    djw, hh = p // F, p % F  # Python floor/mod: −1//F=−1 ✓
                    for c in range(3):
                        piece = win(c, di, djw)[:, hh * n:(hh + 1) * n]
                        if c == 0 and di != 0:
                            piece = piece + xcorr[di]
                        elif c == 1 and djw != 0:
                            piece = piece + ycorr[djw]
                        pieces[c].append(piece)
                for dk in (-1, 0, 1):
                    # z-shift PER PIECE (a roll across the F·n concat
                    # would leak slots between adjacent pencils)
                    nbs.append(tuple(
                        jnp.concatenate(
                            [shifted(p, dk, c == 2) for p in pieces[c]],
                            axis=1,
                        ) if F > 1 else shifted(pieces[c][0], dk, c == 2)
                        for c in range(3)
                    ))

        CH = 8 if K_r % 8 == 0 else 1
        nchunk = K_r // CH
        nF = F * n

        def body(ci, _):
            s = pl.multiple_of(ci * CH, CH)
            ox = own[0][pl.ds(s, CH), :][:, None, :]  # (CH, 1, F·n)
            oy = own[1][pl.ds(s, CH), :][:, None, :]
            oz = own[2][pl.ds(s, CH), :][:, None, :]
            ax = jnp.zeros((CH, nF), dtype)
            ay = jnp.zeros((CH, nF), dtype)
            az = jnp.zeros((CH, nF), dtype)
            for nbx, nby, nbz in nbs:
                ax, ay, az = accum(ox, oy, oz, nbx, nby, nbz, ax, ay, az)
            outs[0][pl.ds(s, CH), :] = ax
            outs[1][pl.ds(s, CH), :] = ay
            outs[2][pl.ds(s, CH), :] = az
            return 0

        jax.lax.fori_loop(0, nchunk, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("n_cells", "interpret", "kernel", "pack",
                                   "sentineled"))
def sweep_pallas_pair(bx, by, bz, bvalid, hx, hy, hz, valid, n_cells: int,
                      boxsize, scale, cutoff, softening,
                      interpret: bool = False, kernel: str = "plummer",
                      pack: int | None = None, sentineled: bool = False,
                      rext=None, sext=None):
    """One-sided pencil sweep: acc (3, K_r, C) ON the receiver buckets
    FROM the supplier buckets (same contract as shortrange._sweep_pair).
    pack: lane-packing factor override (None = auto: 1 in interpret
    mode, else the largest divisor of n with F·n ≤ 128 whose measured
    compile ceiling admits K_s — see _PACK_K_CAP).
    sentineled=True: the caller already replaced invalid slots with the
    far sentinel 1e4·box (one shared sentinel array for both sides
    saves the 6 masking copies — 4.4 GB of transients at 512³; a shared
    sentinel VALUE is safe because coincident sentinels give r² = 0,
    which the r² > 0 cut excludes).
    rext/sext: optional per-PENCIL (n²,) int32 LAYOUT extents — every
    valid receiver (supplier) slot of pencil p lives in a row < rext[p]
    (sext[p]).  When given, the per-window row-bounded kernel is used:
    programs skip rows/subchunks/whole windows beyond their local
    extents (clustered-occupancy skew → time; see
    _make_pair_kernel_flat_bounded).  Requires sentineled inputs (the
    bound rows are zeroed, never masked)."""
    n = n_cells
    assert n >= 3
    K_r, C = bvalid.shape
    K_s = valid.shape[0]
    bounded = rext is not None
    if bounded:
        assert sext is not None and sentineled
        fs = _lane_valid_packs(n, C)
        if not fs:
            bounded = False  # tiny grids: XLA fallback below handles it
    if bounded:
        dtype = hx.dtype
        from jax.experimental.pallas import tpu as pltpu

        F = max(fs) if pack is None else pack
        assert n % F == 0
        njb = n // F
        if K_s % 32 == 0:
            SC = 32
        elif K_s % 16 == 0:
            SC = 16
        elif K_s % 8 == 0:
            SC = 8
        else:
            SC = K_s
        rbound = _window_bounds(rext.astype(jnp.int32), n, F, False)
        sbound = _window_bounds(sext.astype(jnp.int32), n, F, True)
        scal = jnp.stack([
            1.0 / jnp.asarray(scale, dtype),
            jnp.asarray(cutoff, dtype) ** 2,
            jnp.asarray(softening, dtype) ** 2,
            jnp.asarray(boxsize, dtype),
        ])
        own_spec = pl.BlockSpec((K_r, F * n),
                                lambda i, j, *_: (0, i * njb + j))
        sup = lambda di, djw: pl.BlockSpec(
            (K_s, F * n),
            lambda i, j, *_, di=di, djw=djw: (
                0, ((i + di) % n) * njb + ((j + djw) % njb)
            ),
        )
        in_specs = [pl.BlockSpec((4,), lambda i, j, *_: (0,))]
        in_specs += [own_spec] * 3
        for _comp in range(3):
            in_specs += [sup(di, djw)
                         for di in (-1, 0, 1) for djw in (-1, 0, 1)]
        kfn = _make_pair_kernel_flat_bounded(
            n, F, K_r, K_s, njb, SC, dtype, softening_kernel=kernel)
        outs = pl.pallas_call(
            kfn,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n, njb),
                in_specs=in_specs,
                out_specs=[own_spec] * 3,
            ),
            out_shape=[jax.ShapeDtypeStruct((K_r, C), dtype)] * 3,
            interpret=interpret,
        )(rbound, sbound, scal, bx, by, bz,
          *([hx] * 9 + [hy] * 9 + [hz] * 9))
        return jnp.stack(outs)
    if not interpret and pack is None:
        if not _lane_valid_packs(n, C):
            # tiny grids (n·F can never reach the 128-lane tile): the
            # flat kernel cannot lower — use the XLA sweep (identical
            # contract; such grids are far below the Pallas payoff size)
            from concept_tpu.forces.shortrange import _sweep_pair

            dtype = hx.dtype
            return _sweep_pair(
                bx, by, bz, bvalid, hx, hy, hz, valid, n,
                jnp.asarray(boxsize, dtype), jnp.asarray(scale, dtype),
                jnp.asarray(cutoff, dtype) ** 2,
                jnp.asarray(softening, dtype) ** 2, kernel=kernel,
            )
        F_auto = _auto_pack(n, K_s, C)
        if F_auto == 0:
            # supplier rows beyond every lane-valid factor's compile
            # ceiling: split the supplier axis into ≤-cap chunks and sum
            # the accelerations (one-sided sweep ⇒ exactly linear).
            # Chunks are sized to multiples of 8 (sublane tiling).
            cap = (_pack_k_cap(n, _chunk_pack(n, C)) // 8) * 8
            nchunk = -(-K_s // cap)
            acc = None
            for c in range(nchunk):
                lo, hi = c * cap, min((c + 1) * cap, K_s)
                a = sweep_pallas_pair(
                    bx, by, bz, bvalid,
                    hx[lo:hi], hy[lo:hi], hz[lo:hi], valid[lo:hi],
                    n_cells, boxsize, scale, cutoff, softening,
                    interpret=interpret, kernel=kernel,
                    sentineled=sentineled,
                )
                acc = a if acc is None else acc + a
            return acc
    dtype = hx.dtype
    assert C == n**3, (C, n)
    if sentineled:
        bxs, bys, bzs = bx, by, bz
        hxs, hys, hzs = hx, hy, hz
    else:
        big = jnp.asarray(1e4, dtype) * boxsize
        bxs = jnp.where(bvalid, bx, big)
        bys = jnp.where(bvalid, by, big)
        bzs = jnp.where(bvalid, bz, big)
        hxs = jnp.where(valid, hx, big)
        hys = jnp.where(valid, hy, big)
        hzs = jnp.where(valid, hz, big)

    scal = jnp.stack([
        1.0 / jnp.asarray(scale, dtype),
        jnp.asarray(cutoff, dtype) ** 2,
        jnp.asarray(softening, dtype) ** 2,
        jnp.asarray(boxsize, dtype),
    ])

    F = pack if pack is not None else (1 if interpret else _auto_pack(n, K_s, C))
    assert n % F == 0 and F * n <= 256 and F >= 1
    njb = n // F
    own_spec = pl.BlockSpec((K_r, F * n), lambda i, j: (0, i * njb + j))
    sup = lambda di, djw: pl.BlockSpec(
        (K_s, F * n),
        lambda i, j, di=di, djw=djw: (
            0, ((i + di) % n) * njb + ((j + djw) % njb)
        ),
    )
    in_specs = [pl.BlockSpec((4,), lambda i, j: (0,))]
    in_specs += [own_spec] * 3
    for _comp in range(3):
        in_specs += [sup(di, djw) for di in (-1, 0, 1) for djw in (-1, 0, 1)]
    kfn = _make_pair_kernel_flat(n, F, K_r, K_s, njb, dtype,
                                 softening_kernel=kernel)
    outs = pl.pallas_call(
        kfn,
        grid=(n, njb),
        out_shape=[jax.ShapeDtypeStruct((K_r, C), dtype)] * 3,
        in_specs=in_specs,
        out_specs=[own_spec] * 3,
        interpret=interpret,
    )(scal, bxs, bys, bzs, *([hxs] * 9 + [hys] * 9 + [hzs] * 9))
    return jnp.stack(outs)


def kept_offsets(cell_width: float, cutoff: float, margin: float,
                 reach: int = 2):
    """Static neighbor-offset list for cells NARROWER than the cutoff
    (the unified 4-mesh-cell layout): all (di, dj, dk) ∈ [−reach, reach]³
    whose minimum box-to-box gap cell_width·√Σ max(|d|−1, 0)² is below
    cutoff + 2·margin (pairs further apart can never interact, even
    after both particles drift by the rebucketize margin)."""
    keep = []
    thresh = cutoff + 2.0 * margin
    for di in range(-reach, reach + 1):
        for dj in range(-reach, reach + 1):
            for dk in range(-reach, reach + 1):
                gap = cell_width * math.sqrt(
                    max(abs(di) - 1, 0) ** 2
                    + max(abs(dj) - 1, 0) ** 2
                    + max(abs(dk) - 1, 0) ** 2
                )
                if gap < thresh:
                    keep.append((di, dj, dk))
    return tuple(keep)


def _make_kernel_reach(n: int, K: int, dtype, offsets, reach: int,
                       softening_kernel: str = "plummer"):
    """Pencil kernel generalized to |offset| ≤ reach with a static kept-
    offset list (narrow-cell unified layout; see kept_offsets).  refs:
    P = (2·reach+1)² pencils × 3 components, then 3 outputs."""
    P = (2 * reach + 1) ** 2
    side = 2 * reach + 1

    def kernel(scal_ref, *refs):
        ins, outs = refs[: 3 * P], refs[3 * P:]
        inv_scale = scal_ref[0]
        cutoff2 = scal_ref[1]
        soft2 = scal_ref[2]
        boxsize = scal_ref[3]
        own_p = (reach * side + reach)  # (di, dj) = (0, 0) pencil
        own_ref_x = ins[own_p]
        own_ref_y = ins[P + own_p]
        own_ref_z = ins[2 * P + own_p]
        accum = _make_accum(inv_scale, cutoff2, soft2, dtype,
                            softening_kernel)

        # z-wrap correction columns for |dk| ≤ reach
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def shifted(arr, dk, is_z):
            if dk == 0:
                return arr
            out = jnp.roll(arr, -dk, axis=1)
            if is_z:
                if dk > 0:
                    corr = (col >= n - dk).astype(dtype) * boxsize
                else:
                    corr = (col < -dk).astype(dtype) * (-boxsize)
                out = out + corr
            return out

        # hoist kept neighbor variants (VMEM ~3·|offsets|·K·n·4 B)
        nbs = []
        for (di, dj, dk) in offsets:
            p = (di + reach) * side + (dj + reach)
            bx = ins[p][0, 0]
            by = ins[P + p][0, 0]
            bz = ins[2 * P + p][0, 0]
            nbs.append((
                shifted(bx, dk, False)[None, :, :],
                shifted(by, dk, False)[None, :, :],
                shifted(bz, dk, True)[None, :, :],
            ))

        CH = 8 if K % 8 == 0 else 1
        nchunk = K // CH

        def body(c, _):
            s = pl.multiple_of(c * CH, CH)
            ox = own_ref_x[0, 0, pl.ds(s, CH), :][:, None, :]
            oy = own_ref_y[0, 0, pl.ds(s, CH), :][:, None, :]
            oz = own_ref_z[0, 0, pl.ds(s, CH), :][:, None, :]
            ax = jnp.zeros((CH, n), dtype)
            ay = jnp.zeros((CH, n), dtype)
            az = jnp.zeros((CH, n), dtype)
            for nbx, nby, nbz in nbs:
                ax, ay, az = accum(ox, oy, oz, nbx, nby, nbz, ax, ay, az)
            outs[0][0, 0, pl.ds(s, CH), :] = ax
            outs[1][0, 0, pl.ds(s, CH), :] = ay
            outs[2][0, 0, pl.ds(s, CH), :] = az
            return 0

        jax.lax.fori_loop(0, nchunk, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("n_cells", "cell_width", "margin",
                                   "reach", "interpret", "kernel"))
def sweep_pallas_reach(hx, hy, hz, valid, n_cells: int, boxsize, scale,
                       cutoff, softening, cell_width: float, margin: float,
                       reach: int = 2, interpret: bool = False,
                       kernel: str = "plummer"):
    """Short-range pair sweep for cells NARROWER than the cutoff: exact
    same contract as sweep_pallas, but neighbor offsets extend to
    |d| ≤ reach with box-gap pruning (kept_offsets).  Used by the
    unified 4-mesh-cell P³M layout where cell_width = 4·mesh_cell <
    cutoff = 5.625·mesh_cell (reach 2 covers 8 ≥ cutoff + 2·margin).

    The offset pruning uses the STATIC unified-layout cutoff
    (4.5·1.25/4)·cell_width — the traced ``cutoff`` argument drives only
    the exact in-kernel r² cut."""
    n = n_cells
    side = 2 * reach + 1
    assert n >= side, f"pallas reach-{reach} sweep needs n_cells ≥ {side}"
    cutoff_stat = (4.5 * 1.25 / 4.0) * cell_width
    assert reach * cell_width >= cutoff_stat, (
        "reach too small: farthest kept offset does not cover the cutoff"
    )
    offsets = kept_offsets(cell_width, cutoff_stat, margin, reach)
    K, C = valid.shape
    dtype = hx.dtype
    big = jnp.asarray(1e4, dtype) * boxsize
    hx = jnp.where(valid, hx, big)
    hy = jnp.where(valid, hy, big)
    hz = jnp.where(valid, hz, big)

    def to4(a):
        return a.reshape(K, n, n, n).transpose(1, 2, 0, 3)

    px = _pad_halo(to4(hx), 0, boxsize, pad=reach)
    py = _pad_halo(to4(hy), 1, boxsize, pad=reach)
    pz = _pad_halo(to4(hz), None, boxsize, pad=reach)
    shape4 = (n, n, K, n)

    scal = jnp.stack([
        1.0 / jnp.asarray(scale, dtype),
        jnp.asarray(cutoff, dtype) ** 2,
        jnp.asarray(softening, dtype) ** 2,
        jnp.asarray(boxsize, dtype),
    ])

    pencil = lambda di, dj: pl.BlockSpec(
        (1, 1, K, n),
        lambda i, j, di=di, dj=dj: (i + reach + di, j + reach + dj, 0, 0),
    )
    in_specs = [pl.BlockSpec((4,), lambda i, j: (0,))]
    offs2 = [
        (di, dj)
        for di in range(-reach, reach + 1)
        for dj in range(-reach, reach + 1)
    ]
    for _comp in range(3):
        in_specs += [pencil(di, dj) for (di, dj) in offs2]
    out_spec = pl.BlockSpec((1, 1, K, n), lambda i, j: (i, j, 0, 0))

    kfn = _make_kernel_reach(n, K, dtype, offsets, reach,
                             softening_kernel=kernel)
    P = side * side
    outs = pl.pallas_call(
        kfn,
        grid=(n, n),
        out_shape=[jax.ShapeDtypeStruct(shape4, dtype)] * 3,
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        interpret=interpret,
    )(scal, *([px] * P + [py] * P + [pz] * P))
    return jnp.stack([o.transpose(2, 0, 1, 3).reshape(K, C) for o in outs])


def _make_pair_kernel_reach(n: int, K_r: int, K_s: int, dtype, offsets,
                            reach: int, softening_kernel: str = "plummer"):
    """One-sided reach variant: receivers (own pencil, (1,1,K_r,n))
    against suppliers over the kept offsets ≤ reach."""
    P = (2 * reach + 1) ** 2
    side = 2 * reach + 1

    def kernel(scal_ref, *refs):
        own, ins, outs = refs[:3], refs[3 : 3 + 3 * P], refs[3 + 3 * P:]
        inv_scale = scal_ref[0]
        cutoff2 = scal_ref[1]
        soft2 = scal_ref[2]
        boxsize = scal_ref[3]
        accum = _make_accum(inv_scale, cutoff2, soft2, dtype,
                            softening_kernel)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def shifted(arr, dk, is_z):
            if dk == 0:
                return arr
            out = jnp.roll(arr, -dk, axis=1)
            if is_z:
                if dk > 0:
                    corr = (col >= n - dk).astype(dtype) * boxsize
                else:
                    corr = (col < -dk).astype(dtype) * (-boxsize)
                out = out + corr
            return out

        nbs = []
        for (di, dj, dk) in offsets:
            p = (di + reach) * side + (dj + reach)
            bx = ins[p][0, 0]
            by = ins[P + p][0, 0]
            bz = ins[2 * P + p][0, 0]
            nbs.append((
                shifted(bx, dk, False)[None, :, :],
                shifted(by, dk, False)[None, :, :],
                shifted(bz, dk, True)[None, :, :],
            ))

        CH = 8 if K_r % 8 == 0 else 1  # (CH = K_r measured SLOWER:
        # 4.2 s vs 3.2 s at K = 24, n = 128 — large blocks spill VMEM)
        nchunk = K_r // CH

        def body(c, _):
            s = pl.multiple_of(c * CH, CH)
            ox = own[0][0, 0, pl.ds(s, CH), :][:, None, :]
            oy = own[1][0, 0, pl.ds(s, CH), :][:, None, :]
            oz = own[2][0, 0, pl.ds(s, CH), :][:, None, :]
            ax = jnp.zeros((CH, n), dtype)
            ay = jnp.zeros((CH, n), dtype)
            az = jnp.zeros((CH, n), dtype)
            for nbx, nby, nbz in nbs:
                ax, ay, az = accum(ox, oy, oz, nbx, nby, nbz, ax, ay, az)
            outs[0][0, 0, pl.ds(s, CH), :] = ax
            outs[1][0, 0, pl.ds(s, CH), :] = ay
            outs[2][0, 0, pl.ds(s, CH), :] = az
            return 0

        jax.lax.fori_loop(0, nchunk, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("n_cells", "cell_width", "margin",
                                   "reach", "interpret", "kernel"))
def sweep_pallas_pair_reach(bx, by, bz, bvalid, hx, hy, hz, valid,
                            n_cells: int, boxsize, scale, cutoff, softening,
                            cell_width: float, margin: float, reach: int = 2,
                            interpret: bool = False,
                            kernel: str = "plummer"):
    """One-sided reach-2 pencil sweep (narrow-cell unified layout): acc
    (3, K_r, C) ON the receiver buckets FROM the supplier buckets.
    Offset pruning from the static unified-layout cutoff (see
    sweep_pallas_reach)."""
    n = n_cells
    side = 2 * reach + 1
    assert n >= side
    cutoff_stat = (4.5 * 1.25 / 4.0) * cell_width
    assert reach * cell_width >= cutoff_stat
    offsets = kept_offsets(cell_width, cutoff_stat, margin, reach)
    K_r, C = bvalid.shape
    K_s = valid.shape[0]
    dtype = hx.dtype
    big = jnp.asarray(1e4, dtype) * boxsize
    bxs = jnp.where(bvalid, bx, -big)
    bys = jnp.where(bvalid, by, -big)
    bzs = jnp.where(bvalid, bz, -big)
    hxs = jnp.where(valid, hx, big)
    hys = jnp.where(valid, hy, big)
    hzs = jnp.where(valid, hz, big)

    def to4(a, K):
        return a.reshape(K, n, n, n).transpose(1, 2, 0, 3)

    own_x = to4(bxs, K_r)
    own_y = to4(bys, K_r)
    own_z = to4(bzs, K_r)
    px = _pad_halo(to4(hxs, K_s), 0, boxsize, pad=reach)
    py = _pad_halo(to4(hys, K_s), 1, boxsize, pad=reach)
    pz = _pad_halo(to4(hzs, K_s), None, boxsize, pad=reach)

    scal = jnp.stack([
        1.0 / jnp.asarray(scale, dtype),
        jnp.asarray(cutoff, dtype) ** 2,
        jnp.asarray(softening, dtype) ** 2,
        jnp.asarray(boxsize, dtype),
    ])
    own_spec = pl.BlockSpec((1, 1, K_r, n), lambda i, j: (i, j, 0, 0))
    pencil = lambda di, dj: pl.BlockSpec(
        (1, 1, K_s, n),
        lambda i, j, di=di, dj=dj: (i + reach + di, j + reach + dj, 0, 0),
    )
    offs2 = [
        (di, dj)
        for di in range(-reach, reach + 1)
        for dj in range(-reach, reach + 1)
    ]
    in_specs = [pl.BlockSpec((4,), lambda i, j: (0,))]
    in_specs += [own_spec] * 3
    for _comp in range(3):
        in_specs += [pencil(di, dj) for (di, dj) in offs2]
    out_spec = pl.BlockSpec((1, 1, K_r, n), lambda i, j: (i, j, 0, 0))
    kfn = _make_pair_kernel_reach(n, K_r, K_s, dtype, offsets, reach,
                                  softening_kernel=kernel)
    P = side * side
    outs = pl.pallas_call(
        kfn,
        grid=(n, n),
        out_shape=[jax.ShapeDtypeStruct((n, n, K_r, n), dtype)] * 3,
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        interpret=interpret,
    )(scal, own_x, own_y, own_z, *([px] * P + [py] * P + [pz] * P))
    return jnp.stack([o.transpose(2, 0, 1, 3).reshape(K_r, C) for o in outs])


@partial(jax.jit, static_argnames=("n_cells", "interpret", "kernel"))
def sweep_pallas(hx, hy, hz, valid, n_cells: int, boxsize, scale, cutoff,
                 softening, interpret: bool = False,
                 kernel: str = "plummer"):
    """Per-slot acceleration acc (3, K, C) from the padded pencil kernel.

    Args are shortrange.bucketize outputs: (K, C) slot-major with z-major
    flat cell ids, C = n_cells³.  Exact same contract as
    shortrange._sweep (halve=True path), different engine.
    """
    n = n_cells
    assert n >= 3, "pallas sweep needs n_cells ≥ 3 (no offset aliasing)"
    K, C = valid.shape
    dtype = hx.dtype
    big = jnp.asarray(1e4, dtype) * boxsize
    # sentinel for empty slots: far away on the body diagonal, unique-ish
    # per slot row is unnecessary — coincident sentinels give r2 = 0 which
    # the r2 > 0 cut removes, and sentinel-vs-real pairs fail the cutoff.
    hx = jnp.where(valid, hx, big)
    hy = jnp.where(valid, hy, big)
    hz = jnp.where(valid, hz, big)

    # (K, C) → (ci, cj, K, ck): cell axes lead so pencil blocks are
    # (1, 1, K, n) with the last two dims equal to the array dims.
    def to4(a):
        return a.reshape(K, n, n, n).transpose(1, 2, 0, 3)

    px = _pad_halo(to4(hx), 0, boxsize)
    py = _pad_halo(to4(hy), 1, boxsize)
    pz = _pad_halo(to4(hz), None, boxsize)
    shape4 = (n, n, K, n)

    scal = jnp.stack([
        1.0 / jnp.asarray(scale, dtype),
        jnp.asarray(cutoff, dtype) ** 2,
        jnp.asarray(softening, dtype) ** 2,
        jnp.asarray(boxsize, dtype),
    ])

    pencil = lambda di, dj: pl.BlockSpec(
        (1, 1, K, n), lambda i, j, di=di, dj=dj: (i + 1 + di, j + 1 + dj, 0, 0)
    )
    in_specs = [pl.BlockSpec((4,), lambda i, j: (0,))]
    offs = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
    for _comp in range(3):
        in_specs += [pencil(di, dj) for (di, dj) in offs]
    out_spec = pl.BlockSpec((1, 1, K, n), lambda i, j: (i, j, 0, 0))

    kfn = _make_kernel(n, K, dtype, softening_kernel=kernel)
    outs = pl.pallas_call(
        kfn,
        grid=(n, n),
        out_shape=[jax.ShapeDtypeStruct(shape4, dtype)] * 3,
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        interpret=interpret,
    )(scal, *([px] * 9 + [py] * 9 + [pz] * 9))
    return jnp.stack([o.transpose(2, 0, 1, 3).reshape(K, C) for o in outs])
