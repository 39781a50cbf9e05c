"""Bispectrum via the shell-FFT estimator.

TPU-native redesign of reference analysis.py:929-3282 (bispec): named
triangle configurations, shell binning, per-triangle products of three
shell-filtered inverse FFTs, mode counting, reduced bispectrum and
tree-level prediction.

Estimator (Scoccimarro-style; matches the reference's method of three
shell-grid products, analysis.py:3031-3194):
    B̂(k1,k2,k3) = (V²/n⁹) · ⟨Πᵢ δᵢ(x)⟩ₓ / ⟨Πᵢ wᵢ(x)⟩ₓ
with δᵢ = irfft(δ(k)·1_{|k|∈shell_i}), wᵢ = irfft(1_{shell_i}), and the
triangle count N_tri = n⁶·mean(Πwᵢ).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from concept_tpu.grid.fft import rfft3, irfft3
from concept_tpu.grid import fourier
from concept_tpu.grid.interp import deposit


def _shellthickness_at(spec: dict, k: float, kf: float, gridsize: int):
    """Running shell thickness at wavenumber k: control points {k: value}
    interpolated in log10 k, both sides allowed as expressions in
    k_fundamental/k_f/nyquist/gridsize, values additionally in 'k'
    (reference bispec_options 'shellthickness' + eval_bin_str,
    param/example_explanatory:268-276)."""
    names = {
        "k_fundamental": kf, "k_f": kf, "k_min": kf,
        "nyquist": kf * (gridsize // 2), "gridsize": gridsize, "k": k,
        "min": min, "max": max, "log": math.log, "log10": math.log10,
        "sqrt": math.sqrt, "pi": math.pi,
    }

    def ev(x):
        if isinstance(x, str):
            return float(eval(x, {"__builtins__": {}}, names))  # noqa: S307
        return float(x)

    pts = sorted((ev(kk), ev(vv)) for kk, vv in spec.items())
    if len(pts) == 1:
        return pts[0][1]
    xs = np.log10([p[0] for p in pts])
    ys = [p[1] for p in pts]
    return float(np.interp(math.log10(max(k, 1e-30)), xs, ys))


def shell_field(delta_slab, gridsize: int, k_center: float, half_width: float,
                boxsize: float, antialias: bool = True):
    """irfft of δ(k) restricted to |k| ∈ [k−Δ, k+Δ].

    antialias: instead of a binary in/out cut, each Fourier cell gets the
    (linear-ramp approximation of the) fraction of its volume overlapping
    the shell — the reference's anti-aliased cell-shell overlap weights
    (analysis.py:2803-3030; the reference integrates the exact overlap,
    the ramp over one k-cell reproduces it to first order and removes the
    same mode-count aliasing noise at thin shells)."""
    kfac = 2 * math.pi / boxsize
    kmag = kfac * jnp.sqrt(fourier.k2_int_grid(gridsize).astype(jnp.float32))
    if antialias:
        lo = (kmag - (k_center - half_width)) / kfac + 0.5
        hi = ((k_center + half_width) - kmag) / kfac + 0.5
        w = jnp.clip(jnp.minimum(lo, hi), 0.0, 1.0)
    else:
        w = ((kmag >= k_center - half_width)
             & (kmag < k_center + half_width)).astype(jnp.float32)
    return irfft3(w * delta_slab, gridsize), irfft3(
        w.astype(jnp.complex64), gridsize
    )


def _tri_from_ktmu(k1, t, mu):
    """(k₁, t, μ) → (k₁, k₂, k₃) with k₂ = t·k₁ and
    k₃² = k₁²(1 + t² − 2tμ) (the reference's parameterization of all
    named shape families, analysis.py:1540-1760)."""
    k2 = t * k1
    k3 = k1 * math.sqrt(max(1.0 + t * t - 2.0 * t * mu, 0.0))
    return (k1, k2, k3)


def triangle_configurations(configuration, k_min, k_max, n=10):
    """Named configurations → list of (k1,k2,k3).

    Matches the reference's distinct family definitions
    (analysis.py:1540-1760), each written as (k₁, t = k₂/k₁, μ):
      equilateral     t = 1,   μ = ½          (k, k, k)
      stretched       t = ½,   μ = 1          (k, k/2, k/2), collapsed
      squeezed        t = 1,   μ = 0.99       (k, k, 0.141·k), k₃ ≥ k_min
      isosceles right t = μ = 1/√2            (k, k/√2, k/√2)
      L-isosceles     t = 1,   ½ ≤ μ ≤ μ_max  k₁ = k₂ ≥ k₃ (2D)
      S-isosceles     ½ ≤ t ≤ 1, μ = 1/(2t)   k₁ ≥ k₂ = k₃ (2D)
      elongated       ½ ≤ t ≤ t_max, μ = 1    k₁ = k₂ + k₃ (2D)
      right           1/√2 ≤ t = μ ≤ t_max    k₁² = k₂² + k₃² (2D)
      all             k₁ ≥ k₂ ≥ k₃ triangle-closing triples (3D)
    2D families bound their t/μ ranges so k₃ ≥ k_min (the reference's
    k3_min guard) and emit int(2·n·range) parameter points per k₁.
    """
    if isinstance(configuration, (list, tuple)) and configuration and isinstance(
        configuration[0], (list, tuple)
    ):
        return [tuple(c) for c in configuration]
    if not isinstance(configuration, str):
        raise ValueError(f"bad bispectrum configuration {configuration!r}")
    parts = configuration.split()
    name = parts[0].lower().replace("-", "").replace("_", "")
    if len(parts) > 1:
        n = int(parts[1])
    ks = np.exp(np.linspace(math.log(k_min), math.log(k_max), n))
    k3_min = k_min
    if name.startswith("equilat"):
        return [(k, k, k) for k in ks]
    if name.startswith("stretch"):
        return [_tri_from_ktmu(k, 0.5, 1.0) for k in ks]
    if name.startswith("squeez"):
        mu = 0.99
        k_bgn = max(k_min, k3_min / math.sqrt(2 * (1 - mu)))
        if k_max <= k_bgn:
            raise ValueError(
                "k range too small for the squeezed configuration"
            )
        nn = max(2, int(round(n * math.log10(k_max / k_bgn))))
        ks2 = np.exp(np.linspace(math.log(k_bgn), math.log(k_max), nn))
        return [_tri_from_ktmu(k, 1.0, mu) for k in ks2]
    if "iso" in name and "right" in name:
        r = 1 / math.sqrt(2)
        return [_tri_from_ktmu(k, r, r) for k in ks]
    if name.startswith("liso") or ("iso" in name and "large" in name) or name == "isosceles":
        out = []
        mu_lo = 0.5
        mus = np.linspace(mu_lo, 1.0, max(2, int(round(2 * n * 0.5))))
        for k in ks:
            mu_max = max(mu_lo, (2 - k3_min**2 / k**2) / 2)
            mu_i = np.append(mus[mus < mu_max], mu_max)
            out += [_tri_from_ktmu(k, 1.0, mu) for mu in mu_i]
        return out
    if name.startswith("siso") or ("iso" in name and "small" in name):
        ts = np.linspace(0.5, 1.0, max(2, int(round(2 * n * 0.720599))))
        return [_tri_from_ktmu(k, t, 1 / (2 * t)) for k in ks for t in ts]
    if (name.startswith("elongat") or name.startswith("flat")
            or name.startswith("fold") or name.startswith("linear")):
        out = []
        ts = np.linspace(0.5, 1.0, max(2, int(round(2 * n * 0.5))))
        for k in ks:
            t_max = max(0.5, 1.0 - k3_min / k)
            t_i = np.append(ts[ts < t_max], t_max)
            out += [_tri_from_ktmu(k, t, 1.0) for t in t_i]
        return out
    if name.startswith("right"):
        out = []
        t_lo = 1 / math.sqrt(2)
        ts = np.linspace(t_lo, 1.0, max(2, int(round(2 * n * math.sqrt(2) * (1 - t_lo)))))
        for k in ks:
            t_max = max(t_lo, math.sqrt(max(1 - k3_min**2 / k**2, 0.0)))
            t_i = np.append(ts[ts < t_max], t_max)
            out += [_tri_from_ktmu(k, t, t) for t in t_i]
        return out
    if name == "all":
        out = []
        for k1 in ks:
            for k2 in ks:
                for k3 in ks:
                    if k1 >= k2 >= k3 and k3 >= k1 - k2:  # triangle ineq
                        out.append((k1, k2, k3))
        return out
    raise ValueError(f"unknown bispectrum configuration {name!r}")


def bispec(
    pos_list,
    weight_list,
    gridsize: int,
    boxsize: float,
    configuration="equilateral 10",
    order: int = 4,
    interlace: bool = True,
    shell_fac: float = 0.05,
    deposit_method: str = "scatter",
    antialias: bool = True,
    shotnoise_correction: bool = False,
    n_particles: int | None = None,
    shellthickness=None,
):
    """Measure B(k1,k2,k3).  Returns dict with per-triangle arrays incl.
    the reduced bispectrum Q = B/(P₁P₂ + P₂P₃ + P₃P₁) (reference
    analysis.py:3244-3282).

    shell_fac: shell half-width = max(k_fundamental, shell_fac·k).
    shellthickness: the reference's running specification instead — a
    dict {k_or_expr: thickness_expr} of control points interpolated in
    log10 k, where both sides may be expressions in k_fundamental/k_f/
    nyquist/gridsize and the VALUES may additionally reference the
    evaluation wavenumber 'k' (bispec_options 'shellthickness',
    param/example_explanatory:268-276, e.g.
    {'1*k_fundamental': '0.25*k_fundamental',
     '4*k_fundamental': 'max(3*k_fundamental, 1/20*log(10)*k)'}).
    Overrides shell_fac when given.
    antialias: cell-shell overlap weights (reference analysis.py:2803).
    shotnoise_correction: subtract the Poisson terms — per-shell power
    P → P − 1/n̄ and B → B − (P₁ᶜ+P₂ᶜ+P₃ᶜ)/n̄ − 1/n̄² with n̄ = N/V
    (the standard discreteness bias of the three-point estimator);
    requires n_particles.  The reference's bispec does no such
    correction — this mirrors its 'corrected' power-spectrum option.
    """
    if shotnoise_correction and not n_particles:
        raise ValueError("shotnoise_correction requires n_particles")
    n = gridsize
    V = boxsize**3
    kf = 2 * math.pi / boxsize
    grid = None
    for p, w in zip(pos_list, weight_list):
        g = deposit(p, w, n, boxsize, order=order, method=deposit_method)
        grid = g if grid is None else grid + g
    mean = jnp.mean(grid)
    slab = rfft3(grid / mean - 1.0)
    if interlace:
        h = boxsize / n
        grid2 = None
        for p, w in zip(pos_list, weight_list):
            g = deposit(jnp.mod(p + 0.5 * h, boxsize), w, n, boxsize, order=order,
                        method=deposit_method)
            grid2 = g if grid2 is None else grid2 + g
        slab2 = rfft3(grid2 / mean - 1.0)
        phase = fourier.interlace_phase(n, boxsize, (-0.5, -0.5, -0.5))
        slab = 0.5 * (slab + slab2 * phase)
    slab = slab * fourier.deconvolution_factor(n, order)

    k_nyq = kf * (n // 2)
    triangles = triangle_configurations(configuration, 2 * kf, 0.8 * k_nyq)
    # cache shell fields by k center (shared between triangles)
    cache = {}

    def get_shell(k):
        key = round(float(k) / kf, 3)
        if key not in cache:
            if shellthickness is not None:
                hw = 0.5 * _shellthickness_at(shellthickness, float(k),
                                              kf, n)
            else:
                hw = max(kf, shell_fac * k)
            cache[key] = shell_field(slab, n, k, hw, boxsize,
                                     antialias=antialias)
        return cache[key]

    out_B, out_T, out_Q = [], [], []
    pcache = {}
    for (k1, k2, k3) in triangles:
        d1, w1 = get_shell(k1)
        d2, w2 = get_shell(k2)
        d3, w3 = get_shell(k3)
        num = float(jnp.mean(d1 * d2 * d3))
        den = float(jnp.mean(w1 * w2 * w3))
        if den <= 0:
            out_B.append(np.nan)
            out_T.append(0.0)
            out_Q.append(np.nan)
            continue
        # Each irfft carries 1/n³; with means over x:
        #   num/den = ⟨δ_dft δ_dft δ_dft⟩ per closed triangle,
        # and B = (V²/n⁹)·⟨δδδ⟩ (DFT normalisation, see powerspec.py).
        B = (V**2 / float(n) ** 9) * (num / den)
        out_T.append(den * float(n) ** 9)
        Ps = []
        inv_nbar = V / n_particles if shotnoise_correction else 0.0
        for k, d, w in ((k1, d1, w1), (k2, d2, w2), (k3, d3, w3)):
            key = round(float(k) / kf, 3)
            if key not in pcache:
                # Parseval: Σ_x d² = (1/n³)Σ_k w²|δ|², Σ_x w(x)² =
                # (1/n³)Σ_k w_k² ⇒ ⟨|δ|²⟩_shell = Σd²/Σw(x)²;
                # P = V/n⁶·⟨|δ|²⟩ (powerspec.py normalisation)
                nume = float(jnp.sum(d * d))
                dene = float(jnp.sum(w * w))
                pcache[key] = (V / float(n) ** 6) * (
                    nume / dene if dene > 0 else np.nan
                )
            Ps.append(pcache[key] - inv_nbar)
        P1, P2, P3 = Ps
        if shotnoise_correction:
            B = B - (P1 + P2 + P3) * inv_nbar - inv_nbar**2
        out_B.append(B)
        hierarchical = P1 * P2 + P2 * P3 + P3 * P1
        out_Q.append(B / hierarchical if hierarchical > 0 else np.nan)
    return {
        "triangles": np.asarray(triangles),
        "B": np.asarray(out_B),
        "Q": np.asarray(out_Q),
        "n_triangles": np.asarray(out_T),
    }


def bispec_treelevel(lin, triangles, a):
    """Tree-level prediction: B = 2F₂(k1,k2)P(k1)P(k2) + cyclic
    (reference analysis.py:3195; F₂ with the cosine from the closed
    triangle)."""
    out = []
    for (k1, k2, k3) in np.asarray(triangles):
        P = {k: float(lin.power_delta(jnp.asarray(k, jnp.float32), a)) for k in (k1, k2, k3)}

        def F2(ka, kb, kc):
            # angle between ka,kb from closure: kc² = ka²+kb²+2 ka·kb·μ
            mu = (kc**2 - ka**2 - kb**2) / (2 * ka * kb)
            return (
                5.0 / 7.0
                + 0.5 * mu * (ka / kb + kb / ka)
                + 2.0 / 7.0 * mu * mu
            )

        B = (
            2 * F2(k1, k2, k3) * P[k1] * P[k2]
            + 2 * F2(k2, k3, k1) * P[k2] * P[k3]
            + 2 * F2(k3, k1, k2) * P[k3] * P[k1]
        )
        out.append(B)
    return np.asarray(out)
