"""Fluid solvers: Kurganov-Tadmor (primary) and MacCormack (planned).

TPU-native redesign of reference src/fluid.py (kurganov_tadmor :103,
flux limiters :590-688, maccormack :724, vacuum handling :1079-1363).

The fluid equations in CONCEPT's comoving variables
(ϱ = a^{3(1+w_eff)}ρ, J = a⁴(ρ+c⁻²P)u; reference fluid.py:230, 310):

  ∂ₜϱ  = −a^{3w_eff−2} ∂ₘJᵐ                       (flux, this module)
        + 3(ȧ/a)(wϱ − c⁻²𝒫)                        (internal source)
  ∂ₜJᵐ = −a^{3w_eff−2} ∂ⁿ(JᵐJₙ/(ϱ + c⁻²𝒫))        (flux)
        −a^{−3w_eff} ∂ᵐ𝒫 − a^{−3w_eff} ∂ⁿςᵐₙ      (flux)
        −a^{−3w_eff}(ϱ + c⁻²𝒫) ∂ᵐφ                (gravity source)

The reference's per-interface triple loops become whole-grid vectorized
MUSCL reconstructions (jnp.roll shifts) with the same central-upwind
(Rusanov) numerical flux and flux-limiter family, and the same RK2
staging (half step onto starred grids, full step back), including the
quarter/three-quarter-point scale factors.  Time-averaged coefficients
use the exact integrals ᔑa^p dt (reference fluid.py:404-420).

Periodicity: jnp.roll implements the ghost layers; under sharding XLA
lowers rolls along the sharded axis to ICI ppermute halo exchanges —
the analogue of communicate_ghosts (reference communication.py:563).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp



# ----------------------------------------------------------------------- #
# Flux limiters (reference fluid.py:590-688 — standard published family)
# ----------------------------------------------------------------------- #
def _lim_minmod(r):
    return jnp.maximum(0.0, jnp.minimum(1.0, r))


def _lim_mc(r):
    return jnp.maximum(0.0, jnp.minimum(jnp.minimum(2 * r, 0.5 * (1 + r)), 2.0))


def _lim_ospre(r):
    return jnp.maximum(0.0, 1.5 * (r * r + r) / (r * r + r + 1))


def _lim_superbee(r):
    return jnp.maximum(
        0.0, jnp.maximum(jnp.minimum(2 * r, 1.0), jnp.minimum(r, 2.0))
    )


def _lim_sweby(r, beta=1.5):
    return jnp.maximum(
        0.0, jnp.maximum(jnp.minimum(beta * r, 1.0), jnp.minimum(r, beta))
    )


def _lim_umist(r):
    return jnp.maximum(
        0.0,
        jnp.minimum(
            jnp.minimum(2 * r, 0.25 + 0.75 * r),
            jnp.minimum(0.75 + 0.25 * r, 2.0),
        ),
    )


def _lim_vanalbada(r):
    return jnp.maximum(0.0, (r * r + r) / (r * r + 1))


def _lim_vanleer(r):
    return (r + jnp.abs(r)) / (1 + jnp.abs(r))


def _lim_koren(r):
    return jnp.maximum(0.0, jnp.minimum(jnp.minimum(2 * r, (1 + 2 * r) / 3), 2.0))


FLUX_LIMITERS = {
    "minmod": _lim_minmod,
    "monotonizedcentral": _lim_mc,
    "mc": _lim_mc,
    "ospre": _lim_ospre,
    "superbee": _lim_superbee,
    "sweby": _lim_sweby,
    "umist": _lim_umist,
    "vanalbada": _lim_vanalbada,
    "vanleer": _lim_vanleer,
    "muscl": _lim_vanleer,
    "harmonic": _lim_vanleer,
    "koren": _lim_koren,
}


def _interface_states(u, axis: int, limiter):
    """MUSCL left/right states at interface i−½ along ``axis``.

    u_L = u[i−1] + ½φ(r_{i−1})(u[i] − u[i−1]),
    u_R = u[i]   − ½φ(r_i)(u[i+1] − u[i]),
    r_i = (u[i] − u[i−1])/(u[i+1] − u[i])  (reference at_interface logic).
    """
    um1 = jnp.roll(u, 1, axis)
    um2 = jnp.roll(u, 2, axis)
    up1 = jnp.roll(u, -1, axis)
    eps = jnp.asarray(1e-30, u.dtype)
    d_m = um1 - um2  # u[i-1]-u[i-2]
    d_c = u - um1  # u[i]-u[i-1]
    d_p = up1 - u  # u[i+1]-u[i]
    r_L = d_m / jnp.where(jnp.abs(d_c) > eps, d_c, jnp.where(d_c >= 0, eps, -eps))
    r_R = d_c / jnp.where(jnp.abs(d_p) > eps, d_p, jnp.where(d_p >= 0, eps, -eps))
    uL = um1 + 0.5 * limiter(r_L) * d_c
    uR = u - 0.5 * limiter(r_R) * d_p
    return uL, uR


def _kt_flux(uL, uR, fL, fR, vL, vR):
    """Central-upwind (Rusanov) flux: ½(f_L+f_R) − ½ max(v)(u_R−u_L)."""
    vmax = jnp.maximum(vL, vR)
    return 0.5 * (fL + fR) - 0.5 * vmax * (uR - uL)


def kurganov_tadmor_update(
    varrho,
    J,
    P,
    dt: float,
    coef_flux: float,
    coef_pressure: float,
    boxsize: float,
    soundspeed: float,
    c2_inv: float,
    limiter: str = "mc",
    sigma=None,
):
    """One explicit KT sub-step: returns (Δϱ, ΔJ) from the flux terms.

    coef_flux     = ᔑa^{3w_eff−2}dt / ᔑdt  (time-averaged coefficient)
    coef_pressure = ᔑa^{−3w_eff}dt / ᔑdt
    soundspeed    = c·√w/a (global bound; reference fluid.py:131-137)
    c2_inv        = 1/c² (for ϱ + c⁻²𝒫 denominators)
    The Δs are per unit time: caller multiplies by the sub-step Δt/Δx.
    """
    lim = FLUX_LIMITERS[limiter]
    n = varrho.shape[0]
    dx = boxsize / n
    dtype = varrho.dtype
    drho = jnp.zeros_like(varrho)
    dJ = [jnp.zeros_like(varrho) for _ in range(3)]
    denom = varrho + c2_inv * P

    for axis in range(3):
        # interface states of all needed quantities along this axis
        rhoL, rhoR = _interface_states(varrho, axis, lim)
        PL, PR = _interface_states(P, axis, lim)
        JnL, JnR = _interface_states(J[axis], axis, lim)
        denL = rhoL + c2_inv * PL
        denR = rhoR + c2_inv * PR
        vL = jnp.abs(coef_flux * JnL / denL) + soundspeed
        vR = jnp.abs(coef_flux * JnR / denR) + soundspeed

        # continuity: flux of ϱ along axis is coef_flux·Jₙ
        F = _kt_flux(rhoL, rhoR, coef_flux * JnL, coef_flux * JnR, vL, vR)
        # ∂ₜϱ[i] −= (F[i+½] − F[i−½])/Δx ; F computed at i−½
        drho = drho - (jnp.roll(F, -1, axis) - F) / dx

        # Euler: flux of Jᵐ along axis n: coef_flux·JᵐJₙ/(ϱ+c⁻²𝒫)
        # + pressure term coef_pressure·𝒫 when m == n
        for m in range(3):
            JmL, JmR = _interface_states(J[m], axis, lim)
            fL = coef_flux * JmL * JnL / denL
            fR = coef_flux * JmR * JnR / denR
            if m == axis:
                fL = fL + coef_pressure * PL
                fR = fR + coef_pressure * PR
            if sigma is not None:
                sL, sR = _interface_states(sigma[m][axis], axis, lim)
                fL = fL + coef_pressure * sL
                fR = fR + coef_pressure * sR
            F = _kt_flux(JmL, JmR, fL, fR, vL, vR)
            dJ[m] = dJ[m] - (jnp.roll(F, -1, axis) - F) / dx

    return drho, dJ


@partial(jax.jit, static_argnames=("limiter", "rk_order", "approx_P_eq_wrho"))
def kt_step(
    varrho,
    J,
    P,
    dt,
    coef_flux,
    coef_pressure,
    boxsize: float,
    soundspeed,
    c2_inv: float,
    limiter: str = "mc",
    rk_order: int = 2,
    approx_P_eq_wrho: bool = False,
    w: float = 0.0,
    light_speed: float = 1.0,
    sigma=None,
):
    """Full KT drift step with RK2 staging (reference fluid.py:103-228):
    step 0 builds the half-step state (starred), step 1 completes the full
    step from it.  J is (3, n, n, n); P is (n,n,n).  sigma, when present,
    is the (frozen or closure-realized) shear ς entering the momentum
    fluxes (reference boltzmann_order ≥ 2 / 'class' closure semantics,
    species.py:880-928).
    Returns updated (ϱ, J, P)."""
    def get_P(rho):
        return (w * light_speed**2) * rho if approx_P_eq_wrho else P

    if rk_order == 1:
        drho, dJ = kurganov_tadmor_update(
            varrho, list(J), get_P(varrho), dt, coef_flux, coef_pressure,
            boxsize, soundspeed, c2_inv, limiter, sigma=sigma,
        )
        rho1 = varrho + dt * drho
        J1 = jnp.stack([J[m] + dt * dJ[m] for m in range(3)])
        return rho1, J1, get_P(rho1)
    # RK2: half step → starred state; full step evaluated at starred
    drho, dJ = kurganov_tadmor_update(
        varrho, list(J), get_P(varrho), dt, coef_flux, coef_pressure,
        boxsize, soundspeed, c2_inv, limiter, sigma=sigma,
    )
    rho_s = varrho + 0.5 * dt * drho
    J_s = [J[m] + 0.5 * dt * dJ[m] for m in range(3)]
    drho2, dJ2 = kurganov_tadmor_update(
        rho_s, J_s, get_P(rho_s), dt, coef_flux, coef_pressure,
        boxsize, soundspeed, c2_inv, limiter, sigma=sigma,
    )
    rho1 = varrho + dt * drho2
    J1 = jnp.stack([J[m] + dt * dJ2[m] for m in range(3)])
    return rho1, J1, get_P(rho1)


# ----------------------------------------------------------------------- #
# MacCormack predictor-corrector (reference fluid.py:724-1078)
# ----------------------------------------------------------------------- #
def _upwind_diff(u, axis, direction):
    """One-sided difference: direction=+1 forward (u[i+1]−u[i]),
    −1 backward (u[i]−u[i−1])."""
    if direction > 0:
        return jnp.roll(u, -1, axis) - u
    return u - jnp.roll(u, 1, axis)


def _mc_flux_divergence(varrho, J, P, coef_flux, coef_pressure, dx, c2_inv,
                        directions):
    """Σₙ ∂ₙ(fluxes) with one-sided differences per axis (signs alternate
    between predictor and corrector — reference maccormack flux-direction
    alternation, fluid.py:724)."""
    denom = varrho + c2_inv * P
    drho = jnp.zeros_like(varrho)
    dJ = [jnp.zeros_like(varrho) for _ in range(3)]
    for axis in range(3):
        d = directions[axis]
        # continuity flux: coef_flux·Jₙ
        drho = drho - _upwind_diff(coef_flux * J[axis], axis, d) / dx
        for m in range(3):
            f = coef_flux * J[m] * J[axis] / denom
            if m == axis:
                f = f + coef_pressure * P
            dJ[m] = dJ[m] - _upwind_diff(f, axis, d) / dx
    return drho, dJ


@partial(jax.jit, static_argnames=("approx_P_eq_wrho", "step_parity"))
def maccormack_step(
    varrho, J, P, dt, coef_flux, coef_pressure, boxsize: float,
    c2_inv: float, step_parity: int = 0,
    approx_P_eq_wrho: bool = True, w: float = 0.0, light_speed: float = 1.0,
):
    """One MacCormack predictor-corrector drift step.

    Predictor uses forward differences, corrector backward (swapped on
    odd ``step_parity`` for symmetry — the reference alternates the
    pattern across steps, whence Δt_period = 8, main.py:2380).
    Returns (ϱ, J, P).
    """
    n = varrho.shape[0]
    dx = boxsize / n

    def get_P(rho):
        return (w * light_speed**2) * rho if approx_P_eq_wrho else P

    d_pred = [1 - 2 * (step_parity & 1)] * 3
    d_corr = [-d for d in d_pred]
    # predictor
    drho, dJ = _mc_flux_divergence(
        varrho, list(J), get_P(varrho), coef_flux, coef_pressure, dx, c2_inv, d_pred
    )
    rho_s = varrho + dt * drho
    J_s = [J[m] + dt * dJ[m] for m in range(3)]
    # corrector
    drho2, dJ2 = _mc_flux_divergence(
        rho_s, J_s, get_P(rho_s), coef_flux, coef_pressure, dx, c2_inv, d_corr
    )
    rho1 = 0.5 * (varrho + rho_s + dt * drho2)
    J1 = jnp.stack([0.5 * (J[m] + J_s[m] + dt * dJ2[m]) for m in range(3)])
    return rho1, J1, get_P(rho1)


def vacuum_correct(varrho, J, rho_floor: float):
    """Clamp vacuum/negative densities (the jit-friendly fallback; see
    vacuum_redistribute for the reference-style conservative version)."""
    ok = varrho >= rho_floor
    varrho = jnp.maximum(varrho, rho_floor)
    J = jnp.where(ok[None], J, 0.0)
    return varrho, J


def vacuum_redistribute(varrho, J, rho_vacuum, smoothing: float = 1.0,
                        passes: int = 2):
    """Mass-conserving vacuum correction (reference MacCormack vacuum
    machinery, fluid.py:1079-1363): cells below the vacuum density borrow
    from their 6 face neighbors through symmetric diffusion fluxes,
    activated only in the neighborhood of vacuum cells; J is smoothed the
    same way so momentum stays finite where mass was injected.  A fixed
    number of passes (the reference's max_vacuum_corrections) keeps the
    computation jit-shaped; remaining negatives are floor-clamped by the
    caller.  Total Σϱ is conserved exactly (antisymmetric pair fluxes).
    """
    fac = smoothing / 12.0  # ≤ 1/12 per pair keeps the diffusion stable

    def one_pass(carry, _):
        rho, Jc = carry
        need = rho < rho_vacuum
        act = need
        for axis in range(3):
            act = act | jnp.roll(need, 1, axis) | jnp.roll(need, -1, axis)
        w = act.astype(rho.dtype) * fac
        new_rho = rho
        new_J = Jc
        for axis in range(3):
            for shift in (1, -1):
                rho_nb = jnp.roll(rho, shift, axis)
                w_pair = jnp.maximum(w, jnp.roll(w, shift, axis))
                flux = w_pair * (rho_nb - rho)  # symmetric ⇒ conservative
                new_rho = new_rho + flux
                J_nb = jnp.roll(Jc, shift, axis + 1)
                new_J = new_J + w_pair[None] * (J_nb - Jc)
        return (new_rho, new_J), None

    (varrho, J), _ = jax.lax.scan(one_pass, (varrho, J), None, length=passes)
    return varrho, J


def hubble_source_rho(varrho, P, int_adot_over_a, w: float, c2_inv: float):
    """Internal source: Δϱ = 3ᔑ(ȧ/a)dt (wϱ − c⁻²𝒫)
    (reference fluid.py:701 via apply_internal_sources)."""
    return 3.0 * int_adot_over_a * (w * varrho - c2_inv * P)
