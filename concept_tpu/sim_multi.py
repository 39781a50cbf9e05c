"""Multi-component simulation: particles + self-gravitating fluids.

Counterpart of the reference's general component loop (main.py:214-461
with fluid kicks via interactions.py:2359 apply_particle_mesh_force and
fluid drifts via fluid.py) for the round-1 scope: one particle component
plus constant-w fluid components with the P=wρ approximation.

Gravity coupling (reference conventions, interactions.py:2854-2961):
  potential sources: particles deposit ϱ_p; fluids contribute their ϱ grid
  (both are comoving densities; supplier factor a^{−3w_s} evaluated at the
  kick epoch, matching the reference's 'a²ρ' quantity).
  particle kick: Δmom = −m ∇φ ᔑa^{−3w_r}dt        (w_r = 0)
  fluid kick:    ΔJᵐ  = −(ϱ + c⁻²𝒫) ∂ᵐφ ᔑa^{−3w_r}dt
  fluid drift:   Kurganov-Tadmor flux terms (fluid.py)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from concept_tpu.components import ComponentSpec, ParticleState, FluidState
from concept_tpu.cosmology.background import Background
from concept_tpu.grid.fft import rfft3, irfft3, GridDistribution
from concept_tpu.grid import fourier
from concept_tpu.grid.interp import deposit, gather
from concept_tpu.forces.pm import gravity_potential_slab
from concept_tpu.fluid import kt_step
from concept_tpu.sim import SimConfig, FAC_DYNAMICAL, FAC_HUBBLE, DELTA_A_MAX_EARLY, DELTA_A_MAX_LATE


class MultiState(NamedTuple):
    particles: dict  # name -> ParticleState (may be empty)
    fluids: dict  # name -> FluidState


class MultiSimulation:
    """One particle component + any number of constant-w fluids, PM gravity."""

    def __init__(
        self,
        particle_specs,
        fluid_specs: list[ComponentSpec],
        config: SimConfig,
        bg: Background,
        lin=None,
        light_speed: float = 1.0,
        fluid_Omegas: dict | None = None,
        rho_crit: float | None = None,
    ):
        if particle_specs is None:
            particle_specs = []
        elif isinstance(particle_specs, ComponentSpec):
            particle_specs = [particle_specs]
        self.pspecs = {s.name: s for s in particle_specs}
        self.fspecs = {s.name: s for s in fluid_specs}
        self.config = config
        self.bg = bg
        self.lin = lin
        self.light_speed = light_speed
        self.fluid_Omegas = fluid_Omegas or {}
        self.rho_crit = rho_crit
        self._step_jit = jax.jit(self._step)

    # ------------------------------------------------------------------ #
    def _density_slab(self, state: MultiState, a):
        """Combined source slab Σ_s a^{−3w_s}ϱ_s(k) (the a^{−1} of the
        Poisson factor lives in the kick integral)."""
        cfg = self.config
        n = cfg.potential_gridsize
        cell_volume = (cfg.boxsize / n) ** 3
        slab = None
        grid_p = None
        for name, pstate in state.particles.items():
            g = deposit(pstate.pos, self.pspecs[name].mass, n, cfg.boxsize,
                        order=cfg.interpolation_order, method=cfg.deposit_method)
            grid_p = g if grid_p is None else grid_p + g
        if grid_p is not None:
            # upstream deconvolution applies to the particle deposits only
            # (reference interactions.py:2060-2080 promotion rules)
            slab = rfft3(grid_p / cell_volume) * fourier.deconvolution_factor(
                n, cfg.interpolation_order
            )
        for name, f in state.fluids.items():
            spec = self.fspecs[name]
            rho = f.varrho * a ** (-3 * spec.w_eff)
            rho_k = rfft3(rho)
            if rho.shape[0] != n:
                # resample in k-space (reference upstream→global grid scaling)
                rho_k = fourier.copy_modes(rho_k, rho.shape[0], n)
            slab = rho_k if slab is None else slab + rho_k
        return slab

    def _kick(self, state: MultiState, int_kick, a) -> MultiState:
        cfg = self.config
        n = cfg.potential_gridsize
        slab = self._density_slab(state, a)
        phi = gravity_potential_slab(slab, n, cfg.boxsize, cfg.G, deconv_order=0)
        # downstream deconvolution applies only to the particle receiver's
        # force interpolation (reference deconvolve=(up, down) semantics)
        phi_p = (
            phi * fourier.deconvolution_factor(n, cfg.interpolation_order)
            if state.particles
            else None
        )
        new_fluids = dict(state.fluids)
        # gradient grids one dim at a time
        dmom = {name: None for name in state.particles}
        fluid_dJ = {name: [] for name in state.fluids}
        for d in range(3):
            if state.particles:
                grad_p = irfft3(fourier.fourier_diff(phi_p, n, cfg.boxsize, d), n)
                for name, pstate in state.particles.items():
                    comp = gather(
                        grad_p, pstate.pos, cfg.boxsize, order=cfg.interpolation_order
                    )
                    upd = (-self.pspecs[name].mass * int_kick) * comp
                    dmom[name] = (
                        upd[:, None] if dmom[name] is None
                        else jnp.concatenate([dmom[name], upd[:, None]], axis=1)
                    )
            for name, f in state.fluids.items():
                spec = self.fspecs[name]
                nf = f.varrho.shape[0]
                phi_f = phi if nf == n else fourier.copy_modes(phi, n, nf, norm=True)
                gradf = irfft3(fourier.fourier_diff(phi_f, nf, cfg.boxsize, d), nf)
                c2inv = 1.0 / self.light_speed**2
                P = f.P if f.P is not None else (spec.w * self.light_speed**2) * f.varrho
                dJ = -(f.varrho + c2inv * P) * gradf * int_kick
                fluid_dJ[name].append(dJ)
        new_particles = {
            name: pstate._replace(mom=pstate.mom + dmom[name])
            for name, pstate in state.particles.items()
        }
        for name, f in state.fluids.items():
            if f.J is not None:
                new_fluids[name] = f._replace(
                    J=f.J + jnp.stack(fluid_dJ[name])
                )
        return MultiState(particles=new_particles, fluids=new_fluids)

    def _drift(self, state: MultiState, int_a2, dt, coef_flux, coef_pressure,
               a) -> MultiState:
        cfg = self.config
        particles = {}
        for name, pstate in state.particles.items():
            fac = int_a2 / self.pspecs[name].mass
            particles[name] = pstate._replace(
                pos=jnp.mod(pstate.pos + pstate.mom * fac, cfg.boxsize)
            )
        new_fluids = {}
        for name, f in state.fluids.items():
            spec = self.fspecs[name]
            if f.J is None:
                new_fluids[name] = f
                continue
            soundspeed = self.light_speed * math.sqrt(abs(spec.w)) / a
            rho, J, P = kt_step(
                f.varrho, f.J,
                f.P if f.P is not None else (spec.w * self.light_speed**2) * f.varrho,
                dt, coef_flux, coef_pressure, cfg.boxsize, soundspeed,
                1.0 / self.light_speed**2,
                approx_P_eq_wrho=True, w=spec.w, light_speed=self.light_speed,
            )
            new_fluids[name] = FluidState(varrho=rho, J=J, P=P, sigma=f.sigma)
        return MultiState(particles=particles, fluids=new_fluids)

    def _step(self, state, int_kick, int_a2, dt, coef_flux, coef_pressure, a):
        state = self._kick(state, int_kick, a)
        return self._drift(state, int_a2, dt, coef_flux, coef_pressure, a)

    # ------------------------------------------------------------------ #
    def timestep_size(self, a: float) -> float:
        bg = self.bg
        H = float(bg.hubble_np(a))
        limits = []
        rho_tot = sum(
            sp.mass * sp.N / self.config.boxsize**3 / a**3
            for sp in self.pspecs.values() if sp.N
        )
        if rho_tot > 0:
            limits.append(FAC_DYNAMICAL / math.sqrt(self.config.G * rho_tot))
        if H > 0:
            limits.append(FAC_HUBBLE / H)
            da_max = DELTA_A_MAX_EARLY if a < 0.1 else DELTA_A_MAX_LATE
            limits.append(da_max / (a * H))
        # fluid Courant: 0.21·Δx/(c√w + |u|)-ish (reference fac_courant,
        # main.py:2413) — use the sound speed bound
        for name, spec in self.fspecs.items():
            n = spec.gridsize or self.config.potential_gridsize
            dx = self.config.boxsize / n
            cs = self.light_speed * math.sqrt(abs(spec.w)) / max(a, 1e-12)
            if cs > 0:
                limits.append(0.21 * dx / cs * a * a)  # dt in cosmic time: dx_comoving/(cs/a)·(1/a)…
        return min(limits) if limits else float("inf")

    def evolve(self, state: MultiState, a_begin: float, a_end: float,
               max_steps: int = 100000):
        bg = self.bg
        t = float(bg.t_of_a_np(a_begin))
        t_end = float(bg.t_of_a_np(a_end))
        a = a_begin
        t_mom = t
        steps = 0
        w_fluids = [s.w_eff for s in self.fspecs.values()]
        w0 = w_fluids[0] if w_fluids else 0.0
        while t < t_end - 1e-12 * abs(t_end):
            dt = min(self.timestep_size(a), t_end - t)
            t_mid = min(t + 0.5 * dt, t_end)
            a_kick = float(bg.a_of_t_np(t_mid))
            # receiver-side kick integral ∫ a^{−3w_r−1}dt with the supplier
            # factor evaluated at a_kick inside _density_slab
            int_kick = bg.integral_power_np(t_mom, t_mid, -1.0)
            int_a2 = bg.integral_power_np(t, t + dt, -2.0)
            int_1 = dt
            coef_flux = bg.integral_power_np(t, t + dt, 3 * w0 - 2) / dt
            coef_pressure = bg.integral_power_np(t, t + dt, -3 * w0) / dt
            state = self._step_jit(
                state,
                jnp.asarray(int_kick, self.config.dtype),
                jnp.asarray(int_a2, self.config.dtype),
                jnp.asarray(int_1, self.config.dtype),
                jnp.asarray(coef_flux, self.config.dtype),
                jnp.asarray(coef_pressure, self.config.dtype),
                jnp.asarray(a_kick, self.config.dtype),
            )
            t_mom = t_mid
            t += dt
            a = float(bg.a_of_t_np(t))
            steps += 1
            if steps >= max_steps:
                raise RuntimeError("max_steps exceeded")
        if t_mom < t_end - 1e-12 * abs(t_end):
            int_kick = bg.integral_power_np(t_mom, t_end, -1.0)
            state = self._step_jit(
                state,
                jnp.asarray(int_kick, self.config.dtype),
                jnp.asarray(0.0, self.config.dtype),
                jnp.asarray(0.0, self.config.dtype),
                jnp.asarray(1.0, self.config.dtype),
                jnp.asarray(1.0, self.config.dtype),
                jnp.asarray(a, self.config.dtype),
            )
        return state, a


def realize_fluid_from_linear(lin, spec: ComponentSpec, boxsize: float, a,
                              rho_mean: float, seed: int = 0,
                              dtype=jnp.float32) -> FluidState:
    """Realize a fluid component's ϱ and J grids from linear theory
    (reference ic.py:400 realize_fluid):
      ϱ = ϱ̄(1+δ),  J = a⁴(ρ+c⁻²P)u with θ = ∇·u_... linear: J(k) = −i k/k²·ϱ̄(1+w)θ(k)
    with θ from the linear continuity relation θ = −aHf₁δ.
    """
    from concept_tpu.ic import realize_delta_slab, displacement_from_delta

    n = spec.gridsize
    species = "nu" if "neutrino" in spec.species else "matter"
    delta_k = realize_delta_slab(lin, n, boxsize, a, seed=seed, dtype=dtype,
                                 species=species)
    delta = irfft3(delta_k, n)
    varrho = rho_mean * (1.0 + delta)
    # Linear continuity ∂ₜϱ = −a^{3w−2}∇·J with δ̇ = Hf₁δ and
    # ψ(k) = ik δ/k² (so ∇·ψ = −δ) gives J = ϱ̄·a^{2−3w}·H·f₁·ψ.
    H = float(lin.bg.hubble_np(a)) if hasattr(lin.bg, "hubble_np") else lin.bg.hubble(a)
    f1 = float(lin.bg.growth_np("f1", a))
    psi = displacement_from_delta(delta_k, n, boxsize)
    J = rho_mean * a ** (2 - 3 * spec.w_eff) * H * f1 * psi
    return FluidState(varrho=varrho.astype(dtype), J=J.astype(dtype),
                      P=(spec.w * lin.light_speed**2 * varrho).astype(dtype))