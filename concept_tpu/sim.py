"""Simulation driver: configuration, state, the jitted step and the time
loop.

TPU-native redesign of reference src/main.py (timeloop at main.py:2437-2473
entry; step structure main.py:214-461).  Single-controller: the heavy
kick+drift works are one jitted function per (component-set, force-config);
the host only advances scalars (t, a, Δt), evaluates dump schedules and
adapts the step size — mirroring the reference's master-rank bookkeeping,
minus MPI.

Time stepping (global; adaptive per-particle rungs are layered on in
forces/shortrange):
  Leapfrog KDK with *exact* time integrals (reference integration.py:712):
    kick:  mom ← mom − m ∇φ · ᔑ a^(−1) dt        (matter)
    drift: pos ← pos + mom/m · ᔑ a^(−2) dt
Δt limiters mirror reference main.py:2345-2433 (fac_dynamical, fac_hubble,
Δa_max_early/late, fac_pm) — see integration.py in this package.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from concept_tpu.components import ComponentSpec, ParticleState, particle_mass
from concept_tpu.cosmology.background import Background
from concept_tpu.cosmology.linear import LinearCosmology
from concept_tpu.cosmology.primordial import PrimordialSpectrum
from concept_tpu.grid.fft import GridDistribution, GridDistribution2D
from concept_tpu.forces import pm as pm_force
from concept_tpu.units import UnitSystem


# Reference numeric defaults (main.py:2345-2433; SURVEY.md Appendix A)
FAC_DYNAMICAL = 0.056
FAC_HUBBLE = 0.031
FAC_PM = 0.13
FAC_P3M = 0.14
DELTA_A_MAX_EARLY = 0.00153
DELTA_A_MAX_LATE = 0.022
DT_PERIOD = 8
DT_INCREASE_MAX_FAC = 1.5


@dataclass(frozen=True)
class SimConfig:
    """Static configuration, closed over by the jitted step."""

    boxsize: float
    potential_gridsize: int
    interpolation_order: int = 2  # CIC (reference potential default)
    deconvolve: tuple = (True, True)  # (upstream/deposit, downstream/gather)
    differentiation: object = "fourier"  # 'fourier' or 2/4/6/8
    deposit_method: str = "auto"  # 'auto' | 'scatter' | 'sort' | 'sorted'
    interlace: bool = False
    dtype: object = jnp.float32
    G: float = 1.0
    # Gravity method: 'pm' | 'p3m' | 'pp' | 'ppnonperiodic'
    method: str = "pm"
    # P³M split scale rₛ and cutoff range (reference defaults:
    # scale = 1.25·boxsize/gridsize, range = 4.5·scale,
    # param/example_explanatory:211-218); None → derived defaults.
    shortrange_scale: float | None = None
    shortrange_range: float | None = None
    shortrange_capacity: int = 0  # 0 → auto from mean density
    ewald_gridsize: int = 64  # reference default (example_explanatory:210)
    softening: float = 0.0
    # 'plummer' | 'spline' (GADGET-2 cubic spline, the reference default)
    # | 'none' — reference softening_kernel param (example_explanatory:372)
    softening_kernel: str = "plummer"
    # Δt limiter prefactors (reference Δt_base_background_factor /
    # Δt_base_nonlinear_factor, main.py:2401-2424)
    dt_base_background_factor: float = 1.0
    dt_base_nonlinear_factor: float = 1.0
    # Δa per-step bounds (reference Δa_max_early/late, commons.py:3883)
    da_max_early: float = DELTA_A_MAX_EARLY
    da_max_late: float = DELTA_A_MAX_LATE

    def derived_shortrange(self):
        scale = self.shortrange_scale
        if scale is None:
            scale = 1.25 * self.boxsize / self.potential_gridsize
        rng = self.shortrange_range
        if rng is None:
            rng = 4.5 * scale
        return scale, rng


class Simulation:
    """Matter-like particle simulation with PM (P³M forthcoming) gravity."""

    def __init__(
        self,
        spec: ComponentSpec,
        config: SimConfig,
        bg: Background,
        lin: LinearCosmology | None = None,
        dist: GridDistribution | None = None,
    ):
        self.spec = spec
        self.config = config
        self.bg = bg
        self.lin = lin
        self.dist = dist
        # validate through the interaction registry (reference
        # find_interactions/register, interactions.py:2456-2827): unknown
        # forces/methods fail loudly instead of silently running PM
        from concept_tpu.forces.registry import get as _force_spec

        gravity = _force_spec("gravity")
        if config.method not in gravity.methods:
            raise ValueError(
                f"gravity has no method {config.method!r} "
                f"(available: {gravity.methods})"
            )
        self._ewald_table = None
        if config.method == "pp":
            from concept_tpu.forces.pp import make_ewald_table

            self._ewald_table = make_ewald_table(config.ewald_gridsize)
        if config.method == "p3m":
            from concept_tpu.forces.shortrange import cell_grid_shape, auto_capacity

            scale, rng = config.derived_shortrange()
            self._sr_scale, self._sr_range = scale, rng
            self._sr_ncells = cell_grid_shape(config.boxsize, rng)
            cap = config.shortrange_capacity
            if cap == 0 and spec.N:
                cap = auto_capacity(spec.N, self._sr_ncells)
            self._sr_capacity = cap
            self._sr_max_overflow = max(2048, (spec.N or 0) // 1024)
        self._pm_max_overflow = 65536
        self._pending_aux = None
        # Donate the incoming state so XLA reuses pos/mom buffers in place
        # (the update is element-wise) — halves particle-array HBM footprint.
        self._step_jit = jax.jit(self._step, donate_argnums=0)

    # ------------------------------------------------------------------ #
    def initial_state(self, a_begin: float, seed: int = 0, lpt_order: int = 1,
                      with_ids: bool = False, **kw) -> ParticleState:
        from concept_tpu.ic import realize_particles

        return realize_particles(
            self.lin, self.spec, self.config.boxsize, a_begin, seed=seed,
            lpt_order=lpt_order, dist=self.dist, dtype=self.config.dtype,
            with_ids=with_ids, **kw,
        )

    # ------------------------------------------------------------------ #
    def _kick(self, state: ParticleState, int_a1):
        """Returns (state, (n_sr_overflow, n_pm_overflow)) — the overflow
        counters are zeros for methods without fixed-size budgets.  They
        guard exactness: overflow beyond the static budgets would truncate
        silently, so evolve() checks them against the budgets on the host
        (see _check_overflow_budgets)."""
        cfg = self.config
        method = cfg.method
        aux = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        if method == "p3m" and (
            cfg.interpolation_order == 2
            and cfg.differentiation in ("fourier", 0)
            and not cfg.interlace
            and tuple(cfg.deconvolve) == (True, True)
            and (self.dist is None or self.dist.mesh is None)
        ):
            # fused component-wise path: short-range Pallas sweep + chunked
            # Pallas PM kernels — the only formulation that compiles and
            # runs at 256³/mesh-512 on the current TPU stack (forces/p3m)
            from concept_tpu.forces.p3m import p3m_kick_components, pm_block_capacity

            (dx, dy, dz), n_sr, n_pm = p3m_kick_components(
                state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
                self.spec.mass, cfg.boxsize, self._sr_scale, self._sr_range,
                int_a1, cfg.potential_gridsize, self._sr_ncells,
                self._sr_capacity,
                k_pm=pm_block_capacity(self.spec.N, cfg.potential_gridsize),
                softening=cfg.softening, G=cfg.G,
                max_overflow=self._sr_max_overflow,
                pm_max_overflow=self._pm_max_overflow,
                interpret=(jax.default_backend() != "tpu"),
                softening_kernel=cfg.softening_kernel,
            )
            dmom = jnp.stack([dx, dy, dz], axis=1)
            aux = (n_sr, n_pm)
        elif method in ("pm", "p3m") and (
            self.dist is not None and self.dist.mesh is not None
            and isinstance(self.dist, GridDistribution2D)
            and cfg.differentiation in ("fourier", 0)
            and not cfg.interlace
        ):
            # 2D pencil device mesh (-n AxB): 2D-sharded deposit +
            # pencil FFT; lifts the 1D n_devices ≤ gridsize slab limit
            from concept_tpu.parallel.step import (
                pm_momentum_updates_distributed_2d,
            )

            longrange_scale = self._sr_scale if method == "p3m" else None
            dmom = pm_momentum_updates_distributed_2d(
                state.pos, self.spec.mass, cfg.potential_gridsize,
                cfg.boxsize, cfg.G, int_a1, self.dist,
                order=cfg.interpolation_order,
                longrange_scale=longrange_scale,
            )
            if method == "p3m":
                from concept_tpu.forces.shortrange import (
                    shortrange_momentum_updates,
                )

                dmom_sr, n_sr = shortrange_momentum_updates(
                    state.pos, self.spec.mass, cfg.boxsize,
                    self._sr_scale, self._sr_range, int_a1,
                    n_cells=self._sr_ncells, capacity=self._sr_capacity,
                    softening=cfg.softening, G=cfg.G,
                    max_overflow=self._sr_max_overflow,
                    return_overflow=True,
                    softening_kernel=cfg.softening_kernel,
                )
                dmom = dmom + dmom_sr
                aux = (n_sr, aux[1])
        elif method in ("pm", "p3m") and (
            self.dist is not None and self.dist.mesh is not None
            and cfg.differentiation in ("fourier", 0)
            and not cfg.interlace
        ):
            # halo-resident distributed PM: slab-sort + boundary-plane
            # deposit/gather, no grid replication (VERDICT r2 weak #7)
            from concept_tpu.parallel.step import (
                pm_momentum_updates_distributed_halo,
            )

            longrange_scale = self._sr_scale if method == "p3m" else None
            dmom, n_slab_over = pm_momentum_updates_distributed_halo(
                state.pos, self.spec.mass, cfg.potential_gridsize,
                cfg.boxsize, cfg.G, int_a1, self.dist,
                order=cfg.interpolation_order, deconvolve=cfg.deconvolve,
                longrange_scale=longrange_scale,
            )
            aux = (aux[0], n_slab_over)
            if method == "p3m":
                from concept_tpu.forces.shortrange import (
                    shortrange_momentum_updates,
                )

                dmom_sr, n_sr = shortrange_momentum_updates(
                    state.pos, self.spec.mass, cfg.boxsize,
                    self._sr_scale, self._sr_range, int_a1,
                    n_cells=self._sr_ncells, capacity=self._sr_capacity,
                    softening=cfg.softening, G=cfg.G,
                    max_overflow=self._sr_max_overflow,
                    return_overflow=True,
                    softening_kernel=cfg.softening_kernel,
                )
                dmom = dmom + dmom_sr
                aux = (n_sr, aux[1])
        elif method in ("pm", "p3m"):
            longrange_scale = self._sr_scale if method == "p3m" else None
            (dmom,) = pm_force.pm_gravity_momentum_updates(
                [state.pos], [self.spec.mass],
                cfg.potential_gridsize, cfg.boxsize, cfg.G,
                kick_integral=int_a1,
                order=cfg.interpolation_order,
                deconvolve=cfg.deconvolve,
                dist=self.dist,
                differentiation=cfg.differentiation,
                deposit_method=cfg.deposit_method,
                longrange_scale=longrange_scale,
                interlace=cfg.interlace,
            )
            if method == "p3m":
                from concept_tpu.forces.shortrange import shortrange_momentum_updates

                dmom_sr, n_sr = shortrange_momentum_updates(
                    state.pos, self.spec.mass, cfg.boxsize,
                    self._sr_scale, self._sr_range, int_a1,
                    n_cells=self._sr_ncells, capacity=self._sr_capacity,
                    softening=cfg.softening, G=cfg.G,
                    max_overflow=self._sr_max_overflow,
                    return_overflow=True,
                    softening_kernel=cfg.softening_kernel,
                )
                dmom = dmom + dmom_sr
                aux = (n_sr, aux[1])
        elif method in ("pp", "ppnonperiodic"):
            from concept_tpu.forces.pp import pp_momentum_updates

            dmom = pp_momentum_updates(
                state.pos, self.spec.mass, cfg.boxsize, int_a1, cfg.G,
                softening=cfg.softening,
                ewald_table=self._ewald_table,
                periodic=(method == "pp"),
                softening_kernel=cfg.softening_kernel,
            )
        else:
            raise ValueError(f"unknown gravity method {method!r}")
        return state._replace(mom=state.mom + dmom), aux

    def _drift(self, state: ParticleState, int_a2) -> ParticleState:
        fac = int_a2 / self.spec.mass
        pos = jnp.mod(state.pos + state.mom * fac, self.config.boxsize)
        return state._replace(pos=pos)

    def _step(self, state: ParticleState, int_a1, int_a2):
        """One KDK-ordered update: kick(int_a1) then drift(int_a2).

        The host supplies the exact integrals so that kicks straddle the
        drift midpoints (leapfrog).  Passing integrals as traced scalars
        avoids recompilation as Δt adapts.  Returns (state, overflow_aux).
        """
        state, aux = self._kick(state, int_a1)
        return self._drift(state, int_a2), aux

    def step(self, state, int_a1, int_a2):
        """One KDK step.  Returns the new state; the overflow counters of
        the evaluation are kept as lazy device scalars in
        ``self._pending_aux`` for the budget check (reading them here
        would stall dispatch every step)."""
        state, self._pending_aux = self._step_jit(
            state,
            jnp.asarray(int_a1, dtype=self.config.dtype),
            jnp.asarray(int_a2, dtype=self.config.dtype),
        )
        return state

    def _check_overflow_budgets(self):
        """Compare the last step's overflow counters against the static
        budgets (ADVICE r2: jnp.nonzero(..., size=S) truncates silently
        past the budget).  Exceeding is a correctness event: warn loudly
        and grow the budget (static arg → retrace) so it cannot recur."""
        if self._pending_aux is None:
            return
        n_sr, n_pm = (int(v) for v in self._pending_aux)
        self._pending_aux = None
        from concept_tpu.utils.terminal import warn

        regrow = False
        if n_sr > self._sr_max_overflow:
            warn(
                f"short-range overflow {n_sr} exceeded the straggler "
                f"budget {self._sr_max_overflow}: pair forces were "
                f"truncated this step; growing the budget"
            )
            self._sr_max_overflow = 2 * n_sr + 1024
            regrow = True
        if n_pm > self._pm_max_overflow:
            warn(
                f"PM deposit-block overflow {n_pm} exceeded the budget "
                f"{self._pm_max_overflow}: deposit mass was truncated "
                f"this step; growing the budget"
            )
            self._pm_max_overflow = 2 * n_pm + 1024
            regrow = True
        elif n_pm > self._pm_max_overflow // 2:
            # keep the exact fallback comfortable (≤ half full)
            self._pm_max_overflow = 2 * n_pm + 1024
            regrow = True
        if regrow:
            self._step_jit = jax.jit(self._step, donate_argnums=0)

    # ------------------------------------------------------------------ #
    def _refresh_shortrange_capacity(self, state, cap_max: int = 1024):
        """Grow the short-range bucket capacity (and straggler budget) as
        clustering raises cell occupancies — the TPU analogue of the
        reference's runtime (sub)tile refinement (species.py:4170-4428).

        Correctness never depends on this: overflow beyond capacity is
        handled exactly by the straggler path as long as its fixed budget
        holds; this keeps that budget comfortable (≤ half full)."""
        from concept_tpu.forces.shortrange import cell_counts

        counts = np.asarray(
            cell_counts(state.pos, self.config.boxsize, self._sr_ncells)
        )
        changed = False
        K = self._sr_capacity
        budget = self._sr_max_overflow // 2
        while K < cap_max and int(np.maximum(counts - K, 0).sum()) > budget:
            K = int(math.ceil((K * 2) / 8) * 8)
            changed = True
        overflow = int(np.maximum(counts - K, 0).sum())
        if overflow > budget:
            self._sr_max_overflow = 2 * overflow + 1024
            changed = True
        if changed and K != self._sr_capacity:
            self._sr_capacity = min(K, cap_max)
        if changed:
            # the jitted step closed over the old static sizes — retrace
            self._step_jit = jax.jit(self._step, donate_argnums=0)

    # ------------------------------------------------------------------ #
    def base_timestep_size(
        self, a: float, v_max: float | None = None
    ) -> tuple[float, str]:
        """Base Δt_max and its bottleneck (reference get_base_timestep_size,
        main.py:697-996): dynamical time, Hubble time, Δa_max, and — when
        the maximum particle speed is supplied — the PM/P³M displacement
        bounds fac_pm·cell / fac_p3m·split-scale per step."""
        bg = self.bg
        H = float(bg.hubble_np(a))
        rho_m_proper = (
            self.spec.mass * self.spec.N / self.config.boxsize**3 / a**3
            if self.spec.N
            else 0.0
        )
        fac_bg = self.config.dt_base_background_factor
        fac_nl = self.config.dt_base_nonlinear_factor
        limits: list[tuple[float, str]] = []
        if rho_m_proper > 0:
            limits.append((
                fac_bg * FAC_DYNAMICAL / math.sqrt(self.config.G * rho_m_proper),
                "the dynamical time scale",
            ))
        if H > 0:
            limits.append((fac_bg * FAC_HUBBLE / H, "the Hubble time"))
            # Δa limiters: Δt ≈ Δa/(aH)
            da_max = (self.config.da_max_early if a < 0.1
                      else self.config.da_max_late)
            limits.append((da_max / (a * H), "Δa"))
        if v_max is not None and v_max > 0:
            # comoving drift speed ẋ = v_pec/a; displacement per step bounded
            # by a fraction of the mesh cell (PM) or the split scale (P³M)
            xdot = v_max / a
            if self.config.method == "p3m":
                limits.append((
                    fac_nl * FAC_P3M * self._sr_scale / xdot,
                    "the P³M split scale",
                ))
            else:
                cell = self.config.boxsize / self.config.potential_gridsize
                limits.append((fac_nl * FAC_PM * cell / xdot, "the PM grid"))
        if not limits:
            return float("inf"), ""
        return min(limits, key=lambda lb: lb[0])

    def timestep_size(self, a: float, v_max: float | None = None) -> float:
        return self.base_timestep_size(a, v_max=v_max)[0]

    def evolve_static(self, state: ParticleState, t_total: float,
                      n_steps: int):
        """Static-universe (enable_Hubble=False) leapfrog over cosmic time
        (the reference's enable_Hubble=False mode; analogues:
        test/drift_nohubble, test/kick_pp_without_ewald).  a ≡ 1, so the
        kick/drift integrals are plain Δt."""
        dt = t_total / n_steps
        state = self.step(state, 0.5 * dt, dt)  # half kick + full drift
        for _ in range(n_steps - 1):
            state = self.step(state, dt, dt)
        # trailing half kick synchronizes mom at t_total
        state = self.step(state, 0.5 * dt, 0.0)
        return state

    def evolve(
        self,
        state: ParticleState,
        a_begin: float,
        a_end: float,
        callback: Callable | None = None,
        max_steps: int = 100000,
        print_interval: int = 0,
        dt_fac: float = 1.0,
        static_dt=None,
        resume: dict | None = None,
    ):
        """Evolve from a_begin to a_end with leapfrog KDK.

        Kicks are centered between drifts: the first kick covers Δt/2, each
        subsequent kick covers the straddling interval, the last kick closes
        the remaining half step so mom and pos end synchronized at a_end.

        Δt follows the reference's hysteresis (main.py:920-983): it starts
        at Δt_initial_fac·Δt_max, is reduced immediately whenever a limiter
        binds (warn/abort ratios enforced), and may only *increase* once
        Δt_period steps have passed since the last change, ramped by
        Δt_increase_max_factor.  ``static_dt`` is a
        :class:`concept_tpu.timestep.StaticTimestepping` (record/replay).

        The full time-stepping state (Δt, Δt_min = 1e-4·Δt_begin, step
        counters, and the kick synchronization point t_mom) is exposed
        after every step in ``self.hysteresis`` so autosaves can persist
        it (reference auxiliary file: time_step, Δt, Δt_begin —
        main.py:1821-1927); pass such a dict back as ``resume`` to
        continue EXACTLY where an interrupted run left off, including the
        leapfrog stagger of a mid-evolution snapshot.
        """
        from concept_tpu import timestep as ts

        bg = self.bg
        t = float(bg.t_of_a_np(a_begin))
        t_end = float(bg.t_of_a_np(a_end))
        a = a_begin
        step_count = 0
        v_max = None
        # momentum currently synchronized at t
        t_mom = t
        replay = static_dt is not None and static_dt.applies

        def dt_max_at(a_now, v_now):
            """(Δt_max, bottleneck) — static replay overrides limiters
            (reference get_base_timestep_size with
            static_timestepping_func, main.py:787-800)."""
            if replay:
                da = static_dt.delta_a(a_now)
                a_next = a_now + da
                if a_next > 1.0:
                    # reference: Δt = ထ once a+Δa passes 1 (main.py:615);
                    # the t_end clamp bounds the actual step
                    return float("inf"), "static time-stepping"
                dtm = float(bg.t_of_a_np(a_next)) - float(bg.t_of_a_np(a_now))
                return dtm * dt_fac, "static time-stepping"
            dtm, bn = self.base_timestep_size(a_now, v_max=v_now)
            return dtm * dt_fac, bn

        def refresh_v(a_now, st):
            if not self.spec.mass:
                return None
            # velocity-based limiters, refreshed at period boundaries
            # (reference Δt re-evaluation cadence, main.py:2380)
            v2 = jnp.max(jnp.sum(st.mom * st.mom, axis=1))
            return float(jnp.sqrt(v2)) / (a_now * self.spec.mass)

        v_max = refresh_v(a, state)
        if self.config.method == "p3m":
            self._refresh_shortrange_capacity(state)
        dt_max, bottleneck = dt_max_at(a, v_max)
        if static_dt is not None and static_dt.records and math.isfinite(dt_max):
            static_dt.record(a, float(bg.a_of_t_np(min(t + dt_max, t_end))) - a)
        dt = ts.DT_INITIAL_FAC * dt_max if math.isfinite(dt_max) else t_end - t
        dt_min = 1e-4 * dt  # reference Δt_min = 1e-4·Δt_begin (main.py:192)
        step_last_sync = 0
        if resume:
            # exact continuation of an interrupted run: restore Δt
            # hysteresis, counters, and the kick sync point (the state's
            # momentum may sit at t_mom ≠ t mid-leapfrog)
            dt = float(resume.get("dt", dt))
            dt_min = float(resume.get("dt_min", dt_min))
            step_count = int(resume.get("step_count", 0))
            step_last_sync = int(resume.get("step_last_sync", step_count))
            if resume.get("t_mom") is not None:
                t_mom = float(resume["t_mom"])
        self.hysteresis = {
            "dt": dt, "dt_min": dt_min, "step_count": step_count,
            "step_last_sync": step_last_sync, "t_mom": t_mom,
        }
        while t < t_end - 1e-12 * abs(t_end):
            if step_count and (step_count - step_last_sync) >= ts.DT_PERIOD:
                # period boundary: full limiter refresh, Δt may increase
                v_max = refresh_v(a, state)
                if self.config.method == "p3m":
                    self._refresh_shortrange_capacity(state)
                    self._check_overflow_budgets()
                dt_max, bn = dt_max_at(a, v_max)
                if static_dt is not None and static_dt.records and math.isfinite(dt_max):
                    static_dt.record(
                        a, float(bg.a_of_t_np(min(t + dt_max, t_end))) - a
                    )
                if dt > dt_max or dt_max > ts.DT_INCREASE_MIN_FAC * dt:
                    dt, bottleneck = ts.update_base_timestep_size(
                        dt, dt_min, dt_max, bn,
                        step_count - step_last_sync,
                        dt_increase_max_factor=DT_INCREASE_MAX_FAC,
                        tolerate_danger=replay,
                    )
                    step_last_sync = step_count
            else:
                # mid-period: reduction only (background limiters are cheap;
                # v_max is the last refreshed value)
                dt_max, bn = dt_max_at(a, v_max)
                if dt > dt_max:
                    dt, bottleneck = ts.update_base_timestep_size(
                        dt, dt_min, dt_max, bn,
                        allow_increase=False, tolerate_danger=replay,
                    )
                    step_last_sync = step_count
            dt = min(dt, t_end - t)
            # kick target: midpoint of upcoming drift (or t_end at last step)
            t_mid = min(t + 0.5 * dt, t_end)
            ints = bg.integrals_np(t_mom, t_mid, keys=("a**(-1)",))
            int_a1 = ints["a**(-1)"]
            ints2 = bg.integrals_np(t, t + dt, keys=("a**(-2)",))
            int_a2 = ints2["a**(-2)"]
            state = self.step(state, int_a1, int_a2)
            t_mom = t_mid
            t += dt
            a = float(bg.a_of_t_np(t))
            step_count += 1
            self.hysteresis = {
                "dt": dt, "dt_min": dt_min, "step_count": step_count,
                "step_last_sync": step_last_sync, "t_mom": t_mom,
            }
            if print_interval and step_count % print_interval == 0:
                # step heading (reference main.py:2016: step number, t, a,
                # z, Δt, limiting bottleneck)
                from concept_tpu.utils.terminal import masterprint

                z = 1 / a - 1 if a > 0 else float("inf")
                bn = f" [{bottleneck}]" if bottleneck else ""
                masterprint(
                    f"step {step_count}: t = {t:.6g}, a = {a:.6g}, "
                    f"z = {z:.4g}, Δt = {dt:.4g}{bn}"
                )
            if callback is not None:
                callback(state, t, a, step_count)
            if step_count >= max_steps:
                raise RuntimeError("max_steps exceeded")
        # close the trailing half kick so mom is synchronized at t_end
        if t_mom < t_end - 1e-12 * abs(t_end):
            int_a1 = bg.integrals_np(t_mom, t_end, keys=("a**(-1)",))["a**(-1)"]
            state = self.step(state, int_a1, 0.0)
        if self.config.method == "p3m":
            self._check_overflow_budgets()
        return state, a
