"""Δt hysteresis + static time-stepping (reference main.py:499-646,
920-983; VERDICT missing item 9)."""

import math

import numpy as np
import pytest

from concept_tpu.timestep import (
    DT_INCREASE_FAC,
    DT_INITIAL_FAC,
    DT_PERIOD,
    DT_REDUCE_FAC,
    StaticTimestepping,
    prepare_static_timestepping,
    update_base_timestep_size,
)


class TestUpdateBaseTimestepSize:
    def test_reduce_when_over_max(self):
        dt, bn = update_base_timestep_size(1.0, 1e-8, 0.5, "limiter X")
        assert dt == pytest.approx(DT_REDUCE_FAC * 0.5)
        assert bn == "limiter X"

    def test_abort_on_extreme_reduction(self):
        with pytest.raises(RuntimeError, match="unacceptable"):
            update_base_timestep_size(1.0, 1e-12, 1e-3, "x")

    def test_tolerate_danger_suppresses_abort(self):
        dt, _ = update_base_timestep_size(
            1.0, 1e-12, 1e-3, "x", tolerate_danger=True
        )
        assert dt == pytest.approx(DT_REDUCE_FAC * 1e-3)

    def test_abort_below_min(self):
        with pytest.raises(RuntimeError, match="halted"):
            update_base_timestep_size(1.0, 0.9, 0.5, "x")

    def test_increase_ramped_by_period_fraction(self):
        # just after a sync only a small increase is allowed
        dt, bn = update_base_timestep_size(
            1.0, 1e-8, 10.0, "x", 0, dt_increase_max_factor=1.5
        )
        assert dt == pytest.approx(1 + (1 / DT_PERIOD) * 0.5)
        assert bn == ""
        # a full period later the full ramp is available
        dt, _ = update_base_timestep_size(
            1.0, 1e-8, 10.0, "x", DT_PERIOD, dt_increase_max_factor=1.5
        )
        assert dt == pytest.approx(1.5)

    def test_increase_capped_by_dt_max(self):
        dt, bn = update_base_timestep_size(
            1.0, 1e-8, 1.05, "x", DT_PERIOD, dt_increase_max_factor=1.5
        )
        assert dt == pytest.approx(DT_INCREASE_FAC * 1.05)
        assert bn == ""

    def test_no_increase_when_disallowed(self):
        dt, bn = update_base_timestep_size(
            1.0, 1e-8, 10.0, "x", allow_increase=False
        )
        assert dt == 1.0
        assert bn == "x"


class TestStaticTimestepping:
    def test_none(self):
        assert prepare_static_timestepping(None) is None

    def test_callable(self):
        st = prepare_static_timestepping(lambda a: 0.01 * a)
        assert st.applies and not st.records
        assert st.delta_a(0.5) == pytest.approx(0.005)

    def test_record_then_replay_exact(self, tmp_path):
        path = str(tmp_path / "steps.txt")
        rec = StaticTimestepping(path)
        assert rec.records
        rows = [(0.1, 0.002), (0.102, 0.002), (0.2, 0.005), (0.2, 0.003)]
        for a, da in rows:
            rec.record(a, da)
        rep = StaticTimestepping(path)
        assert rep.applies
        # exact rows replay verbatim; the duplicated a consumes FIFO
        assert rep.delta_a(0.1) == pytest.approx(0.002)
        assert rep.delta_a(0.2) == pytest.approx(0.005)
        assert rep.delta_a(0.2) == pytest.approx(0.003)

    def test_replay_interpolates_between_rows(self, tmp_path):
        path = str(tmp_path / "steps.txt")
        rec = StaticTimestepping(path)
        for a in (0.1, 0.2, 0.4, 0.8):
            rec.record(a, 0.01 * a)  # Δa ∝ a → log-log linear
        rep = StaticTimestepping(path)
        assert rep.delta_a(0.3) == pytest.approx(0.003, rel=1e-6)
        # extrapolation beyond the last row follows the last interval
        assert rep.delta_a(0.9) == pytest.approx(0.009, rel=1e-3)

    def test_replay_does_not_interpolate_across_reduction(self, tmp_path):
        # a sawtooth (Δa drops at a=0.4): interpolation at a=0.35 must use
        # the first (increasing) interval only, not bridge the drop
        path = str(tmp_path / "steps.txt")
        rec = StaticTimestepping(path)
        for a, da in [(0.1, 0.004), (0.2, 0.008), (0.4, 0.002), (0.8, 0.004)]:
            rec.record(a, da)
        rep = StaticTimestepping(path)
        got = rep.delta_a(0.3)
        # log-log linear within interval 1: Δa(0.3) ≈ 0.008·(0.3/0.2)^1 = 0.0117
        assert got > 0.008  # monotone continuation, not the post-drop value
        assert rep.delta_a(0.5) < 0.004  # second interval

    def test_directory_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="directory"):
            StaticTimestepping(str(tmp_path))

    def test_bad_type_rejected(self):
        with pytest.raises(ValueError, match="interpret"):
            StaticTimestepping(42)


class TestEvolveHysteresis:
    @pytest.fixture(scope="class")
    def sim_setup(self):
        import jax.numpy as jnp

        from concept_tpu.components import ComponentSpec
        from concept_tpu.cosmology.background import Background
        from concept_tpu.sim import SimConfig, Simulation

        bg = Background(H0=0.07, Omega_m=0.3)
        n = 4
        N = n**3
        spec = ComponentSpec(name="m", species="matter", N=N, mass=1.0)
        cfg = SimConfig(boxsize=100.0, potential_gridsize=8, G=1.0)
        sim = Simulation(spec, cfg, bg)
        lin = (np.arange(n) + 0.5) * (100.0 / n)
        pos = np.stack(
            np.meshgrid(lin, lin, lin, indexing="ij"), -1
        ).reshape(-1, 3).astype(np.float32)
        from concept_tpu.components import ParticleState

        state = ParticleState(
            pos=jnp.asarray(pos), mom=jnp.zeros((N, 3), jnp.float32)
        )

        # the jitted step donates its input buffers: hand each test a copy
        def fresh():
            import jax

            return jax.tree_util.tree_map(jnp.array, state)

        return sim, fresh

    def test_record_and_replay_roundtrip(self, sim_setup, tmp_path):
        sim, fresh = sim_setup
        state = fresh()
        path = str(tmp_path / "ts.txt")
        rec = prepare_static_timestepping(path)
        st1, a1 = sim.evolve(fresh(), 0.1, 0.3, static_dt=rec, dt_fac=1.0)
        data = np.loadtxt(path, ndmin=2)
        assert data.shape[0] >= 1 and np.all(data[:, 1] > 0)
        rep = prepare_static_timestepping(path)
        assert rep.applies
        st2, a2 = sim.evolve(fresh(), 0.1, 0.3, static_dt=rep, dt_fac=1.0)
        assert a2 == pytest.approx(a1, rel=1e-6)
        np.testing.assert_allclose(
            np.asarray(st2.pos), np.asarray(st1.pos), rtol=0, atol=2e-3
        )

    def test_initial_dt_uses_initial_fac(self, sim_setup):
        sim, fresh = sim_setup
        state = fresh()
        dts = []
        ts = []

        def cb(st, t, a_now, n):
            ts.append(t)

        sim.evolve(state, 0.1, 0.12, callback=cb)
        dts = np.diff([float(sim.bg.t_of_a_np(0.1))] + ts)
        dt_max0, _ = sim.base_timestep_size(0.1, v_max=0.0)
        assert dts[0] <= DT_INITIAL_FAC * dt_max0 * (1 + 1e-9)

    def test_dt_growth_bounded_within_period(self, sim_setup):
        # Δa_max jumps 14x at a=0.1 (early→late); hysteresis must ramp Δt
        # rather than jump: successive Δt ratios stay ≤ the per-period cap
        sim, fresh = sim_setup
        state = fresh()
        ts = []
        sim.evolve(state, 0.095, 0.3, callback=lambda s, t, a, n: ts.append(t))
        dts = np.diff(ts)
        ratios = dts[1:] / dts[:-1]
        from concept_tpu.sim import DT_INCREASE_MAX_FAC

        assert ratios.max() <= DT_INCREASE_MAX_FAC * 1.01
