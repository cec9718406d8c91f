"""On-chip f32 smoke gates (VERDICT r2 #1): run with

    LTO_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -q -m slow

(use LTO_TEST_PLATFORM=axon when the chip is reached through the axon
tunnel, as in this environment; 4 passed in 45 s on TPU v5e.)

These assert the production-dtype (f32) quality of the racing-line pipeline
ON THE CHIP, complementing the CPU-x64 oracle tier.  The full 9-column
on-chip evidence lives in `benchmarks/parity_matrix_tpu_f32.json`
(regenerate with `benchmarks/run_parity_matrix.py --solver assoc`); this
module keeps a fast subset runnable as a test gate.

Skipped automatically on the CPU tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_time_optimization_tpu.optim import racing_line

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.devices()[0].platform not in ("tpu", "axon"),
        reason="on-chip smoke tier: set LTO_TEST_PLATFORM=tpu",
    ),
]


class TestOnChipF32:
    def test_dtype_is_f32(self, buckmore99):
        assert buckmore99.left.dtype == jnp.float32

    def test_curvature_lap_time_on_chip(self, buckmore99, tbr18):
        """Production f32 curvature line within the published×1.01 gate
        (reference README.md:121; measured on-chip 39.867 vs 39.934)."""
        res = racing_line.minimise_curvature(buckmore99, max_iter=600)
        lap, length, _, _ = racing_line.evaluate_jit(buckmore99, tbr18, res.x)
        assert float(lap) < 39.934 * 1.01
        assert abs(float(length) - 860.772) / 860.772 < 0.01

    def test_velocity_solver_schedules_agree_f32(self, buckmore99, tbr18):
        """Sequential scan vs associative schedule on the chip, f32: the two
        production solvers must agree to f32-roundoff over the real track."""
        from lap_time_optimization_tpu.ops import spline, velocity

        sp = buckmore99.mid_spline()
        s = jnp.linspace(0.0, sp.length, buckmore99.ns)[:-1]
        k = spline.curvature(sp, s, signed=False)
        v_scan = velocity.solve_profile(tbr18, s, k, sp.length, closed=True)
        v_assoc = velocity.solve_profile_parallel(tbr18, s, k, sp.length, closed=True)
        np.testing.assert_allclose(
            np.asarray(v_assoc), np.asarray(v_scan), rtol=2e-3
        )

    def test_direct_laptime_beats_reference_on_chip(self, buckmore99, tbr18):
        """The headline column (exact gradients vs the reference's
        finite differences) must hold in production f32 on the chip:
        measured 36.445 vs published 40.892 (−10.9%)."""
        res = racing_line.minimise_lap_time(buckmore99, tbr18, max_iter=300)
        lap, _, _, _ = racing_line.evaluate_jit(buckmore99, tbr18, res.x)
        assert float(lap) < 40.892

    def test_estimated_compromise_on_chip(self, buckmore99, tbr18):
        """`estimated` (optimal-ε compromise) in production f32 on the chip
        (VERDICT r3 weak #9: this method had CPU-x64 evidence only).  Same
        bound as the CPU gate (tests/test_racing_line.py: measured 38.384,
        asserted < 40.0; reference src/trajectory.py:99-126)."""
        alphas, eps, _ = racing_line.minimise_optimal_compromise(buckmore99, tbr18)
        lap, _, _, _ = racing_line.evaluate_jit(buckmore99, tbr18, alphas)
        assert float(lap) < 40.0
        assert 0.0 <= float(eps) <= 0.2

    def test_sectors_on_chip(self, buckmore99, tbr18):
        """`sectors` in production f32 on the chip (CPU-x64 gate: measured
        38.902, asserted < published curvature 39.934; reference
        src/trajectory.py:148-213)."""
        alphas, _, _ = racing_line.optimise_sectors(buckmore99, tbr18)
        lap, _, _, _ = racing_line.evaluate_jit(buckmore99, tbr18, alphas)
        assert float(lap) < 39.934


class TestPallasKernelOnChip:
    def test_fused_kernel_matches_scan_compiled(self, buckmore99, tbr18):
        """The COMPILED (non-interpret) fused dual-sweep kernel vs the
        sequential scan on the chip — the CPU tier only covers interpret
        mode.  51× faster than the vmapped scan at B=1024 (PERFORMANCE.md);
        here a modest batch bounds test time."""
        from lap_time_optimization_tpu.ops import pallas_velocity, spline, velocity

        sp = buckmore99.mid_spline()
        s = jnp.linspace(0.0, sp.length, buckmore99.ns)[:-1]
        k = spline.curvature(sp, s, signed=False)
        B = 256
        kb = k[None, :] * jax.random.uniform(jax.random.PRNGKey(0), (B, 1), k.dtype, 0.8, 1.2)
        got = pallas_velocity.solve_profile_batch(tbr18, s, kb, sp.length, closed=True)
        ref = jax.vmap(lambda kr: velocity.solve_profile(tbr18, s, kr, sp.length, closed=True))(kb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def test_batch_lap_times_pallas_solver(self, buckmore99, tbr18):
        """solver='pallas' in the batched search evals agrees with the scan."""
        from lap_time_optimization_tpu.optim import global_search

        d = buckmore99.n_decongested
        x = jax.random.uniform(jax.random.PRNGKey(2), (16, d), buckmore99.left.dtype, 0.0, 0.99)
        t_scan = global_search._batch_lap_times(buckmore99, tbr18, x, "scan")
        t_pal = global_search._batch_lap_times(buckmore99, tbr18, x, "pallas")
        np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_scan), rtol=1e-4)

    def test_search_step_pallas_solver(self, buckmore99, tbr18):
        """`parallel.mesh.batch_lap_times(solver='pallas')` (the single-chip
        production path of the evolution-strategy search and the throughput
        anchor, round 4) agrees with the sequential scan over full-alpha
        candidates."""
        from lap_time_optimization_tpu.parallel import mesh as pmesh

        x = jax.random.uniform(
            jax.random.PRNGKey(3), (16, buckmore99.size), buckmore99.left.dtype
        )
        t_scan = pmesh.batch_lap_times(buckmore99, tbr18, x, "scan")
        t_pal = pmesh.batch_lap_times(buckmore99, tbr18, x, "pallas")
        np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_scan), rtol=1e-4)


class TestBenchConfigFeasibility:
    def test_bench_200_step_applied_states_feasible(self):
        """The EXACT bench.py configuration (MX-5/buckmore/curvature, h10,
        5 cm margin, 200 steps, single scan): applied closed-loop states must
        respect the TRUE band to < 1e-2 (VERDICT r4 weak #4 — the CPU tier
        gates 25 steps; the headline bench config was gated nowhere)."""
        import os

        from lap_time_optimization_tpu.models import load_vehicle
        from lap_time_optimization_tpu.models.bicycle import BicycleModel
        from lap_time_optimization_tpu.mpc import runner
        from lap_time_optimization_tpu.mpc import track as mpc_track
        from lap_time_optimization_tpu.mpc.solver import OCPParams, SolverConfig

        repo_data = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
        )
        track = mpc_track.load("MX-5", "buckmore", "curvature", base_dir=repo_data)
        model = BicycleModel(vehicle=load_vehicle("MX5"), track=track)
        p = OCPParams.reference(jnp.float32, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
        sim = runner.closed_loop(model, p, cfg, x0, 200)
        assert runner.applied_violation(model, p, sim) < 1e-2


class TestOnChipEndurance:
    def test_three_lap_endurance_f32_h10(self):
        """3-lap endurance ON THE CHIP in the production configuration
        (VERDICT r3 #8): h10, f32, brake preview, chunked driver with the
        fused Pallas iLQR kernel.  The CPU tier's 2-lap gate
        (tests/test_mpc.py::TestTwoLaps) proves seam semantics in x-platform
        f32; this proves them on the production platform and kernel path
        through THREE start-line crossings with warm starts throughout."""
        import os

        from lap_time_optimization_tpu.models import load_vehicle
        from lap_time_optimization_tpu.models.bicycle import BicycleModel
        from lap_time_optimization_tpu.mpc import runner
        from lap_time_optimization_tpu.mpc import track as mpc_track
        from lap_time_optimization_tpu.mpc.solver import OCPParams, SolverConfig

        repo_data = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
        )
        tr = mpc_track.load("MX-5", "buckmore", "curvature", base_dir=repo_data)
        tr = mpc_track.with_brake_preview(tr, 1.0, vref_scale=0.6)
        tr32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tr)
        model32 = BicycleModel(vehicle=load_vehicle("MX5"), track=tr32)
        p = OCPParams.reference(jnp.float32, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
        sim = runner.closed_loop_chunked(model32, p, cfg, x0, 2800, chunk=200)
        xs = np.asarray(sim.xs)
        s = xs[:, 0]
        s_max = float(model32.track.s_max)
        assert np.all(np.diff(s) > 0)  # monotone progress through 3 seams
        assert s[-1] > 3.0 * s_max
        # lap times from the three start-line crossings: warm-start health
        # means lap 2 and 3 (flying laps) are no slower than lap 1 + 2 s
        crossings = [int(np.argmax(s > m * s_max)) for m in (1.0, 2.0, 3.0)]
        assert 0 < crossings[0] < crossings[1] < crossings[2]
        lap1 = crossings[0]
        for a, b in zip(crossings, crossings[1:]):
            assert (b - a) <= lap1 + 20
        assert np.abs(xs[:, 2]).max() < 0.5  # no spin
        assert np.abs(xs[:, 1]).max() < 1.0  # on the line
