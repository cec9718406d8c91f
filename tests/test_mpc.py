"""NMPC stack tests: dynamics parity, solver optimality, closed-loop sanity.

Oracles (SURVEY.md §4): an independent numpy re-derivation of the CasADi RHS
(src/mpc/model.py:152-183), gradient-stationarity of the solved OCP, and the
committed reference trace for schema parity.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_time_optimization_tpu.models.bicycle import NU, NX, BicycleModel
from lap_time_optimization_tpu.mpc import runner
from lap_time_optimization_tpu.mpc import solver as solver_mod
from lap_time_optimization_tpu.mpc import track as mpc_track
from lap_time_optimization_tpu.mpc.solver import N_CON, OCPParams, SolverConfig

REF_DATA = os.environ.get("LTO_REF_DATA", "/root/reference/data")
REPO_DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


@pytest.fixture(scope="module")
def track():
    """SHIPPED artifact set: the NMPC suite runs from a bare checkout.
    The reference mount is only needed by TestRecordedTrace (whose recorded
    IPOPT trace was produced on the reference's own artifacts)."""
    if not os.path.isdir(os.path.join(REPO_DATA, "plots", "MX-5", "buckmore", "curvature")):
        pytest.skip("shipped buckmore artifacts not available")
    return mpc_track.load("MX-5", "buckmore", "curvature", base_dir=REPO_DATA)


@pytest.fixture(scope="module")
def model(track, mx5):
    return BicycleModel(vehicle=mx5, track=track)


@pytest.fixture(scope="module")
def ref_track():
    """REFERENCE artifact set — oracle for the recorded-IPOPT-trace gates."""
    if not os.path.isdir(os.path.join(REF_DATA, "plots", "MX-5", "buckmore", "curvature")):
        pytest.skip("reference artifacts not available")
    return mpc_track.load("MX-5", "buckmore", "curvature", base_dir=REF_DATA)


@pytest.fixture(scope="module")
def ref_model(ref_track, mx5):
    return BicycleModel(vehicle=mx5, track=ref_track)


def numpy_rhs(veh, track, x, u):
    """Independent numpy statement of the curvilinear bicycle ODE
    (src/mpc/model.py:152-183)."""
    g = 9.81
    s, n, mu, vx, vy, r, delta, thr = x
    k = float(track.curvature(jnp.asarray(s)))
    sdot = (vx * np.cos(mu) - vy * np.sin(mu)) / (1 - n * k)
    m = float(veh.mass)
    lf, lr = float(veh.length_f), float(veh.length_r)
    af = np.arctan2(vy + lf * r, vx) - delta
    ar = np.arctan2(vy - lr * r, vx)
    Fn_f = lr * m * g / (lf + lr)
    Fn_r = lf * m * g / (lf + lr)
    Fy_f = -Fn_f * float(veh.D_f) * np.sin(float(veh.C_f) * np.arctan(float(veh.B_f) * af))
    Fy_r = -Fn_r * float(veh.D_r) * np.sin(float(veh.C_r) * np.arctan(float(veh.B_r) * ar))
    Fx = float(veh.C_m) * thr - float(veh.Cr_0) - float(veh.Cr_2) * vx * vx
    return np.array(
        [
            sdot,
            vx * np.sin(mu) + vy * np.cos(mu),
            r - k * sdot,
            (Fx - Fy_f * np.sin(delta) + m * vy * r) / m,
            (Fy_r + Fy_f * np.cos(delta) - m * vx * r) / m,
            (Fy_f * lf * np.cos(delta) - Fy_r * lr) / float(veh.rotational_inertia),
            u[0],
            u[1],
        ]
    )


class TestDynamics:
    def test_rhs_matches_numpy(self, model, rng):
        for _ in range(10):
            x = np.array(
                [
                    rng.uniform(0, 800),
                    rng.uniform(-1, 1),
                    rng.uniform(-0.3, 0.3),
                    rng.uniform(1, 20),
                    rng.uniform(-2, 2),
                    rng.uniform(-1, 1),
                    rng.uniform(-0.5, 0.5),
                    rng.uniform(-1, 1),
                ]
            )
            u = rng.uniform(-1, 1, size=2)
            ours = np.asarray(model.rhs(jnp.asarray(x), jnp.asarray(u)))
            ref = numpy_rhs(model.vehicle, model.track, x, u)
            np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)

    def test_rk4_convergence(self, model):
        x = jnp.asarray(runner.X0_REFERENCE)
        u = jnp.asarray([0.1, 0.5])
        coarse = np.asarray(model.step(x, u, 0.1, substeps=4))
        fine = np.asarray(model.step(x, u, 0.1, substeps=64))
        np.testing.assert_allclose(coarse, fine, rtol=1e-3, atol=1e-5)

    def test_curvature_lookup_wraps(self, track):
        s_max = float(track.s_max)
        k0 = float(track.curvature(jnp.asarray(1.0)))
        k_wrapped = float(track.curvature(jnp.asarray(1.0 + s_max)))
        np.testing.assert_allclose(k0, k_wrapped, rtol=1e-6)

    def test_boundary_distances_positive(self, track):
        nl = np.asarray(track.nl_vals)
        nr = np.asarray(track.nr_vals)
        assert np.all(nl > 0.1) and np.all(nr > 0.1)
        assert np.all(nl < 20) and np.all(nr < 20)


class TestSolver:
    @pytest.fixture(scope="class")
    def solved(self, model):
        p = OCPParams.reference(jnp.float64)
        cfg = SolverConfig.accurate(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        z0 = jnp.concatenate([x0, jnp.zeros(NU)])
        us0 = jnp.zeros((cfg.horizon, NU))
        lam0 = jnp.zeros((cfg.horizon + 1, N_CON))
        res = solver_mod.solve(model, p, cfg, z0, us0, lam0)
        return p, cfg, z0, res

    def test_improves_on_initial_rollout(self, model, solved):
        p, cfg, z0, res = solved
        zs0 = solver_mod._rollout(model, cfg, z0, jnp.zeros_like(res.us))
        cost0 = float(solver_mod._true_cost(model, p, zs0, jnp.zeros_like(res.us)))
        assert float(res.cost) < cost0

    def test_constraints_satisfied(self, solved):
        *_, res = solved
        assert float(res.max_violation) < 1e-2

    def test_stationarity(self, model, solved):
        """With constraints inactive at the optimum, the gradient of the true
        cost w.r.t. the input sequence should be near zero."""
        p, cfg, z0, res = solved

        def total_cost(us):
            zs = solver_mod._rollout(model, cfg, z0, us)
            return solver_mod._true_cost(model, p, zs, us)

        g = np.asarray(jax.grad(total_cost)(res.us))
        # the throttle-rate channel saturates (u1=+1 bound active) so only
        # require stationarity in the unconstrained directions
        u = np.asarray(res.us)
        interior = (np.abs(u[:, 1]) < 0.99)
        assert np.all(np.abs(g[:, 0]) < 5e-2)
        if interior.any():
            assert np.all(np.abs(g[interior, 1]) < 5e-2)

    def test_warm_start_consistency(self, model, solved):
        p, cfg, z0, res = solved
        res2 = solver_mod.solve(model, p, cfg, z0, res.us, res.lam)
        assert float(res2.cost) <= float(res.cost) * 1.01


class TestClosedLoop:
    @pytest.fixture(scope="class")
    def sim(self, model):
        # production defaults: real-time preset + 5 cm lateral tightening
        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        return model, p, runner.closed_loop(model, p, cfg, x0, 25)

    def test_progresses_forward(self, sim):
        _, _, res = sim
        s = np.asarray(res.xs[:, 0])
        assert np.all(np.diff(s) > 0)
        assert s[-1] > 10.0  # ≥ the reference trace progress (12.46 in 25 steps)

    def test_stays_on_track(self, sim):
        model, _, res = sim
        xs = res.xs
        nl = np.asarray(model.track.dist_left(xs[:, 0]))
        nr = np.asarray(model.track.dist_right(xs[:, 0]))
        n = np.asarray(xs[:, 1])
        assert np.all(n < nl + 1e-2) and np.all(-n < nr + 1e-2)

    def test_applied_states_feasible(self, sim):
        """With the 5 cm tightening margin, APPLIED closed-loop states must
        respect the true constraints to < 1e-2 (VERDICT r1 weak #3; measured
        8.6e-3 over 150 steps for the h10 real-time preset)."""
        model, p, res = sim
        xs, us = res.xs, res.us
        g = jax.vmap(
            lambda x, u: solver_mod.constraints(
                model, p, jnp.concatenate([x, jnp.zeros(2)]), u
            )
        )(xs[1:], us[1:])
        assert float(jnp.max(g)) < 1e-2

    def test_constraint_violations_small(self, sim):
        # max violation over the *predicted* trajectories (tails included)
        _, _, res = sim
        assert float(np.max(np.asarray(res.violations))) < 0.02

    def test_sim_results_schema(self, sim):
        model, _, res = sim
        data = runner.to_sim_results(model, res)
        x = np.asarray(data["x"])
        u = np.asarray(data["u"])
        assert x.shape == (26, NX, 1)
        assert u.shape == (26, NU, 1)
        assert np.asarray(data["Fy"]).shape == (26, 2)
        assert np.asarray(data["alpha"]).shape == (26, 2)
        # matches the committed reference trace schema
        ref_path = os.path.join(os.path.dirname(REF_DATA), "simulation_recorded_results.json")
        if os.path.isfile(ref_path):
            ref = json.load(open(ref_path))
            assert set(data.keys()) == set(ref.keys())
            assert np.asarray(ref["x"]).shape == (26, NX, 1)


class TestChunkedClosedLoop:
    def test_chunked_equals_single_scan(self, model):
        """`closed_loop_chunked` must be bit-identical to `closed_loop`:
        the warm-start carry crosses chunk boundaries on device, so chunking
        is purely a compile-time strategy (constant program size for laps of
        any length), never a numerics change."""
        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        single = runner.closed_loop(model, p, cfg, x0, 7)
        chunked = runner.closed_loop_chunked(model, p, cfg, x0, 7, chunk=3)
        for a, b in zip(single, chunked):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # exact multiple of the chunk size too
        chunked = runner.closed_loop_chunked(model, p, cfg, x0, 6, chunk=3)
        for a, b in zip(runner.closed_loop(model, p, cfg, x0, 6), chunked):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_steps_zero(self, model):
        """steps=0 returns an empty-but-well-formed SimResult instead of
        crashing on jnp.concatenate([]) (ADVICE r2)."""
        p = OCPParams.reference(jnp.float64)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        res = runner.closed_loop_chunked(model, p, cfg, x0, 0)
        assert res.xs.shape == (1, NX) and res.us.shape == (1, NU)
        assert res.costs.shape == (0,) and res.sdot.shape == (0,)
        np.testing.assert_array_equal(np.asarray(res.xs[0]), np.asarray(x0))

    def test_checkpoint_resume(self, model, tmp_path):
        """An interrupted chunked run resumes from the npz checkpoint at the
        last completed chunk and reproduces the no-checkpoint trajectory
        bit-for-bit (the warm-start carry crosses the save/load boundary
        exactly)."""
        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        cp = str(tmp_path / "sim_checkpoint.npz")
        baseline = runner.closed_loop_chunked(model, p, cfg, x0, 6, chunk=2)
        # first run writes checkpoints after chunks 1 and 2 (done=2, 4)
        first = runner.closed_loop_chunked(model, p, cfg, x0, 6, chunk=2, checkpoint_path=cp)
        from lap_time_optimization_tpu.utils import checkpoint

        assert checkpoint.exists(cp)
        assert int(checkpoint.load(cp)["done"]) == 4
        # "interrupted" rerun: resumes at done=4, only re-runs the last chunk
        resumed = runner.closed_loop_chunked(model, p, cfg, x0, 6, chunk=2, checkpoint_path=cp)
        for a, b, c in zip(baseline, first, resumed):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        # a checkpoint for DIFFERENT run parameters is ignored, not misused
        other = runner.closed_loop_chunked(model, p, cfg, x0, 4, chunk=2, checkpoint_path=cp)
        for a, b in zip(runner.closed_loop_chunked(model, p, cfg, x0, 4, chunk=2), other):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_rejects_config_mismatch(self, model, tmp_path):
        """A checkpoint written under different OCPParams/SolverConfig at the
        same path must be ignored (fingerprint mismatch), not spliced into
        this run's trajectory (ADVICE r3)."""
        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        cp = str(tmp_path / "sim_checkpoint.npz")
        runner.closed_loop_chunked(model, p, cfg, x0, 6, chunk=2, checkpoint_path=cp)
        # same steps/chunk/x0, different solver config → must NOT resume
        cfg2 = SolverConfig(horizon=10, ilqr_iters=cfg.ilqr_iters + 1)
        baseline2 = runner.closed_loop_chunked(model, p, cfg2, x0, 6, chunk=2)
        resumed2 = runner.closed_loop_chunked(model, p, cfg2, x0, 6, chunk=2, checkpoint_path=cp)
        for a, b in zip(baseline2, resumed2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_solve_batch_non_gauss_newton_falls_back(self, model):
        """solve_batch with a Pallas-family backend + non-GN Hessians must
        delegate to vmap(solve) on the XLA path instead of raising
        (ADVICE r3)."""
        from lap_time_optimization_tpu.mpc.solver import n_con, solve_batch

        p = OCPParams.reference(jnp.float64)
        cfg = SolverConfig(horizon=4, hessian_mode="exact", backend="interpret")
        x0 = jnp.asarray(runner.X0_REFERENCE)
        z0_b = jnp.tile(jnp.concatenate([x0, jnp.zeros(2)]), (2, 1))
        us0 = jnp.zeros((2, 4, NU))
        lam0 = jnp.zeros((2, 5, n_con(model)))
        res = solve_batch(model, p, cfg, z0_b, us0, lam0)
        assert np.all(np.isfinite(np.asarray(res.cost)))

    def test_batch_window_derivation(self, model):
        """`ensure_batch_window` sizes the batch kernel's table window from
        the concrete track + horizon (ADVICE r3: WINDOW=64 hard-coded ~1 m
        spacing); explicit-but-insufficient windows are rejected."""
        from lap_time_optimization_tpu.mpc import solver as solver_mod

        cfg = SolverConfig(horizon=10, backend="pallas")
        out = solver_mod.ensure_batch_window(model, cfg)
        need = solver_mod.required_batch_window(model, cfg)
        assert out.window >= max(need, 64) and out.window % 8 == 0
        # a long/fast horizon on the same table spacing needs a larger window
        cfg_long = SolverConfig(horizon=40, backend="pallas")
        assert solver_mod.required_batch_window(model, cfg_long) > need
        with pytest.raises(ValueError):
            solver_mod.ensure_batch_window(
                model, SolverConfig(horizon=40, backend="pallas", window=16)
            )
        # the XLA backend has no window to validate
        cfg_xla = SolverConfig(horizon=10, backend="xla", window=16)
        assert solver_mod.ensure_batch_window(model, cfg_xla) is cfg_xla


class TestBrakePreview:
    """`mpc_track.with_brake_preview`: the braking-curve envelope baked into
    the vref table so short horizons see corner braking points early (the
    NMPC plant can only brake at ≈ C_m·T/m ≈ 1 m/s², reference
    src/mpc/model.py:160, while the vref artifact assumes full-traction
    braking, src/velocity.py:55-76)."""

    A = 1.0  # physical decel budget on the tracked 0.6·vref target
    SCALE = 0.6

    def test_envelope_is_brake_feasible_and_below_original(self, track):
        tr = mpc_track.with_brake_preview(track, self.A, vref_scale=self.SCALE)
        v0 = np.asarray(track.vref_vals, np.float64)
        v1 = np.asarray(tr.vref_vals, np.float64)
        n = v1.shape[0]
        ds = float(track.s_max) / (n - 1)
        assert np.all(v1 <= v0 + 1e-9)
        # tracked target w = SCALE*v satisfies w[i]^2 <= w[i+1]^2 + 2*A*ds,
        # including across the closed-lap seam (sample n-1 == sample 0)
        w2 = (self.SCALE * v1) ** 2
        budget = 2.0 * self.A * ds + 1e-9
        assert np.all(w2[:-1] - w2[1:] <= budget)
        assert w2[-1] - w2[0] <= 1e-9
        # the envelope binds somewhere (buckmore has real corners) but not
        # everywhere (straights keep the original profile)
        assert np.any(v1 < v0 - 1e-6)
        assert np.any(np.abs(v1 - v0) < 1e-9)

    def test_budget_monotonicity_and_identity(self, track):
        loose = mpc_track.with_brake_preview(track, 4.0, vref_scale=self.SCALE)
        tight = mpc_track.with_brake_preview(track, 0.5, vref_scale=self.SCALE)
        assert np.all(
            np.asarray(tight.vref_vals) <= np.asarray(loose.vref_vals) + 1e-9
        )
        # a <= 0 and a = inf are identity (no copy semantics guaranteed,
        # values must match exactly)
        same = mpc_track.with_brake_preview(track, 0.0)
        np.testing.assert_array_equal(
            np.asarray(same.vref_vals), np.asarray(track.vref_vals)
        )
        same = mpc_track.with_brake_preview(track, float("inf"))
        np.testing.assert_array_equal(
            np.asarray(same.vref_vals), np.asarray(track.vref_vals)
        )

    def test_rejects_nonpositive_vref_scale(self, track):
        """ADVICE r2: a zero/negative vref_scale would divide by scale² and
        produce a nonsensical envelope; it must be rejected loudly."""
        with pytest.raises(ValueError):
            mpc_track.with_brake_preview(track, 1.0, vref_scale=0.0)
        with pytest.raises(ValueError):
            mpc_track.with_brake_preview(track, 1.0, vref_scale=-0.5)

    def test_tiny_budget_reaches_fixed_point(self, track):
        """ADVICE r2: with a braking distance exceeding two laps the
        hardcoded-2-sweep envelope violated the feasibility invariant near
        the seam; the fixed-point iteration must satisfy it for ANY budget."""
        tr = mpc_track.with_brake_preview(track, 0.005, vref_scale=self.SCALE)
        w2 = (self.SCALE * np.asarray(tr.vref_vals, np.float64)) ** 2
        n = w2.shape[0]
        ds = float(track.s_max) / (n - 1)
        # tracked-target invariant: w[i]^2 <= w[i+1]^2 + 2*a_brake*ds
        budget = 2.0 * 0.005 * ds + 1e-9
        assert np.all(w2[:-1] - w2[1:] <= budget)
        assert w2[-1] - w2[0] <= 1e-9

    def test_only_vref_changes(self, track):
        tr = mpc_track.with_brake_preview(track, self.A, vref_scale=self.SCALE)
        np.testing.assert_array_equal(np.asarray(tr.k_vals), np.asarray(track.k_vals))
        np.testing.assert_array_equal(np.asarray(tr.nl_vals), np.asarray(track.nl_vals))
        np.testing.assert_array_equal(np.asarray(tr.nr_vals), np.asarray(track.nr_vals))
        assert float(tr.s_max) == float(track.s_max)


@pytest.mark.slow
class TestRecordedTrace:
    """Numeric parity against the committed 25-step do_mpc/IPOPT recording
    (/root/reference/simulation_recorded_results.json, produced by
    src/mpc.py:125-159 on the MX-5/buckmore/curvature artifacts).

    The comparison splits into what the trace can and cannot oracle:
    * PLANT: replaying the recorded controls through our RK4 bicycle model
      must reproduce the recorded do_mpc/SUNDIALS states step by step — this
      is the tight numeric gate (dynamics parity).
    * CONTROLLER: the recorded control policy is NOT the optimum of its own
      OCP — it holds vx≈5 and cuts throttle while the objective tracks
      0.6·vref ≈ 13.5 m/s (IPOPT stalls on the nonsmooth lookup tables;
      README.md:92 documents the pathology). Matching it numerically would
      mean reproducing a failed solve, so the controller gates assert
      domination instead: our closed loop must achieve LOWER accumulated true
      OCP cost, MORE track progress, and SMALLER lateral deviation on the
      identical model + artifacts, while remaining feasible.
    """

    @pytest.fixture(scope="class")
    def recorded(self):
        ref_path = os.path.join(os.path.dirname(REF_DATA), "simulation_recorded_results.json")
        if not os.path.isfile(ref_path):
            pytest.skip("recorded reference trace not available")
        rec = json.load(open(ref_path))
        return np.asarray(rec["x"])[:, :, 0], np.asarray(rec["u"])[:, :, 0]

    def test_plant_parity_per_step(self, ref_model, recorded):
        xr, ur = recorded
        xs_next = jax.vmap(
            lambda x, u: ref_model.step(x, u, 0.1, substeps=8)
        )(jnp.asarray(xr[:-1]), jnp.asarray(ur[1:]))
        dev = np.abs(np.asarray(xs_next) - xr[1:])
        # measured max deviations (x64): s 1.6e-6, n/mu 7e-5, vx 9e-6,
        # vy 1.1e-3, r 1.0e-3, steer/throttle ~1e-16 (exact integrators)
        tol = np.array([1e-5, 3e-4, 3e-4, 1e-4, 4e-3, 4e-3, 1e-9, 1e-9])
        assert np.all(dev.max(axis=0) < tol), dev.max(axis=0)

    @pytest.fixture(scope="class")
    def our_trace(self, ref_model):
        p = OCPParams.reference(jnp.float64)
        cfg = SolverConfig.accurate(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        res = runner.closed_loop(ref_model, p, cfg, x0, 25)
        return p, res

    def _executed_cost(self, model, p, xs, us):
        """Accumulated true stage cost along an executed trajectory."""
        zs = jnp.concatenate([jnp.asarray(xs[:-1]), jnp.asarray(us[:-1])], axis=1)
        costs = jax.vmap(lambda z, u: solver_mod.stage_cost(model, p, z, u))(
            zs, jnp.asarray(us[1:])
        )
        return float(jnp.sum(costs))

    def test_beats_recorded_controls(self, ref_model, recorded, our_trace):
        xr, ur = recorded
        p, res = our_trace
        xs, us = np.asarray(res.xs), np.asarray(res.us)
        ours = self._executed_cost(ref_model, p, xs, us)
        ipopt = self._executed_cost(ref_model, p, xr, ur)
        # measured: ours 1554.7 vs IPOPT 1899.9 (−18%)
        assert ours < ipopt
        # more track progress in the same 2.5 s (measured 14.73 vs 12.46 m)
        assert xs[-1, 0] > xr[-1, 0]
        # tighter path tracking (measured max|n| 0.067 vs 0.173)
        assert np.abs(xs[:, 1]).max() < np.abs(xr[:, 1]).max()
        # while staying feasible
        assert float(np.max(np.asarray(res.violations))) < 1e-2

    def test_lateral_channels_agree(self, recorded, our_trace):
        """Both controllers follow the same racing line from the same start:
        the lateral/heading states must stay numerically close even though
        the velocity policies differ (measured max dev: n 0.12, mu 0.022,
        steer 0.035 over the 25 steps)."""
        xr, _ = recorded
        _, res = our_trace
        xs = np.asarray(res.xs)
        assert np.abs(xs[:, 1] - xr[:, 1]).max() < 0.15  # n [m]
        assert np.abs(xs[:, 2] - xr[:, 2]).max() < 0.05  # mu [rad]
        assert np.abs(xs[:, 6] - xr[:, 6]).max() < 0.06  # steer [rad]


@pytest.mark.slow
class TestHorizon20:
    def test_applied_trajectory_feasible(self, model):
        """The N=20 horizon class (BASELINE.md) with the horizon-scaled
        preset (two gentle AL rounds + 5 cm tightening): applied closed-loop
        states must respect the TRUE constraints to < 1e-2 even though the
        prediction tail may carry transient slack (measured 2.9e-3 over 150
        steps)."""
        import jax

        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = solver_mod.SolverConfig.for_horizon(20)
        assert cfg.al_iters >= 2  # feasibility needs the second AL round
        x0 = jnp.asarray(runner.X0_REFERENCE)
        sim = runner.closed_loop(model, p, cfg, x0, 20)
        xs, us = sim.xs, sim.us
        g = jax.vmap(
            lambda x, u: solver_mod.constraints(
                model, p, jnp.concatenate([x, jnp.zeros(2)]), u
            )
        )(xs[1:], us[1:])
        assert float(jnp.max(g)) < 1e-2
        assert float(xs[-1, 0]) > 10.0


@pytest.mark.slow
class TestFullLap:
    def test_completes_a_lap(self, model):
        """Closed loop must CROSS the start line (the reference never got
        near this — 'hours of runtime for seconds of sim').  950 steps at
        dt=0.1 on the shipped artifacts; progress strictly monotone, lap
        length covered, heading stays attached (no spin).

        Raw-vref gate at horizon 20: any horizon shorter than the plant's
        true braking distance is structurally blind to corner entries
        (docs/PERFORMANCE.md 'stability envelope'), so whether h10 survives
        the raw table is artifact-specific luck — the round-3 artifact
        refresh moved the ~560-600 m corner entry from marginal-pass to
        fail even in x64.  h20 (2 s lookahead) is the configuration the
        envelope analysis documents as robust; h10 is production-gated WITH
        the braking-curve preview in the test below."""
        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = SolverConfig.for_horizon(20)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        sim = runner.closed_loop_chunked(model, p, cfg, x0, 950, chunk=190)
        xs = np.asarray(sim.xs)
        s = xs[:, 0]
        assert np.all(np.diff(s) > 0)
        assert s[-1] > float(model.track.s_max)
        assert np.abs(xs[:, 2]).max() < 0.5  # never comes close to spinning

    def test_completes_a_lap_f32_h10_with_brake_preview(self, track, mx5):
        """The f32/h10 configuration is MARGINAL with the raw vref table
        (measured: the car loses it at the ~560 m corner entry — the 1 s
        lookahead cannot see the braking point; docs/PERFORMANCE.md
        'stability envelope').  With the braking-curve preview at the
        plant's true decel authority (a = C_m·T/m = 1.0 m/s²,
        reference src/mpc/model.py:160) the same configuration completes
        the lap robustly: peak-rate h10 f32 becomes production-usable.
        Uses the chunked driver (bit-identical to the single scan,
        TestChunkedClosedLoop) so compile time stays bounded."""
        import jax

        tr = mpc_track.with_brake_preview(track, 1.0, vref_scale=0.6)
        tr32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tr)
        model32 = BicycleModel(vehicle=mx5, track=tr32)
        p = OCPParams.reference(jnp.float32, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
        sim = runner.closed_loop_chunked(model32, p, cfg, x0, 950, chunk=190)
        xs = np.asarray(sim.xs)
        s = xs[:, 0]
        assert np.all(np.diff(s) > 0)
        assert s[-1] > float(model32.track.s_max)
        assert np.abs(xs[:, 2]).max() < 0.5  # never comes close to spinning
        assert np.abs(xs[:, 1]).max() < 1.0  # stays near the racing line


@pytest.mark.slow
class TestTwoLaps:
    def test_two_lap_endurance(self, track, mx5):
        """Multi-lap wrap semantics (VERDICT r2 weak #8): s crosses 2×s_max
        under warm starts, so every table lookup (mpc/track.py:52-53), the
        `-s ≤ 0` constraint row (mpc/solver.py:271) and the shifted
        warm-start multipliers are exercised through TWO start-line
        crossings.  f32 + brake preview (the production configuration), via
        the chunked driver."""
        tr = mpc_track.with_brake_preview(track, 1.0, vref_scale=0.6)
        tr32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tr)
        model32 = BicycleModel(vehicle=mx5, track=tr32)
        p = OCPParams.reference(jnp.float32, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
        sim = runner.closed_loop_chunked(model32, p, cfg, x0, 1900, chunk=190)
        xs = np.asarray(sim.xs)
        s = xs[:, 0]
        assert np.all(np.diff(s) > 0)
        assert s[-1] > 2.0 * float(model32.track.s_max)
        # the SECOND lap must be at least as clean as the first: no spin, on
        # the line, and lap time no worse than lap 1 + 2 s (the start is a
        # standing launch, so lap 2 should actually be faster)
        s_max = float(model32.track.s_max)
        cross1 = int(np.argmax(s > s_max))
        cross2 = int(np.argmax(s > 2.0 * s_max))
        assert 0 < cross1 < cross2
        assert (cross2 - cross1) <= cross1 + 20
        assert np.abs(xs[:, 2]).max() < 0.5
        assert np.abs(xs[:, 1]).max() < 1.0


@pytest.mark.slow
class TestSecondTrack:
    def test_closed_loop_on_clay(self, mx5):
        """The NMPC stack is not buckmore-specific: build tables from the
        shipped clay artifact set and run the closed loop (robustness gate;
        the reference only ever ran its MPC on buckmore)."""
        repo_data = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
        d = os.path.join(repo_data, "plots", "MX-5", "clay", "curvature")
        if not os.path.isdir(d):
            pytest.skip("shipped clay artifacts not available")
        clay = mpc_track.load("MX-5", "clay", "curvature", base_dir=repo_data)
        model = BicycleModel(vehicle=mx5, track=clay)
        p = OCPParams.reference(jnp.float64, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float64)
        sim = runner.closed_loop(model, p, cfg, x0, 60)
        xs, us = sim.xs, sim.us
        s = np.asarray(xs[:, 0])
        assert np.all(np.diff(s) > 0) and s[-1] > 30.0
        g = jax.vmap(
            lambda x, u: solver_mod.constraints(
                model, p, jnp.concatenate([x, jnp.zeros(2)]), u
            )
        )(xs[1:], us[1:])
        assert float(jnp.max(g)) < 1e-2


@pytest.mark.slow
class TestBatchedClosedLoop:
    def test_batch_equals_single(self, model):
        p = OCPParams.reference(jnp.float64)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE)
        single = runner.closed_loop(model, p, cfg, x0, 8)
        batch = runner.closed_loop_batch(model, p, cfg, jnp.stack([x0, x0]), 8)
        np.testing.assert_allclose(
            np.asarray(batch.xs[0]), np.asarray(single.xs), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(batch.xs[1]), np.asarray(batch.xs[0]), rtol=1e-12
        )


@pytest.mark.slow
class TestSecondLine:
    """NMPC on a GLOBAL racing line (VERDICT r2 missing #2): all closed-loop
    evidence elsewhere tracks the curvature line; the bayes line carries a
    faster vref profile, which stresses the brake preview and the tracking
    cost harder.  Artifacts ship with the repo (data/plots/MX-5/buckmore/
    bayesian), so `cli.mpc --bayes` and this gate run from a bare checkout."""

    def test_full_lap_on_bayes_line(self, mx5):
        if not os.path.isdir(os.path.join(REPO_DATA, "plots", "MX-5", "buckmore", "bayesian")):
            pytest.skip("shipped bayesian artifacts not available")
        tr = mpc_track.load("MX-5", "buckmore", "bayesian", base_dir=REPO_DATA)
        tr = mpc_track.with_brake_preview(tr, 1.0, vref_scale=0.6)
        tr32 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), tr)
        model32 = BicycleModel(vehicle=mx5, track=tr32)
        p = OCPParams.reference(jnp.float32, lateral_margin=0.05)
        cfg = SolverConfig(horizon=10)
        x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
        sim = runner.closed_loop_chunked(model32, p, cfg, x0, 950, chunk=190)
        xs = np.asarray(sim.xs)
        s = xs[:, 0]
        assert np.all(np.diff(s) > 0)
        assert s[-1] > float(model32.track.s_max)
        assert np.abs(xs[:, 2]).max() < 0.5  # no spin
        # the bayes line swings wider than the curvature line (|n| peaks at
        # ~1.13 m), so the binding invariant is the true track band, not a
        # fixed |n| proxy: left/right boundary distances must never be crossed
        nl = np.asarray(model32.track.dist_left(sim.xs[:, 0]))
        nr = np.asarray(model32.track.dist_right(sim.xs[:, 0]))
        n = xs[:, 1]
        assert np.all(n < nl + 1e-2) and np.all(-n < nr + 1e-2)
