"""Pallas batched velocity kernel vs the sequential solver (interpret mode on
CPU; the compiled path is exercised on real TPU by bench/perf scripts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lap_time_optimization_tpu.ops import pallas_velocity, spline, velocity


@pytest.fixture(scope="module")
def samples(buckmore):
    sp = buckmore.mid_spline()
    s = np.linspace(0.0, float(sp.length), buckmore.ns)[:-1]
    k = np.asarray(spline.curvature(sp, jnp.asarray(s), signed=False))
    return s, k, float(sp.length)


@pytest.fixture(scope="module")
def k_batch(samples, rng):
    _, k, _ = samples
    return jnp.asarray(np.stack([k * f for f in rng.uniform(0.8, 1.2, 6)]))


class TestPallasBatchProfile:
    @pytest.mark.parametrize("veh_name", ["tbr18", "mx5"])
    def test_closed_matches_sequential(self, veh_name, samples, k_batch, request):
        veh = request.getfixturevalue(veh_name)
        s, _, s_max = samples
        ref = np.stack(
            [
                np.asarray(velocity.solve_profile(veh, jnp.asarray(s), k_batch[i], s_max, closed=True))
                for i in range(k_batch.shape[0])
            ]
        )
        got = np.asarray(
            pallas_velocity.solve_profile_batch(
                veh, jnp.asarray(s), k_batch, s_max, closed=True, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_open_matches_sequential(self, tbr18, samples, k_batch):
        s, _, s_max = samples
        kb = k_batch[:, :300]
        ref = np.stack(
            [
                np.asarray(velocity.solve_profile(tbr18, jnp.asarray(s[:300]), kb[i], None, closed=False))
                for i in range(kb.shape[0])
            ]
        )
        got = np.asarray(
            pallas_velocity.solve_profile_batch(
                tbr18, jnp.asarray(s[:300]), kb, s_max, closed=False, interpret=True
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_large_batch_tiles(self, tbr18, samples):
        """Batch > one lane tile exercises the grid dimension."""
        s, k, s_max = samples
        B = 160  # > LANE=128 → 2 grid tiles
        kb = jnp.asarray(np.stack([k] * B))
        got = np.asarray(
            pallas_velocity.solve_profile_batch(
                tbr18, jnp.asarray(s), kb, s_max, closed=True, interpret=True
            )
        )
        ref = np.asarray(velocity.solve_profile(tbr18, jnp.asarray(s), jnp.asarray(k), s_max, closed=True))
        np.testing.assert_allclose(got, np.stack([ref] * B), rtol=1e-12)
