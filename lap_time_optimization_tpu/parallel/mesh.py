"""Device-mesh scale-out for batched racing-line search.

The reference's only parallelism is a single-host `multiprocessing.Pool`
(src/trajectory.py:160-165, src/trajectory_bayesian_nonlinear.py:256-260).
The TPU-native replacement is a `jax.sharding.Mesh` with two axes:

* **dp** — the candidate batch axis: thousands of alpha vectors evaluated
  simultaneously, sharded across chips; XLA inserts the all-gather/reduce
  collectives for elite selection.
* **sp** — the spatial sample axis: per-candidate sample grids (curvature,
  velocity tables) sharded across the second mesh axis via sharding
  constraints.

The same `search_step` runs on 1 chip (mesh 1×1), one host's chips, or a
multi-host slice — the mesh shape is the only thing that changes
(`jax.distributed.initialize` + the same code path, per SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lap_time_optimization_tpu.ops import spline, velocity
from lap_time_optimization_tpu.track import Track


def make_mesh(n_devices: int | None = None, sp: int = 2) -> Mesh:
    """Build a ('dp', 'sp') mesh over the first n_devices devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    sp = sp if n % sp == 0 and n >= sp else 1
    arr = np.asarray(devs).reshape(n // sp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_lap_times(track: Track, vehicle, alphas_batch: jax.Array,
                    solver: str = "scan") -> jax.Array:
    """Lap time per candidate, with the sample axis sharding-hinted to 'sp'.

    `solver` picks the velocity-profile schedule (as in
    `global_search._batch_lap_times`): "scan" is the sequential oracle-exact
    3-pass (the sp-shardable multi-chip default); "assoc" the log-depth
    associative variant; "pallas" the fused dual-sweep kernel (TPU only,
    forward-only, single-chip) — the production single-chip search path.
    The scan program's ~860-step serial chain costs seconds of pure latency
    per round *independent of batch size* (measured: B=64 and B=16384 rounds
    both ~3-5 s), which is why the throughput anchor and the bayes proposals
    route through the kernel."""
    if solver == "pallas":
        from lap_time_optimization_tpu.ops import pallas_velocity

        try:
            am = jax.sharding.get_abstract_mesh()
            mesh_devices = int(np.prod([s for _, s in am.shape_tuple])) if am.shape_tuple else 1
        except Exception:
            mesh_devices = 1
        if mesh_devices > 1:
            # a pallas_call under pjit does not partition over the dp axis —
            # XLA would gather the batch onto one device, silently defeating
            # the mesh.  Multi-chip fan-out belongs in shard_map (see
            # sp_velocity) or per-shard single-chip searches; fail loudly.
            raise ValueError(
                "solver='pallas' is the single-chip production path; under a "
                f"{mesh_devices}-device mesh use solver='scan'/'assoc' (dp/sp "
                "shardable) or shard_map per-chip searches instead"
            )

        def geometry(alphas):
            sp_ = track.path_spline(alphas)
            s = jnp.linspace(0.0, sp_.length, track.ns)
            k = spline.curvature(sp_, s[:-1], signed=False)
            return s, k, sp_.length

        s_b, k_b, len_b = jax.vmap(geometry)(alphas_batch)
        v = pallas_velocity.solve_profile_batch(vehicle, s_b[:, :-1], k_b, len_b, track.closed)
        return jax.vmap(velocity.lap_time)(s_b, v)

    def one(alphas):
        sp_ = track.path_spline(alphas)
        s = jnp.linspace(0.0, sp_.length, track.ns)
        k = spline.curvature(sp_, s[:-1], signed=False)
        k = jax.lax.with_sharding_constraint(k, P("sp")) if _in_mesh() else k
        if solver == "assoc":
            v = velocity.solve_profile_parallel(vehicle, s[:-1], k, sp_.length, track.closed)
        else:
            v = velocity.solve_profile(vehicle, s[:-1], k, sp_.length, track.closed)
        return velocity.lap_time(s, v)

    return jax.vmap(one)(alphas_batch)


def _in_mesh() -> bool:
    """True when tracing under a mesh context (abstract mesh available)."""
    try:
        return jax.sharding.get_abstract_mesh().shape_tuple != ()
    except Exception:
        return False


@partial(jax.jit, static_argnames=("elite", "solver"), donate_argnums=(2,))
def search_step(track: Track, vehicle, alphas_batch: jax.Array, key: jax.Array,
                sigma: jax.Array, elite: int = 8, solver: str = "scan"):
    """One sharded evolution-strategy round over the candidate batch.

    Evaluate all candidates (dp-sharded), pick the elite set, and resample the
    batch as elite + Gaussian exploration.  This is the 'full training step'
    shape used for multi-chip validation: per-chip compute + cross-chip
    argmin/all-gather collectives every round.  `solver` as in
    `batch_lap_times` ("pallas" = single-chip production path).
    """
    B, d = alphas_batch.shape
    times = batch_lap_times(track, vehicle, alphas_batch, solver)
    order = jnp.argsort(times)
    elites = alphas_batch[order[:elite]]  # gathers across shards
    k1, k2 = jax.random.split(key)
    parents = elites[jax.random.randint(k1, (B,), 0, elite)]
    noise = jax.random.normal(k2, (B, d), alphas_batch.dtype) * sigma
    new_batch = jnp.clip(parents + noise, 0.0, 1.0)
    # keep the incumbent in slot 0 (elitism)
    new_batch = new_batch.at[0].set(elites[0])
    return new_batch, times[order[0]], elites[0]


def shard_batch(mesh: Mesh, alphas_batch: jax.Array) -> jax.Array:
    """Place a candidate batch dp-sharded on the mesh."""
    return jax.device_put(alphas_batch, NamedSharding(mesh, P("dp", None)))


def evolutionary_search(
    track: Track,
    vehicle,
    mesh: Mesh | None = None,
    batch: int = 512,
    rounds: int = 20,
    sigma: float = 0.08,
    elite: int = 8,
    seed: int = 0,
    solver: str = "scan",
):
    """Mesh-sharded global racing-line search (full-alpha parameterization).

    Returns (best_alphas, best_time_history).  On a 1-device mesh this is the
    single-chip batched search; on N devices the batch shards dp-wise.
    `solver` as in `batch_lap_times`.
    """
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    dtype = track.left.dtype
    alphas = jax.random.uniform(k0, (batch, track.size), dtype)
    best_hist = []
    best_alphas = None
    mesh = mesh or make_mesh()
    with jax.set_mesh(mesh):
        alphas = shard_batch(mesh, alphas)
        sig = jnp.asarray(sigma, dtype)
        for _ in range(rounds):
            key, kr = jax.random.split(key)
            alphas, t_best, a_best = search_step(track, vehicle, alphas, kr, sig,
                                                 elite=elite, solver=solver)
            best_hist.append(float(t_best))
            best_alphas = a_best
            sig = sig * 0.9
    return best_alphas, np.asarray(best_hist)
