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
from lap_time_optimization_tpu.ops.velocity import local_limit
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
            # batched forward-only eval: tridiag moment solve (1.6-1.8x,
            # spline.FIT_METHOD_CLOSED* docstring)
            sp_ = track.path_spline(alphas, spline.FIT_METHOD_CLOSED_BATCHED)
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


# ------------------------------------------------------------- 2-axis dp × sp
def _run_pass_local(vehicle, v_loc, k_prev, ds, chain_ok, valid0, accelerating,
                    n, pad, n_sp, sweeps, axis):
    """One directional profile pass INSIDE a (dp, sp) shard_map: the full
    sample arrays arrive replicated over `axis`; each device slices its own
    contiguous block and runs the sp_velocity block sweeps (ppermute halo +
    all_gather summaries), then the blocks are re-gathered."""
    from lap_time_optimization_tpu.parallel.sp_velocity import _BIG, _block_sweep

    dtype = v_loc.dtype
    v_loc = jnp.concatenate([v_loc, jnp.full((pad,), jnp.sqrt(_BIG), dtype)])
    k_prev = jnp.concatenate([k_prev, jnp.zeros((pad,), dtype)])
    ds = jnp.concatenate([ds, jnp.zeros((pad,), dtype)])
    chain_ok = jnp.concatenate([chain_ok, jnp.ones((pad,), dtype)])
    e_full = v_loc * v_loc
    blk = (n + pad) // n_sp
    j = jax.lax.axis_index(axis)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, j * blk, blk)
    e_loc_l, k_l, ds_l, m_l = sl(e_full), sl(k_prev), sl(ds), sl(chain_ok)

    def body(e, _):
        return (
            _block_sweep(vehicle, e, e_loc_l, k_l, ds_l, m_l, valid0,
                         accelerating, axis),
            None,
        )

    e, _ = jax.lax.scan(body, e_loc_l, None, length=sweeps)
    e_out = jax.lax.all_gather(e, axis, tiled=True)  # (n_pad,)
    return jnp.sqrt(e_out[:n])


def _profile_sp_local(vehicle, s, k_abs, s_max, closed, n_sp, sweeps, axis="sp"):
    """`sp_velocity.solve_profile_sp` semantics, callable INSIDE an existing
    shard_map (per candidate, under vmap): same roll-to-minimum, transparent
    padding, and two directional sweep passes — but the shard_map is the
    caller's, so the sample axis is genuinely sharded over `axis` while the
    candidate axis shards over 'dp'."""
    n = s.shape[0]
    n_pad = -(-n // n_sp) * n_sp
    pad = n_pad - n
    v_local = local_limit(vehicle, k_abs)
    i0 = jnp.argmin(v_local)
    idx = jnp.arange(n)
    sr = jnp.roll(s, -i0)
    kr = jnp.roll(k_abs, -i0)
    vr = jnp.roll(v_local, -i0)
    dtype = s.dtype
    ds_raw = sr - jnp.roll(sr, 1)
    if closed:
        ds_f = jnp.mod(ds_raw, s_max)
        mask_f = jnp.ones((n,), dtype)
        valid0 = jnp.asarray(False)
    else:
        wrap = jnp.mod(-i0, n)
        ds_f = ds_raw
        mask_f = (idx != wrap).astype(dtype)
        valid0 = jnp.asarray(False)
    v_acc = _run_pass_local(vehicle, vr, jnp.roll(kr, 1), ds_f, mask_f, valid0,
                            True, n, pad, n_sp, sweeps, axis)
    v_acc = jnp.roll(v_acc, i0)
    sf, kf, vf = jnp.flip(sr), jnp.flip(kr), jnp.flip(vr)
    ds_raw_b = jnp.roll(sf, 1) - sf
    if closed:
        ds_b = jnp.mod(ds_raw_b, s_max)
        mask_b = jnp.ones((n,), dtype)
        valid0_b = jnp.asarray(True)
    else:
        ds_b = ds_raw_b
        mask_b = (idx != i0).astype(dtype)
        valid0_b = i0 != 0
    v_dec = _run_pass_local(vehicle, vf, jnp.roll(kf, 1), ds_b, mask_b,
                            valid0_b, False, n, pad, n_sp, sweeps, axis)
    v_dec = jnp.roll(jnp.flip(v_dec), i0)
    return jnp.minimum(v_acc, v_dec)


@partial(jax.jit, static_argnames=("mesh", "elite", "sweeps"))
def search_step_dp_sp(track: Track, vehicle, alphas_batch: jax.Array,
                      key: jax.Array, sigma: jax.Array, mesh: Mesh,
                      elite: int = 8, sweeps: int = 24):
    """One evolution-strategy round sharded over BOTH mesh axes at once
    (VERDICT r4 item 8): the candidate batch splits over 'dp' AND each
    candidate's velocity-profile sample axis is genuinely block-sharded over
    'sp' (the sp_velocity ppermute/all_gather block-scan — not a sharding
    hint), in ONE shard_map over the full (dp, sp) mesh.

    Semantics match `search_step(..., solver="scan")` on one device up to the
    sp sweep count's fixpoint tolerance (rtol ~1e-9 at sweeps=24, the
    TestSequenceParallelVelocity bound); same RNG stream, same elitism
    (parity-gated on the virtual 4×2 mesh, tests/test_parallel.py)."""
    B, d = alphas_batch.shape
    n_dp, n_sp = mesh.shape["dp"], mesh.shape["sp"]
    if B % n_dp:
        raise ValueError(f"batch {B} must divide the dp axis {n_dp}")

    def kernel(tr, veh, alphas_loc, key_, sigma_):
        def eval_one(a):
            sp_ = tr.path_spline(a)
            s = jnp.linspace(0.0, sp_.length, tr.ns)
            k = spline.curvature(sp_, s[:-1], signed=False)
            v = _profile_sp_local(veh, s[:-1], k, sp_.length, tr.closed,
                                  n_sp, sweeps)
            return velocity.lap_time(s, v)

        times_loc = jax.vmap(eval_one)(alphas_loc)  # (B/n_dp,)
        times = jax.lax.all_gather(times_loc, "dp", tiled=True)  # (B,)
        alphas_all = jax.lax.all_gather(alphas_loc, "dp", tiled=True)  # (B, d)
        order = jnp.argsort(times)
        elites = alphas_all[order[:elite]]
        k1, k2 = jax.random.split(key_)
        parents = elites[jax.random.randint(k1, (B,), 0, elite)]
        noise = jax.random.normal(k2, (B, d), alphas_loc.dtype) * sigma_
        new_batch = jnp.clip(parents + noise, 0.0, 1.0)
        new_batch = new_batch.at[0].set(elites[0])  # elitism, as search_step
        i = jax.lax.axis_index("dp")
        nb_loc = jax.lax.dynamic_slice_in_dim(new_batch, i * (B // n_dp), B // n_dp)
        return nb_loc, times[order[0]], elites[0]

    fn = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P("dp", None), P(), P()),
        out_specs=(P("dp", None), P(), P()),
        check_vma=False,
    )
    return fn(track, vehicle, alphas_batch, key, sigma)
