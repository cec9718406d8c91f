"""Pallas TPU kernel: fused batched velocity-profile solve (both sweeps).

The batched racing-line search (nonlinear multi-start, Bayesian acquisition,
evolutionary rounds, sector sweeps) evaluates thousands of velocity profiles
per step.  The `lax.scan` formulation issues ~850 sequential HLO steps of tiny
vector ops per sweep; this kernel runs the whole 3-pass solve as ONE Pallas
program per batch group.

Design (round-3 rewrite; the round-2 kernel only tied the vmapped scan):

* **Native-tile batch layout.** Candidates are packed (N, G, 128) with G=8
  sublane groups, so every recurrence step is one (8, 128) VREG op — the
  round-2 kernel processed (1, 128) rows, wasting 7/8 of the VPU and running
  8× more grid programs at B=1024.
* **Both directional sweeps in one loop.** The acceleration and braking
  recurrences are independent chains, so one `fori_loop` step advances both —
  the second chain rides instruction-level parallelism inside the serial
  dependency chain instead of doubling wall time.
* **Two laps instead of per-candidate rolls.** The classic solver starts each
  sweep at the global minimum of the local limit, which costs an argmin plus
  per-row dynamic `jnp.roll` gathers in XLA — measured at 28.6 ms of the
  29 ms total at B=1024 (the kernel itself runs in 0.09 ms).  Instead the
  kernel sweeps the UNROLLED cyclic recurrence twice (2N steps): the update
  v⁺ = where(v_loc > v_prev, min(v_loc, reach(v_prev)), v_loc) is monotone in
  v_prev and exact at the global minimum regardless of the carry, so after
  the first pass crosses the minimum every second-pass value is exact
  (oracle-tested).  Output blocks are simply written on both passes; the
  second pass wins.
* **Sample-axis chunking over a sequential grid.** TPU grid steps execute in
  order, so the carry lives in VMEM scratch across chunks and VMEM holds only
  (rows × G × 128) blocks — N is unbounded.

The engine map (a ≤8-knot piecewise-linear curve, reference
src/vehicle.py:25-27) is evaluated gather-free as
f(v) = f₀ + Σᵢ slopeᵢ·clamp(v−vᵢ, 0, Δvᵢ), which matches `jnp.interp`'s
clamped extrapolation exactly.  Invalid steps (the seam link on open tracks)
are encoded as ds < 0 and restart the chain in-kernel, matching the
sequential semantics of `ops.velocity.solve_profile` (oracle-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lap_time_optimization_tpu.models.vehicle import GRAV, PacejkaVehicle, PointMassVehicle

MAX_ENGINE_KNOTS = 8
LANE = 128
SUBLANE_GROUPS = 8  # G: batch groups per block — one (8, 128) f32 VREG tile
ROW_CHUNK = 128  # sample rows per grid step (bounds VMEM, N can be anything)


def _fused_kernel(
    params_ref,  # SMEM (4,) packed scalars [mass, f_cap, eng_const, eng_quad]
    engine_ref,  # SMEM (4, MAX_ENGINE_KNOTS) rows: v_knots, slopes, widths, f0
    vloc_a_ref,  # VMEM (rows, G, LANE) local limit, forward order
    kprev_a_ref,  # VMEM (rows, G, LANE) curvature at the previous sample
    ds_a_ref,  # VMEM (rows, G, LANE); ds < 0 marks a chain restart (open seam)
    vloc_d_ref,  # VMEM (rows, G, LANE) same three streams in braking
    kprev_d_ref,  # (flipped) order
    ds_d_ref,
    out_a_ref,  # VMEM (rows, G, LANE) acc-limited profile
    out_d_ref,  # VMEM (rows, G, LANE) dec-limited profile (flipped order)
    carry_ref,  # VMEM scratch (2, G, LANE), persists across row chunks
    *,
    rows: int,
    rows_last: int,
    n_chunks: int,
    pacejka: bool,
):
    mass = params_ref[0]
    inv_mass = 1.0 / mass
    f_cap = params_ref[1]
    eng_const = params_ref[2]
    eng_quad = params_ref[3]

    ci = pl.program_id(1)  # 0 .. 2*n_chunks-1: two passes over the sample axis

    @pl.when(ci == 0)
    def _seed_carry():
        # any value ≥ the true profile works (monotone overestimate); the
        # local limit at the first sample is the natural choice
        carry_ref[0] = vloc_a_ref[0]
        carry_ref[1] = vloc_d_ref[0]

    def traction(v, k):
        f_lat = mass * v * v * k
        slack = f_cap * f_cap - f_lat * f_lat
        return jnp.where(slack > 0.0, jnp.sqrt(jnp.maximum(slack, 1e-12)), 0.0)

    def engine(v):
        if pacejka:
            return eng_const - eng_quad * v * v
        # unrolled piecewise-linear engine map; all table reads are scalar
        f = jnp.full_like(v, engine_ref[3, 0])
        for i in range(MAX_ENGINE_KNOTS - 1):
            f = f + engine_ref[1, i] * jnp.clip(
                v - engine_ref[0, i], 0.0, engine_ref[2, i]
            )
        return f

    def limit(v_prev, v_here, k_p, ds_j, accelerating):
        if accelerating:
            force = jnp.minimum(engine(v_prev), traction(v_prev, k_p))
        else:
            force = traction(v_prev, k_p)
        vlim = jnp.sqrt(v_prev * v_prev + 2.0 * force * inv_mass * jnp.maximum(ds_j, 0.0))
        valid = ds_j >= 0.0
        return jnp.where(valid & (v_here > v_prev), jnp.minimum(v_here, vlim), v_here)

    def body(j, carry):
        va, vd = carry
        va = limit(va, vloc_a_ref[j], kprev_a_ref[j], ds_a_ref[j], True)
        vd = limit(vd, vloc_d_ref[j], kprev_d_ref[j], ds_d_ref[j], False)
        out_a_ref[j] = va
        out_d_ref[j] = vd
        return va, vd

    is_last = (ci % n_chunks) == n_chunks - 1
    n_rows = jnp.where(is_last, rows_last, rows)
    va, vd = jax.lax.fori_loop(0, n_rows, body, (carry_ref[0], carry_ref[1]))
    carry_ref[0] = va
    carry_ref[1] = vd


def _pack_vehicle(vehicle, dtype):
    """(params, engine_table, pacejka_flag) for the kernel SMEM inputs."""
    if isinstance(vehicle, PacejkaVehicle):
        D = 0.5 * (vehicle.D_f + vehicle.D_r)
        f_cap = 2.0 * D * vehicle.mass * GRAV  # traction(lam=2.0), vehicleMX5.py:23-37
        params = jnp.stack(
            [vehicle.mass, f_cap, vehicle.T * vehicle.C_m - vehicle.Cr_0, vehicle.Cr_2]
        ).astype(dtype)
        engine = jnp.zeros((4, MAX_ENGINE_KNOTS), dtype)
        return params, engine, True
    if isinstance(vehicle, PointMassVehicle):
        f_cap = vehicle.friction_coef * vehicle.mass * GRAV
        params = jnp.stack(
            [vehicle.mass, f_cap, jnp.zeros_like(vehicle.mass), jnp.zeros_like(vehicle.mass)]
        ).astype(dtype)
        v = vehicle.engine_v
        f = vehicle.engine_f
        nk = v.shape[0]
        if nk > MAX_ENGINE_KNOTS:
            raise ValueError(f"engine map has {nk} knots > {MAX_ENGINE_KNOTS}")
        pad = MAX_ENGINE_KNOTS - nk
        dv = jnp.diff(v)
        slopes = jnp.diff(f) / dv
        v_knots = jnp.concatenate([v, jnp.full((pad,), v[-1] + 1e6, v.dtype)])
        slopes_p = jnp.concatenate([slopes, jnp.zeros((pad + 1,), v.dtype)])[: MAX_ENGINE_KNOTS]
        widths_p = jnp.concatenate([dv, jnp.zeros((pad + 1,), v.dtype)])[: MAX_ENGINE_KNOTS]
        f0_row = jnp.full((MAX_ENGINE_KNOTS,), f[0], v.dtype)
        engine = jnp.stack([v_knots, slopes_p, widths_p, f0_row]).astype(dtype)
        return params, engine, False
    raise TypeError(f"unsupported vehicle type {type(vehicle)}")


def _to_groups(x, groups_pad):
    """(B, N) → (N, groups, LANE)."""
    B, N = x.shape
    xp = jnp.pad(x, ((0, groups_pad * LANE - B), (0, 0)))
    return xp.reshape(groups_pad, LANE, N).transpose(2, 0, 1)


def _from_groups(x, B):
    """(N, groups, LANE) → (B, N)."""
    return x.transpose(1, 2, 0).reshape(-1, x.shape[0])[:B]


@functools.partial(jax.jit, static_argnames=("pacejka", "interpret"))
def _fused_solve(
    params: jax.Array,
    engine: jax.Array,
    vloc_a: jax.Array,  # (B, N) forward-order streams
    kprev_a: jax.Array,
    ds_a: jax.Array,
    vloc_d: jax.Array,  # (B, N) braking-order (flipped) streams
    kprev_d: jax.Array,
    ds_d: jax.Array,
    pacejka: bool,
    interpret: bool = False,
):
    """Both directional sweeps, fused, two laps each: (v_acc, v_dec_flipped)."""
    B, N = vloc_a.shape
    dtype = vloc_a.dtype
    groups = pl.cdiv(B, LANE)
    G = min(SUBLANE_GROUPS, groups)
    groups_pad = G * pl.cdiv(groups, G)
    rows = min(ROW_CHUNK, N)
    n_chunks = pl.cdiv(N, rows)
    rows_last = N - rows * (n_chunks - 1)

    streams = [
        _to_groups(x, groups_pad) for x in (vloc_a, kprev_a, ds_a, vloc_d, kprev_d, ds_d)
    ]

    kernel = functools.partial(
        _fused_kernel, rows=rows, rows_last=rows_last, n_chunks=n_chunks, pacejka=pacejka
    )
    stream_spec = pl.BlockSpec(
        # two passes over the sample axis: chunk index wraps at n_chunks
        (rows, G, LANE), lambda bi, ci, *_: (ci % n_chunks, bi, 0), memory_space=pltpu.VMEM
    )
    out_a, out_d = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, groups_pad, LANE), dtype),
            jax.ShapeDtypeStruct((N, groups_pad, LANE), dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            # batch groups outer, row chunks inner (sequential): the carry
            # scratch threads the recurrence across chunks and both passes
            grid=(groups_pad // G, 2 * n_chunks),
            in_specs=[stream_spec] * 6,
            out_specs=(stream_spec, stream_spec),
            scratch_shapes=[pltpu.VMEM((2, G, LANE), dtype)],
        ),
        interpret=interpret,
    )(params, engine, *streams)
    return _from_groups(out_a, B), _from_groups(out_d, B)


def solve_profile_batch(
    vehicle,
    s: jax.Array,  # (N,) shared sample grid (or (B, N) per-candidate)
    k_abs: jax.Array,  # (B, N) per-candidate |curvature|
    s_max,  # (B,) or scalar lap length(s)
    closed: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Batched 3-pass profile with a single fused Pallas program per batch group.

    Semantics match `ops.velocity.solve_profile` vmapped over candidates
    (oracle-tested).  All bookkeeping is elementwise or constant-shift —
    no argmin, no per-candidate gathers (see module docstring).
    """
    from lap_time_optimization_tpu.ops.velocity import local_limit

    B, N = k_abs.shape
    dtype = k_abs.dtype
    s = jnp.broadcast_to(jnp.asarray(s, dtype).reshape(-1, N), (B, N))
    s_max = jnp.broadcast_to(jnp.asarray(s_max, dtype), (B,))

    v_local = local_limit(vehicle, k_abs)
    params, engine, pacejka = _pack_vehicle(vehicle, dtype)
    neg = jnp.asarray(-1.0, dtype)

    ds_raw = s - jnp.roll(s, 1, axis=1)  # constant shift: cheap slices
    if closed:
        ds_a = jnp.mod(ds_raw, s_max[:, None])
    else:
        idx = jnp.arange(N)[None, :]
        ds_a = jnp.where(idx == 0, neg, ds_raw)  # seam restarts the chain
    kprev_a = jnp.roll(k_abs, 1, axis=1)

    sf = jnp.flip(s, axis=1)
    vloc_d = jnp.flip(v_local, axis=1)
    kprev_d = jnp.roll(jnp.flip(k_abs, axis=1), 1, axis=1)
    ds_raw_d = jnp.roll(sf, 1, axis=1) - sf
    if closed:
        ds_d = jnp.mod(ds_raw_d, s_max[:, None])
    else:
        idx = jnp.arange(N)[None, :]
        ds_d = jnp.where(idx == 0, neg, ds_raw_d)

    v_acc, v_dec_f = _fused_solve(
        params, engine, v_local, kprev_a, ds_a, vloc_d, kprev_d, ds_d, pacejka, interpret
    )
    return jnp.minimum(v_acc, jnp.flip(v_dec_f, axis=1))
