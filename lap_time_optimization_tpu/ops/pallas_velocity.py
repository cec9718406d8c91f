"""Pallas TPU kernel: fused batched velocity-profile sweeps.

The batched racing-line search (nonlinear multi-start, Bayesian acquisition,
evolutionary rounds, sector sweeps) evaluates thousands of velocity profiles
per step.  The `lax.scan` formulation issues ~850 sequential HLO steps of tiny
vector ops per sweep; this kernel fuses an entire directional sweep into ONE
Pallas program: all (N, B) arrays live in VMEM, the recurrence runs in a
`fori_loop` over rows, and the per-step physics (engine map, traction law,
reachable-speed limit) is pure VPU math with no per-op dispatch overhead.

Layout: arrays are (N, B_tile) with the candidate batch on the 128-lane axis —
each recurrence step reads/writes one contiguous row.  The grid tiles the
batch axis so arbitrary B fits VMEM.

The engine map (a ≤8-knot piecewise-linear curve, reference
src/vehicle.py:25-27) is evaluated gather-free as
f(v) = f₀ + Σᵢ slopeᵢ·clamp(v−vᵢ, 0, Δvᵢ), which matches `jnp.interp`'s
clamped extrapolation exactly.  Invalid steps (the wrap link on open tracks)
are encoded as ds < 0 and skipped in-kernel, matching the sequential
semantics of `ops.velocity.solve_profile`.
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


def _sweep_kernel(
    params_ref,  # SMEM (4,) packed scalars [mass, f_cap, eng_const, eng_quad]
    engine_ref,  # SMEM (4, MAX_ENGINE_KNOTS) rows: v_knots, slopes, widths, f0
    vloc_ref,  # VMEM (N, Bt)
    kprev_ref,  # VMEM (N, Bt)
    ds_ref,  # VMEM (N, Bt); ds < 0 marks a skipped (invalid) step
    out_ref,  # VMEM (N, Bt)
    *,
    n_steps: int,
    accelerating: bool,
    pacejka: bool,
):
    mass = params_ref[0]
    inv_mass = 1.0 / mass
    f_cap = params_ref[1]
    eng_const = params_ref[2]
    eng_quad = params_ref[3]

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

    def body(j, v_prev):
        v_here = vloc_ref[j, :]
        k_p = kprev_ref[j, :]
        ds_j = ds_ref[j, :]
        if accelerating:
            force = jnp.minimum(engine(v_prev), traction(v_prev, k_p))
        else:
            force = traction(v_prev, k_p)
        vlim = jnp.sqrt(v_prev * v_prev + 2.0 * force * inv_mass * jnp.maximum(ds_j, 0.0))
        valid = ds_j >= 0.0
        v_new = jnp.where(valid & (v_here > v_prev), jnp.minimum(v_here, vlim), v_here)
        out_ref[j, :] = v_new
        return v_new

    v0 = vloc_ref[n_steps - 1, :]
    jax.lax.fori_loop(0, n_steps, body, v0)


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


@functools.partial(jax.jit, static_argnames=("accelerating", "pacejka", "interpret"))
def directional_sweep(
    params: jax.Array,
    engine: jax.Array,
    v_loc: jax.Array,  # (B, N)
    k_prev: jax.Array,
    ds: jax.Array,
    accelerating: bool,
    pacejka: bool,
    interpret: bool = False,
) -> jax.Array:
    """One fused directional pass over a candidate batch: (B, N) → (B, N)."""
    B, N = v_loc.shape
    bt = min(LANE, B)
    grid = (pl.cdiv(B, bt),)

    kernel = functools.partial(
        _sweep_kernel, n_steps=N, accelerating=accelerating, pacejka=pacejka
    )
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, B), v_loc.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, bt), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, bt), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, bt), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, bt), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(params, engine, v_loc.T, k_prev.T, ds.T)
    return out_t.T


def solve_profile_batch(
    vehicle,
    s: jax.Array,  # (N,) shared sample grid (or (B, N) per-candidate)
    k_abs: jax.Array,  # (B, N) per-candidate |curvature|
    s_max,  # (B,) or scalar lap length(s)
    closed: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Batched 3-pass profile with Pallas-fused directional sweeps.

    Semantics match `ops.velocity.solve_profile` vmapped over candidates
    (oracle-tested); the roll/flip bookkeeping stays in XLA (cheap gathers),
    while the sequential sweeps run as two Pallas kernels.
    """
    from lap_time_optimization_tpu.ops.velocity import local_limit

    B, N = k_abs.shape
    dtype = k_abs.dtype
    s = jnp.broadcast_to(jnp.asarray(s, dtype).reshape(-1, N), (B, N))
    s_max = jnp.broadcast_to(jnp.asarray(s_max, dtype), (B,))

    v_local = local_limit(vehicle, k_abs)
    i0 = jnp.argmin(v_local, axis=1)  # (B,)

    def roll_rows(x, shift):
        return jax.vmap(lambda row, sh: jnp.roll(row, sh))(x, shift)

    sr = roll_rows(s, -i0)
    kr = roll_rows(k_abs, -i0)
    vr = roll_rows(v_local, -i0)

    params, engine, pacejka = _pack_vehicle(vehicle, dtype)
    neg = jnp.asarray(-1.0, dtype)

    ds_f = jnp.mod(sr - jnp.roll(sr, 1, axis=1), s_max[:, None])
    if not closed:
        idx = jnp.arange(N)[None, :]
        wrap = jnp.mod(-i0, N)[:, None]
        ds_f = jnp.where(idx == wrap, neg, sr - jnp.roll(sr, 1, axis=1))
    v_acc = directional_sweep(
        params, engine, vr, jnp.roll(kr, 1, axis=1), ds_f, True, pacejka, interpret
    )
    v_acc = roll_rows(v_acc, i0)

    sf = jnp.flip(sr, axis=1)
    kf = jnp.flip(kr, axis=1)
    vf = jnp.flip(vr, axis=1)
    ds_b = jnp.mod(jnp.roll(sf, 1, axis=1) - sf, s_max[:, None])
    if not closed:
        idx = jnp.arange(N)[None, :]
        ds_b = jnp.where(idx == i0[:, None], neg, jnp.roll(sf, 1, axis=1) - sf)
    v_dec = directional_sweep(
        params, engine, vf, jnp.roll(kf, 1, axis=1), ds_b, False, pacejka, interpret
    )
    v_dec = roll_rows(jnp.flip(v_dec, axis=1), i0)

    return jnp.minimum(v_acc, v_dec)
