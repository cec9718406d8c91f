"""Quasi-static velocity-profile solver (3-pass) as differentiable JAX scans.

Capability-parity rebuild of the reference's `VelocityProfile`
(src/velocity.py:9-76), which runs two sequential Python loops over ~860
per-metre samples:

1. local lateral limit  v = sqrt(μ g / κ)                 (src/velocity.py:28-29)
2. forward pass from the globally slowest point, limiting acceleration by
   min(engine, traction)/m with v' = sqrt(v² + 2 a Δs)    (src/velocity.py:31-53)
3. an identical backward pass for braking                 (src/velocity.py:55-76)

final profile v = min(accel-limited, decel-limited)       (src/velocity.py:26)

Design notes (TPU-first):
* The passes are genuine first-order recurrences with state-dependent
  acceleration, expressed as `lax.scan`.  A single candidate is latency-bound,
  but the scan body is pure vector math, so `vmap` over a candidate batch turns
  every step into wide VPU ops — the batched search path (nonlinear/bayes/
  sector methods) runs thousands of profiles per scan sweep.
* Closed-lap wraparound is handled by rolling the sample axis so the scan
  starts at the argmin of the local limit (exactly the reference's roll/flip
  trick), with the wrap Δs taken modulo the lap length.
* Everything is differentiable: the saturated-traction branch uses NaN-safe
  double-where guards (in the vehicle models) and min/where subgradients, so
  `jax.grad` of lap time w.r.t. the alphas replaces the reference's
  finite-difference L-BFGS-B.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

GRAV = 9.81  # m s^-2


def local_limit(vehicle, k_abs: jax.Array) -> jax.Array:
    """Lateral-grip speed limit sqrt(μ g / κ) (src/velocity.py:28-29)."""
    k_safe = jnp.maximum(k_abs, 1e-12)
    return jnp.sqrt(vehicle.friction_coef * GRAV / k_safe)


def _directional_pass(vehicle, v_loc, k_prev, ds, valid, accelerating: bool):
    """One monotone sweep: limit v[j] by the reachable speed from v[j-1].

    All inputs are already rolled/flipped so the sweep is a plain left-to-right
    recurrence; `valid[j]` masks the wrap step on open tracks.
    """

    def step(v_prev, inp):
        v_here, k_p, ds_j, valid_j = inp
        if accelerating:
            force = jnp.minimum(vehicle.engine_force(v_prev), vehicle.traction(v_prev, k_p))
        else:
            force = vehicle.traction(v_prev, k_p)
        accel = force / vehicle.mass
        vlim = jnp.sqrt(v_prev * v_prev + 2.0 * accel * ds_j)
        v_new = jnp.where(valid_j & (v_here > v_prev), jnp.minimum(v_here, vlim), v_here)
        return v_new, v_new

    _, v_out = jax.lax.scan(step, v_loc[-1], (v_loc, k_prev, ds, valid))
    return v_out


@partial(jax.jit, static_argnames=("closed",))
def solve_profile(vehicle, s: jax.Array, k_abs: jax.Array, s_max, closed: bool = True):
    """Solve the 3-pass velocity profile.

    Args:
      vehicle: a vehicle pytree exposing `engine_force(v)` / `traction(v, k)`.
      s: (N,) sample distances, excluding the duplicated endpoint for closed
         laps (matching reference usage, src/trajectory.py:49-52).
      k_abs: (N,) absolute curvature at the samples.
      s_max: lap length for closed laps (ignored when closed=False).
      closed: static flag selecting wraparound semantics.

    Returns: (N,) velocity profile v = min(v_acc, v_dec).
    """
    s = jnp.asarray(s)
    k_abs = jnp.asarray(k_abs)
    n = s.shape[0]
    v_local = local_limit(vehicle, k_abs)
    i0 = jnp.argmin(v_local)
    idx = jnp.arange(n)

    sr = jnp.roll(s, -i0)
    kr = jnp.roll(k_abs, -i0)
    vr = jnp.roll(v_local, -i0)

    # ---- forward (acceleration) pass
    ds_raw = sr - jnp.roll(sr, 1)
    if closed:
        ds_fwd = jnp.mod(ds_raw, s_max)
        valid_fwd = jnp.ones((n,), dtype=bool)
    else:
        ds_fwd = ds_raw
        valid_fwd = idx != jnp.mod(-i0, n)
    v_acc = _directional_pass(vehicle, vr, jnp.roll(kr, 1), ds_fwd, valid_fwd, accelerating=True)
    v_acc = jnp.roll(v_acc, i0)

    # ---- backward (braking) pass: flip, sweep, unflip
    sf = jnp.flip(sr)
    kf = jnp.flip(kr)
    vf = jnp.flip(vr)
    ds_raw_b = jnp.roll(sf, 1) - sf
    if closed:
        ds_bwd = jnp.mod(ds_raw_b, s_max)
        valid_bwd = jnp.ones((n,), dtype=bool)
    else:
        ds_bwd = ds_raw_b
        valid_bwd = idx != i0
    v_dec = _directional_pass(vehicle, vf, jnp.roll(kf, 1), ds_bwd, valid_bwd, accelerating=False)
    v_dec = jnp.roll(jnp.flip(v_dec), i0)

    return jnp.minimum(v_acc, v_dec)


def lap_time(s: jax.Array, v: jax.Array) -> jax.Array:
    """Lap time Σ Δs / v with s (ns,) samples and v (ns-1,) profile
    (reference src/trajectory.py:54-58)."""
    return jnp.sum(jnp.diff(s) / v)
