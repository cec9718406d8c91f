"""Augmented-Lagrangian iLQR: the jitted NLP engine replacing do_mpc/IPOPT.

The reference transcribes the horizon-10 NMPC into a CasADi NLP and calls
IPOPT through `mpc.make_step` every 0.1 s of simulated time — hours of wall
clock for seconds of sim (reference README.md:92, src/mpc/controller.py:8-34).
This module solves the same OCP as a fixed-iteration AL-iLQR whose entire
solve — rollout, linearization (jacfwd), cost quadraticization, Riccati
backward pass, batched-line-search forward pass, multiplier updates — is one
XLA program.  A closed-loop step is then solver + plant fused into a single
device computation, and the full 500-step simulation is a `lax.scan` over it.

Structure (ALTRO-style):
* state is augmented with the previous input, z = [x (8), u_prev (2)], so
  do_mpc's Δu "rterm" penalty (src/mpc/controller.py:40-41) is Markovian;
* all inequality constraints (lateral band, state boxes, input boxes —
  src/mpc/controller.py:57-103) are handled by one PHR augmented Lagrangian:
    φ(g, λ, ρ) = 1/(2ρ)·(max(0, λ + ρ g)² − λ²)
* the backward pass runs on tiny (10×10) matrices via `lax.scan` with
  Levenberg regularization; the forward pass evaluates a whole ladder of line
  search step sizes as a vmapped batch of rollouts and keeps the best.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lap_time_optimization_tpu.models.bicycle import (
    IDX_DELTA,
    IDX_MU,
    IDX_N,
    IDX_S,
    IDX_THROTTLE,
    IDX_VX,
    IDX_VY,
    NU,
    NX,
    BicycleModel,
)

NZ = NX + NU  # augmented state: model state + previous input
N_CON = 14  # inequality constraints per stage (see `constraints`)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OCPParams:
    """Weights and limits, defaults = reference values
    (src/mpc/controller.py:9,24-31,79-103)."""

    q_n: jax.Array
    q_mu: jax.Array
    q_B: jax.Array
    r_delta: jax.Array
    r_throttle: jax.Array
    vref_scale: jax.Array  # the 0.6 in (vx − 0.6 vref)², controller.py:53
    mu_max: jax.Array
    steer_max: jax.Array
    throttle_max: jax.Array
    dsteer_max: jax.Array
    dthrottle_max: jax.Array

    @classmethod
    def reference(cls, dtype=jnp.float32) -> "OCPParams":
        a = lambda v: jnp.asarray(v, dtype)
        return cls(
            q_n=a(0.5),
            q_mu=a(3.0),
            q_B=a(1e-2),
            r_delta=a(1e-2),
            r_throttle=a(1e-2),
            vref_scale=a(0.6),
            mu_max=a(jnp.pi * 0.5),
            steer_max=a(jnp.pi / 4),
            throttle_max=a(1.0),
            dsteer_max=a(jnp.pi / 2),
            dthrottle_max=a(1.0),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolverConfig:
    # Defaults tuned for warm-started closed-loop control at real-time rates
    # (≥50 Hz on one TPU v5e chip); for offline open-loop solves of maximum
    # accuracy use al_iters=4, ilqr_iters=8, n_linesearch=8, substeps=4.
    horizon: int = dataclasses.field(metadata=dict(static=True), default=10)
    dt: float = dataclasses.field(metadata=dict(static=True), default=0.1)
    substeps: int = dataclasses.field(metadata=dict(static=True), default=2)
    al_iters: int = dataclasses.field(metadata=dict(static=True), default=2)
    ilqr_iters: int = dataclasses.field(metadata=dict(static=True), default=5)
    n_linesearch: int = dataclasses.field(metadata=dict(static=True), default=6)
    rho_init: float = dataclasses.field(metadata=dict(static=True), default=20.0)
    rho_scale: float = dataclasses.field(metadata=dict(static=True), default=5.0)
    reg_init: float = dataclasses.field(metadata=dict(static=True), default=1e-6)
    # XLA unroll factors for the short sequential scans.  The solve is
    # latency-bound (tiny 10×10 matrix ops, ~N sequential steps per pass);
    # unrolling lets XLA fuse across loop iterations and removes per-step
    # loop overhead.  1 = plain scan (smallest program, slowest dispatch).
    unroll_horizon: int = dataclasses.field(metadata=dict(static=True), default=1)
    unroll_ilqr: int = dataclasses.field(metadata=dict(static=True), default=1)

    @classmethod
    def accurate(cls, horizon: int = 10, dt: float = 0.1) -> "SolverConfig":
        """High-accuracy preset for offline solves and correctness tests."""
        return cls(
            horizon=horizon, dt=dt, substeps=4,
            al_iters=4, ilqr_iters=8, n_linesearch=8,
            rho_init=10.0, rho_scale=5.0,
        )

    @classmethod
    def for_horizon(cls, horizon: int, dt: float = 0.1) -> "SolverConfig":
        """Real-time preset scaled to the horizon.  Long horizons run ONE
        stiff AL round per control cycle (ρ=200) with more iLQR iterations:
        in receding horizon the shifted multipliers keep converging across
        cycles, so per-solve multiplier updates can be minimal (validated:
        h20 applied-trajectory violation < 0.03 over 150 closed-loop steps
        at half the iteration budget of a 2-round schedule)."""
        if horizon <= 12:
            return cls(horizon=horizon, dt=dt)
        return cls(
            horizon=horizon, dt=dt, substeps=2,
            al_iters=1, ilqr_iters=8, n_linesearch=6, rho_init=200.0,
        )


class SolveResult(NamedTuple):
    us: jax.Array  # (N, NU) optimized inputs
    zs: jax.Array  # (N+1, NZ) optimized augmented trajectory
    lam: jax.Array  # (N+1, N_CON) multipliers (terminal row uses state cons)
    cost: jax.Array  # scalar AL-free cost
    max_violation: jax.Array  # scalar max constraint violation


# --------------------------------------------------------------------- pieces
def dynamics_step(model: BicycleModel, cfg: SolverConfig, z: jax.Array, u: jax.Array) -> jax.Array:
    """Augmented discrete dynamics: RK4 model step + u_prev := u."""
    x_next = model.step(z[:NX], u, cfg.dt, substeps=cfg.substeps)
    return jnp.concatenate([x_next, u])


def stage_cost(model: BicycleModel, p: OCPParams, z: jax.Array, u: jax.Array) -> jax.Array:
    """lterm + Δu rterm (reference src/mpc/controller.py:36-55)."""
    x = z[:NX]
    u_prev = z[NX:]
    vref = model.track.v_ref(x[IDX_S])
    mterm = p.q_n * x[IDX_N] ** 2 + p.q_mu * x[IDX_MU] ** 2 + x[IDX_VY] ** 2
    lterm = (
        mterm
        + (x[IDX_VX] - p.vref_scale * vref) ** 2
        + model.beta_cost(x, p.q_B)
    )
    du = u - u_prev
    rterm = p.r_delta * du[0] ** 2 + p.r_throttle * du[1] ** 2
    return lterm + rterm


def terminal_cost(model: BicycleModel, p: OCPParams, z: jax.Array) -> jax.Array:
    """mterm (reference src/mpc/controller.py:52)."""
    x = z[:NX]
    return p.q_n * x[IDX_N] ** 2 + p.q_mu * x[IDX_MU] ** 2 + x[IDX_VY] ** 2


def constraints(model: BicycleModel, p: OCPParams, z: jax.Array, u: jax.Array) -> jax.Array:
    """All stage inequalities g ≤ 0 (reference src/mpc/controller.py:57-103)."""
    x = z[:NX]
    left, right = model.lateral_constraints(x[IDX_S], x[IDX_N], x[IDX_MU])
    return jnp.stack(
        [
            left,
            right,
            -x[IDX_S],  # s ≥ 0
            x[IDX_MU] - p.mu_max,
            -x[IDX_MU] - p.mu_max,
            -x[IDX_VX],  # vx ≥ 0
            x[IDX_DELTA] - p.steer_max,
            -x[IDX_DELTA] - p.steer_max,
            x[IDX_THROTTLE] - p.throttle_max,
            -x[IDX_THROTTLE] - p.throttle_max,
            u[0] - p.dsteer_max,
            -u[0] - p.dsteer_max,
            u[1] - p.dthrottle_max,
            -u[1] - p.dthrottle_max,
        ]
    )


def _al_penalty(g: jax.Array, lam: jax.Array, rho) -> jax.Array:
    """PHR augmented-Lagrangian term for g ≤ 0."""
    shifted = jnp.maximum(0.0, lam + rho * g)
    return jnp.sum((shifted**2 - lam**2) / (2.0 * rho))


def al_stage_cost(model, p, z, u, lam, rho):
    return stage_cost(model, p, z, u) + _al_penalty(constraints(model, p, z, u), lam, rho)


def al_terminal_cost(model, p, z, lam, rho):
    # terminal constraints: state rows only (inputs don't exist at stage N);
    # reuse the stage constraint vector with u = 0 and mask the input rows.
    g = constraints(model, p, z, jnp.zeros((NU,), z.dtype))
    mask = jnp.arange(N_CON) < 10
    g = jnp.where(mask, g, -1.0)
    return terminal_cost(model, p, z) + _al_penalty(g, lam, rho)


# ---------------------------------------------------------------------- solver
def _rollout(model, cfg, z0, us):
    def f(z, u):
        z_next = dynamics_step(model, cfg, z, u)
        return z_next, z_next

    _, zs = jax.lax.scan(f, z0, us, unroll=cfg.unroll_horizon)
    return jnp.concatenate([z0[None], zs], axis=0)


def _total_al_cost(model, p, cfg, zs, us, lams, rho):
    stage = jax.vmap(lambda z, u, l: al_stage_cost(model, p, z, u, l, rho))(
        zs[:-1], us, lams[:-1]
    )
    return jnp.sum(stage) + al_terminal_cost(model, p, zs[-1], lams[-1], rho)


def _true_cost(model, p, zs, us):
    stage = jax.vmap(lambda z, u: stage_cost(model, p, z, u))(zs[:-1], us)
    return jnp.sum(stage) + terminal_cost(model, p, zs[-1])


def _max_violation(model, p, zs, us):
    g = jax.vmap(lambda z, u: constraints(model, p, z, u))(zs[:-1], us)
    g_term = constraints(model, p, zs[-1], jnp.zeros((NU,), zs.dtype))[:10]
    return jnp.maximum(jnp.max(g), jnp.max(g_term))


def _backward_pass(model, p, cfg, zs, us, lams, rho, reg):
    """Riccati sweep on the AL cost; returns feedforward k and feedback K."""
    # linearize dynamics and quadraticize cost along the trajectory (vmapped)
    A = jax.vmap(lambda z, u: jax.jacfwd(lambda zz: dynamics_step(model, cfg, zz, u))(z))(
        zs[:-1], us
    )
    B = jax.vmap(lambda z, u: jax.jacfwd(lambda uu: dynamics_step(model, cfg, z, uu))(u))(
        zs[:-1], us
    )

    def quads(z, u, lam):
        c = lambda zz, uu: al_stage_cost(model, p, zz, uu, lam, rho)
        lz = jax.grad(c, argnums=0)(z, u)
        lu = jax.grad(c, argnums=1)(z, u)
        lzz = jax.hessian(c, argnums=0)(z, u)
        luu = jax.hessian(c, argnums=1)(z, u)
        luz = jax.jacfwd(jax.grad(c, argnums=1), argnums=0)(z, u)
        return lz, lu, lzz, luu, luz

    lz, lu, lzz, luu, luz = jax.vmap(quads)(zs[:-1], us, lams[:-1])

    tc = lambda zz: al_terminal_cost(model, p, zz, lams[-1], rho)
    Vz = jax.grad(tc)(zs[-1])
    Vzz = jax.hessian(tc)(zs[-1])

    I_u = jnp.eye(NU, dtype=zs.dtype)

    def bwd(carry, inp):
        Vz, Vzz, diverged = carry
        A_k, B_k, lz_k, lu_k, lzz_k, luu_k, luz_k = inp
        Qz = lz_k + A_k.T @ Vz
        Qu = lu_k + B_k.T @ Vz
        Qzz = lzz_k + A_k.T @ Vzz @ A_k
        Quu = luu_k + B_k.T @ Vzz @ B_k
        Quz = luz_k + B_k.T @ Vzz @ A_k
        Quu_reg = Quu + reg * I_u
        # NU=2: invert the control Hessian in closed form (det/adjugate) —
        # avoids a tiny LU per stage inside the sequential scan
        a, b = Quu_reg[0, 0], Quu_reg[0, 1]
        c, d = Quu_reg[1, 0], Quu_reg[1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) / det
        rhs = jnp.concatenate([Qu[:, None], Quz], axis=1)
        kK = inv @ rhs
        k_k = -kK[:, 0]
        K_k = -kK[:, 1:]
        Vz_new = Qz + K_k.T @ Quu @ k_k + K_k.T @ Qu + Quz.T @ k_k
        Vzz_new = Qzz + K_k.T @ Quu @ K_k + K_k.T @ Quz + Quz.T @ K_k
        Vzz_new = 0.5 * (Vzz_new + Vzz_new.T)
        bad = ~jnp.all(jnp.isfinite(k_k))
        return (Vz_new, Vzz_new, diverged | bad), (k_k, K_k)

    (_, _, diverged), (ks, Ks) = jax.lax.scan(
        bwd, (Vz, Vzz, jnp.asarray(False)), (A, B, lz, lu, lzz, luu, luz),
        reverse=True, unroll=cfg.unroll_horizon,
    )
    return ks, Ks, diverged


def _forward_pass(model, p, cfg, zs, us, ks, Ks, lams, rho):
    """Line search: roll out a ladder of step sizes in one vmapped batch.

    Log-spaced ladder (1 → ~3e-3): near-infeasible states need very small
    steps to make progress against steep AL penalty curvature, and the whole
    ladder costs one vmapped rollout regardless of spacing."""
    alphas = 10.0 ** jnp.linspace(0.0, -2.5, cfg.n_linesearch).astype(zs.dtype)

    def rollout_alpha(alpha):
        def f(z, inp):
            z_ref, u_ref, k_k, K_k = inp
            u = u_ref + alpha * k_k + K_k @ (z - z_ref)
            z_next = dynamics_step(model, cfg, z, u)
            return z_next, (z_next, u)

        _, (zs_new, us_new) = jax.lax.scan(
            f, zs[0], (zs[:-1], us, ks, Ks), unroll=cfg.unroll_horizon
        )
        zs_full = jnp.concatenate([zs[0][None], zs_new], axis=0)
        cost = _total_al_cost(model, p, cfg, zs_full, us_new, lams, rho)
        return cost, zs_full, us_new

    costs, zs_b, us_b = jax.vmap(rollout_alpha)(alphas)
    costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
    best = jnp.argmin(costs)
    return costs[best], zs_b[best], us_b[best]


@partial(jax.jit, static_argnames=("cfg",))
def solve(
    model: BicycleModel,
    p: OCPParams,
    cfg: SolverConfig,
    z0: jax.Array,
    us_init: jax.Array,
    lam_init: jax.Array,
) -> SolveResult:
    """Solve the horizon OCP from z0, warm-started at (us_init, lam_init)."""
    dtype = z0.dtype
    zs = _rollout(model, cfg, z0, us_init)
    us = us_init
    lams = lam_init
    rho = jnp.asarray(cfg.rho_init, dtype)

    def al_round(carry, _):
        zs, us, lams, rho = carry
        cost0 = _total_al_cost(model, p, cfg, zs, us, lams, rho)

        def ilqr_iter(carry2, _):
            zs, us, cost, reg = carry2
            ks, Ks, diverged = _backward_pass(model, p, cfg, zs, us, lams, rho, reg)
            new_cost, zs_new, us_new = _forward_pass(model, p, cfg, zs, us, ks, Ks, lams, rho)
            improved = (new_cost < cost) & ~diverged
            zs = jnp.where(improved, zs_new, zs)
            us = jnp.where(improved, us_new, us)
            cost = jnp.where(improved, new_cost, cost)
            # aggressive escalation: with few iLQR iterations per solve, a
            # rejected step must not burn the remaining budget at useless reg
            reg = jnp.where(improved, jnp.maximum(reg * 0.5, cfg.reg_init), reg * 100.0)
            return (zs, us, cost, reg), None

        (zs, us, cost, _), _ = jax.lax.scan(
            ilqr_iter, (zs, us, cost0, jnp.asarray(cfg.reg_init, dtype)), None,
            length=cfg.ilqr_iters, unroll=cfg.unroll_ilqr,
        )

        # multiplier + penalty update
        g_stage = jax.vmap(lambda z, u: constraints(model, p, z, u))(zs[:-1], us)
        g_term = constraints(model, p, zs[-1], jnp.zeros((NU,), dtype))
        g_term = jnp.where(jnp.arange(N_CON) < 10, g_term, -1.0)
        g_all = jnp.concatenate([g_stage, g_term[None]], axis=0)
        lams = jnp.maximum(0.0, lams + rho * g_all)
        rho = rho * cfg.rho_scale
        return (zs, us, lams, rho), None

    (zs, us, lams, rho), _ = jax.lax.scan(al_round, (zs, us, lams, rho), None, length=cfg.al_iters)

    return SolveResult(
        us=us,
        zs=zs,
        lam=lams,
        cost=_true_cost(model, p, zs, us),
        max_violation=_max_violation(model, p, zs, us),
    )
