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
N_CON = 14  # stage inequality count for the default model (see `constraints`)


def n_con(model) -> int:
    """Stage inequality count: 14, +2 friction-ellipse rows when the model
    enables them (the warm-start multiplier buffers must match)."""
    return N_CON + 2 if getattr(model, "enable_traction_ellipse", False) else N_CON


def _state_row_mask(n: int):
    """Mask of constraint rows that are pure STATE constraints (apply at
    the terminal stage too): the first 10 box/lateral rows and the
    friction-ellipse rows (14+); rows 10-13 are input boxes."""
    idx = jnp.arange(n)
    return (idx < 10) | (idx >= 14)


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
    # Lateral constraint-tightening margin [m]: the SOLVER sees a band
    # shrunk by this much, so the fixed-iteration real-time presets keep
    # their small transient slack strictly inside the true track band.
    # Violations are always REPORTED against the true (margin-0) band.
    lateral_margin: jax.Array = None

    @classmethod
    def reference(cls, dtype=jnp.float32, lateral_margin: float = 0.0) -> "OCPParams":
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
            lateral_margin=a(lateral_margin),
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
    # Quadraticization of the AL cost in the backward pass:
    # "gauss_newton" — exact gradients + J^T J Hessians from one forward-mode
    #   Jacobian of the residual/constraint stacks (the cost is exactly a
    #   nonlinear least-squares, see `stage_residuals`); PSD by construction.
    # "exact" — jax.hessian of the AL stage cost (round-1 behavior).
    hessian_mode: str = dataclasses.field(metadata=dict(static=True), default="gauss_newton")
    # Riccati + line-search execution backend:
    # "auto"      — fused Pallas kernel on TPU, XLA scans elsewhere
    # "pallas"    — force the fused kernel (ops/pallas_ilqr.py)
    # "interpret" — Pallas interpreter mode (CPU parity tests)
    # "xla"       — the lax.scan path
    # The kernel requires hessian_mode="gauss_newton".
    backend: str = dataclasses.field(metadata=dict(static=True), default="auto")
    # Windowed-table length for the BATCH kernel (ops/pallas_ilqr_batch):
    # each instance sees `window` table samples starting MARGIN samples
    # behind its current s.  0 = the module default (64, sized for ~1 m
    # table spacing and a ≤1 s horizon).  Use `ensure_batch_window(model,
    # cfg)` to derive/validate a sufficient value from the concrete track —
    # an uncovered horizon makes every line-search rollout clamp at the
    # window edge and silently diverge from vmap(solve).
    window: int = dataclasses.field(metadata=dict(static=True), default=0)

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
        """Real-time preset scaled to the horizon.  Long horizons run two
        stiff AL rounds with a gentle penalty ramp (ρ 200→400): measured on
        buckmore h20 over 150 closed-loop steps (with the 5 cm lateral
        tightening margin), applied-state violations drop to 2.3e-3 vs
        4e-2 for a single-round schedule at the same total iLQR budget."""
        if horizon <= 12:
            return cls(horizon=horizon, dt=dt)
        return cls(
            horizon=horizon, dt=dt, substeps=2,
            al_iters=2, ilqr_iters=5, n_linesearch=6,
            rho_init=200.0, rho_scale=2.0,
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


N_RES = 7  # stage residuals; first N_RES_TERM form the terminal cost
N_RES_TERM = 3


def stage_residuals(model: BicycleModel, p: OCPParams, z: jax.Array, u: jax.Array) -> jax.Array:
    """Weighted residual vector r with stage_cost(z, u) == sum(r²).

    Every term of the reference objective (src/mpc/controller.py:52-53 plus
    the Δu rterm) is a square, so the cost is exactly a nonlinear
    least-squares — the basis for the Gauss-Newton quadraticization."""
    x = z[:NX]
    u_prev = z[NX:]
    veh = model.vehicle
    vref = model.track.v_ref(x[IDX_S])
    b_dyn = jnp.arctan(x[IDX_VY] / jnp.maximum(x[IDX_VX], 1e-3))
    b_kin = jnp.arctan(x[IDX_DELTA] * veh.length_r / (veh.length_f + veh.length_r))
    du = u - u_prev
    return jnp.stack(
        [
            jnp.sqrt(p.q_n) * x[IDX_N],
            jnp.sqrt(p.q_mu) * x[IDX_MU],
            x[IDX_VY],
            x[IDX_VX] - p.vref_scale * vref,
            jnp.sqrt(p.q_B) * (b_dyn - b_kin),
            jnp.sqrt(p.r_delta) * du[0],
            jnp.sqrt(p.r_throttle) * du[1],
        ]
    )


def terminal_cost(model: BicycleModel, p: OCPParams, z: jax.Array) -> jax.Array:
    """mterm (reference src/mpc/controller.py:52)."""
    x = z[:NX]
    return p.q_n * x[IDX_N] ** 2 + p.q_mu * x[IDX_MU] ** 2 + x[IDX_VY] ** 2


def constraints(model: BicycleModel, p: OCPParams, z: jax.Array, u: jax.Array) -> jax.Array:
    """All stage inequalities g ≤ 0 against the TRUE band
    (reference src/mpc/controller.py:57-103)."""
    return _constraints(model, p, z, u, jnp.asarray(0.0, z.dtype))


def tightened_constraints(model: BicycleModel, p: OCPParams, z: jax.Array, u: jax.Array) -> jax.Array:
    """Constraints as the SOLVER sees them: the lateral band shrunk by
    `p.lateral_margin` so fixed-iteration real-time solves keep their
    transient slack strictly inside the true track limits."""
    margin = p.lateral_margin
    if margin is None:
        margin = jnp.asarray(0.0, z.dtype)
    return _constraints(model, p, z, u, margin)


def _constraints(model, p, z, u, lateral_margin) -> jax.Array:
    x = z[:NX]
    left, right = model.lateral_constraints(x[IDX_S], x[IDX_N], x[IDX_MU])
    left = left + lateral_margin
    right = right + lateral_margin
    rows = _box_rows(model, p, z, u, left, right)
    if getattr(model, "enable_traction_ellipse", False):
        ef, er = model.traction_ellipse_physical(
            x[IDX_THROTTLE], x[IDX_VX], x[IDX_VY], x[5], x[IDX_DELTA]
        )
        rows = jnp.concatenate([rows, jnp.stack([ef, er])])
    return rows


def _box_rows(model, p, z, u, left, right) -> jax.Array:
    x = z[:NX]
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
    return stage_cost(model, p, z, u) + _al_penalty(tightened_constraints(model, p, z, u), lam, rho)


def al_terminal_cost(model, p, z, lam, rho):
    # terminal constraints: state rows only (inputs don't exist at stage N);
    # reuse the stage constraint vector with u = 0 and mask the input rows.
    g = tightened_constraints(model, p, z, jnp.zeros((NU,), z.dtype))
    g = jnp.where(_state_row_mask(g.shape[0]), g, -1.0)
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
    g_term = constraints(model, p, zs[-1], jnp.zeros((NU,), zs.dtype))
    g_term = jnp.where(_state_row_mask(g_term.shape[0]), g_term, -jnp.inf)
    return jnp.maximum(jnp.max(g), jnp.max(g_term))


def _quads_exact(model, p, z, u, lam, rho):
    """Full second-order quadraticization via jax.hessian (round-1 path)."""
    c = lambda zz, uu: al_stage_cost(model, p, zz, uu, lam, rho)
    lz = jax.grad(c, argnums=0)(z, u)
    lu = jax.grad(c, argnums=1)(z, u)
    lzz = jax.hessian(c, argnums=0)(z, u)
    luu = jax.hessian(c, argnums=1)(z, u)
    luz = jax.jacfwd(jax.grad(c, argnums=1), argnums=0)(z, u)
    return lz, lu, lzz, luu, luz


def _quads_gauss_newton(model, p, z, u, lam, rho):
    """Exact gradient + Gauss-Newton Hessian from residual Jacobians.

    cost = Σ r(z,u)² + Σ φ(g(z,u), λ, ρ), so
      ∇   = 2 Jrᵀ r + Jgᵀ φ'           (exact: φ' = max(0, λ+ρg))
      ∇²  ≈ 2 JrᵀJr + ρ Jgᵀ diag(act) Jg   (dropping residual curvature)
    PSD by construction, and one forward-mode Jacobian per stack replaces
    two Hessians + a mixed Jacobian."""
    zu = jnp.concatenate([z, u])

    def res_cons(zu_):
        zz, uu = zu_[:NZ], zu_[NZ:]
        return stage_residuals(model, p, zz, uu), tightened_constraints(model, p, zz, uu)

    (r, g), (Jr, Jg) = res_cons(zu), jax.jacfwd(res_cons)(zu)
    phi = jnp.maximum(0.0, lam + rho * g)
    act = jnp.where(phi > 0.0, rho, 0.0)
    grad = 2.0 * Jr.T @ r + Jg.T @ phi
    hess = 2.0 * Jr.T @ Jr + Jg.T @ (act[:, None] * Jg)
    lz, lu = grad[:NZ], grad[NZ:]
    lzz = hess[:NZ, :NZ]
    luu = hess[NZ:, NZ:]
    luz = hess[NZ:, :NZ]
    return lz, lu, lzz, luu, luz


def _terminal_quads_gauss_newton(model, p, z, lam, rho):
    """GN quadraticization of the terminal cost (mterm + masked AL)."""
    u0 = jnp.zeros((NU,), z.dtype)

    def res(zz):
        return stage_residuals(model, p, zz, zz[NX:])[:N_RES_TERM]

    def cons(zz):
        g = tightened_constraints(model, p, zz, u0)
        return jnp.where(_state_row_mask(g.shape[0]), g, -1.0)

    r, Jr = res(z), jax.jacfwd(res)(z)
    g, Jg = cons(z), jax.jacfwd(cons)(z)
    phi = jnp.maximum(0.0, lam + rho * g)
    act = jnp.where(phi > 0.0, rho, 0.0)
    Vz = 2.0 * Jr.T @ r + Jg.T @ phi
    Vzz = 2.0 * Jr.T @ Jr + Jg.T @ (act[:, None] * Jg)
    return Vz, Vzz


def _backward_pass(model, p, cfg, zs, us, lams, rho, reg):
    """Riccati sweep on the AL cost; returns feedforward k and feedback K."""
    # linearize dynamics and quadraticize cost along the trajectory (vmapped)
    A, B = _linearize_joint(model, cfg, zs, us)

    if cfg.hessian_mode == "gauss_newton":
        lz, lu, lzz, luu, luz = jax.vmap(
            lambda z, u, lam: _quads_gauss_newton(model, p, z, u, lam, rho)
        )(zs[:-1], us, lams[:-1])
        Vz, Vzz = _terminal_quads_gauss_newton(model, p, zs[-1], lams[-1], rho)
    else:
        lz, lu, lzz, luu, luz = jax.vmap(
            lambda z, u, lam: _quads_exact(model, p, z, u, lam, rho)
        )(zs[:-1], us, lams[:-1])
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


def _resolved_backend(cfg: SolverConfig) -> str:
    if cfg.backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return cfg.backend


def required_batch_window(model, cfg: SolverConfig) -> int:
    """Windowed-table samples the batch kernel needs to cover any plausible
    horizon rollout on this concrete track: MARGIN behind + worst-case travel
    `horizon·dt·v_cap` ahead, v_cap = 1.5×max(vref) (the tracking objective
    penalizes 0.6·vref, so accepted rollouts never approach 1.5×; transient
    line-search candidates beyond it clamp at the edge and are discarded as
    diverged).  Requires concrete (non-traced) track tables."""
    import numpy as np

    from lap_time_optimization_tpu.ops.pallas_ilqr_batch import MARGIN

    track = model.track
    n = track.s_grid.shape[0]
    ds = float(track.s_max) / (n - 1)
    v_cap = max(1.5 * float(np.max(np.asarray(track.vref_vals))), 5.0)
    travel = cfg.horizon * cfg.dt * v_cap
    need = MARGIN + int(np.ceil(travel / ds)) + 4
    return max(8, (need + 7) // 8 * 8)  # sublane-aligned


def ensure_batch_window(model, cfg: SolverConfig) -> SolverConfig:
    """Return `cfg` with a batch-kernel window validated against the concrete
    track (ADVICE r3: WINDOW=64 hard-coded a ~1 m-spacing assumption).  With
    `cfg.window == 0` the derived sufficient window is filled in; an explicit
    but insufficient window raises.  No-op on the XLA backend or when the
    track tables are traced (call from host, as `runner.closed_loop_batch`
    does)."""
    if _resolved_backend(cfg) == "xla":
        return cfg
    if isinstance(model.track.s_max, jax.core.Tracer):
        return cfg
    need = required_batch_window(model, cfg)
    if cfg.window == 0:
        from lap_time_optimization_tpu.ops.pallas_ilqr_batch import WINDOW

        return dataclasses.replace(cfg, window=max(need, WINDOW))
    if cfg.window < need:
        raise ValueError(
            f"SolverConfig.window={cfg.window} cannot cover the horizon on "
            f"this track (needs ≥{need} samples); rollouts would clamp at "
            f"the window edge and diverge from vmap(solve)"
        )
    return cfg


def _iterate_xla(model, p, cfg, zs, us, lams, rho, reg):
    """One iLQR iteration on the lax.scan path."""
    ks, Ks, diverged = _backward_pass(model, p, cfg, zs, us, lams, rho, reg)
    new_cost, zs_new, us_new = _forward_pass(model, p, cfg, zs, us, ks, Ks, lams, rho)
    return new_cost, zs_new, us_new, diverged


def _linearize_joint(model, cfg, zs, us):
    """(A, B) for every stage from ONE forward-mode Jacobian over the
    concatenated (z, u) input — a single traced RK4 chain with NZ+NU
    tangents instead of two chains (one per argument)."""

    def step_zu(zu):
        return dynamics_step(model, cfg, zu[:NZ], zu[NZ:])

    J = jax.vmap(lambda z, u: jax.jacfwd(step_zu)(jnp.concatenate([z, u])))(
        zs[:-1], us
    )  # (N, NZ, NZ+NU)
    return J[:, :, :NZ], J[:, :, NZ:]


def _iterate_pallas(model, p, cfg, zs, us, lams, rho, reg, interpret: bool):
    """One iLQR iteration with the fused VMEM-resident kernel:
    linearization + GN quadraticization stay in XLA (stage-parallel), the
    serial Riccati + line-search rollout run inside ops/pallas_ilqr."""
    from lap_time_optimization_tpu.ops import pallas_ilqr as PK

    dtype = zs.dtype
    A, B = _linearize_joint(model, cfg, zs, us)
    lz, lu, lzz, luu, luz = jax.vmap(
        lambda z, u, lam: _quads_gauss_newton(model, p, z, u, lam, rho)
    )(zs[:-1], us, lams[:-1])
    Vz, Vzz = _terminal_quads_gauss_newton(model, p, zs[-1], lams[-1], rho)
    tables = PK.tables_matrix(model, dtype)
    scal = PK.scal_vector(model, p, cfg, rho, reg, dtype)
    alphas = (10.0 ** jnp.linspace(0.0, -2.5, cfg.n_linesearch)).astype(dtype)
    zs_new, us_new, new_cost, ok = PK.backward_forward(
        A, B, lz, lu, lzz, luu, luz, Vz, Vzz, zs, us, lams, tables, alphas, scal,
        N=cfg.horizon, L=cfg.n_linesearch, substeps=cfg.substeps,
        interpret=interpret,
    )
    return new_cost, zs_new, us_new, ok < 0.5


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

    backend = _resolved_backend(cfg)
    if backend in ("pallas", "interpret") and cfg.hessian_mode != "gauss_newton":
        raise ValueError("the fused Pallas backend requires hessian_mode='gauss_newton'")
    if backend in ("pallas", "interpret"):
        iterate = partial(_iterate_pallas, interpret=(backend == "interpret"))
    else:
        iterate = _iterate_xla

    def al_round(carry, _):
        zs, us, lams, rho = carry
        cost0 = _total_al_cost(model, p, cfg, zs, us, lams, rho)

        def ilqr_iter(carry2, _):
            zs, us, cost, reg = carry2
            new_cost, zs_new, us_new, diverged = iterate(
                model, p, cfg, zs, us, lams, rho, reg
            )
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

        # multiplier + penalty update (on the tightened band the AL optimizes)
        g_stage = jax.vmap(lambda z, u: tightened_constraints(model, p, z, u))(zs[:-1], us)
        g_term = tightened_constraints(model, p, zs[-1], jnp.zeros((NU,), dtype))
        g_term = jnp.where(_state_row_mask(g_term.shape[0]), g_term, -1.0)
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


# ------------------------------------------------------------- batched solve
def _iterate_pallas_batch(model, p, cfg, zs_b, us_b, lams_b, rho, reg_b, interpret):
    """One iLQR iteration for a batch of OCPs: linearization + GN
    quadraticization stay in XLA (batched large ops), the serial Riccati +
    line search run in the batch-parallel fused kernel
    (ops/pallas_ilqr_batch, batch on the lane dimension)."""
    from lap_time_optimization_tpu.ops import pallas_ilqr as PK
    from lap_time_optimization_tpu.ops import pallas_ilqr_batch as PKB

    dtype = zs_b.dtype
    A, B = jax.vmap(lambda zs, us: _linearize_joint(model, cfg, zs, us))(zs_b, us_b)
    lz, lu, lzz, luu, luz = jax.vmap(
        lambda zs, us, lams: jax.vmap(
            lambda z, u, lam: _quads_gauss_newton(model, p, z, u, lam, rho)
        )(zs[:-1], us, lams[:-1])
    )(zs_b, us_b, lams_b)
    Vz, Vzz = jax.vmap(
        lambda zs, lams: _terminal_quads_gauss_newton(model, p, zs[-1], lams[-1], rho)
    )(zs_b, lams_b)
    tables = PK.tables_matrix(model, dtype)
    scal = PK.scal_vector(model, p, cfg, rho, 0.0, dtype)
    alphas = (10.0 ** jnp.linspace(0.0, -2.5, cfg.n_linesearch)).astype(dtype)
    zs_new, us_new, cost, ok = PKB.backward_forward_batch(
        A, B, lz, lu, lzz, luu, luz, Vz, Vzz,
        zs_b, us_b, lams_b, tables, alphas, scal, reg_b,
        N=cfg.horizon, L=cfg.n_linesearch, W=(cfg.window or PKB.WINDOW),
        substeps=cfg.substeps, interpret=interpret,
    )
    return cost, zs_new, us_new, ok < 0.5


@partial(jax.jit, static_argnames=("cfg",))
def solve_batch(
    model: BicycleModel,
    p: OCPParams,
    cfg: SolverConfig,
    z0_b: jax.Array,
    us_init_b: jax.Array,
    lam_init_b: jax.Array,
) -> SolveResult:
    """Solve a BATCH of independent horizon OCPs (leading batch axis on
    every argument).  Per-instance semantics match `jax.vmap(solve)` —
    same AL schedule, per-instance step acceptance and regularization
    escalation (parity-tested in tests/test_pallas_ilqr.py) — but on TPU
    the serial Riccati/line-search chains run in the batch-parallel fused
    kernel instead of serializing a vmapped single-instance program.
    On the XLA backend this IS vmap(solve); non-GN Hessian modes also
    delegate to vmap(solve), with the backend resolved to "xla" (the fused
    kernels are Gauss-Newton-only)."""
    dtype = z0_b.dtype
    backend = _resolved_backend(cfg)
    if backend == "xla" or cfg.hessian_mode != "gauss_newton":
        if backend != "xla":
            # non-GN Hessians are only supported on the XLA path; resolve the
            # backend so the inner solve() doesn't reject the combination
            # (ADVICE r3: the advertised fallback raised instead)
            cfg = dataclasses.replace(cfg, backend="xla")
        return jax.vmap(lambda z0, us, lam: solve(model, p, cfg, z0, us, lam))(
            z0_b, us_init_b, lam_init_b
        )
    interpret = backend == "interpret"
    Bt = z0_b.shape[0]
    zs_b = jax.vmap(lambda z0, us: _rollout(model, cfg, z0, us))(z0_b, us_init_b)
    us_b = us_init_b
    lams_b = lam_init_b
    rho = jnp.asarray(cfg.rho_init, dtype)

    total_al = jax.vmap(
        lambda zs, us, lams, r: _total_al_cost(model, p, cfg, zs, us, lams, r),
        in_axes=(0, 0, 0, None),
    )

    def al_round(carry, _):
        zs_b, us_b, lams_b, rho = carry
        cost0 = total_al(zs_b, us_b, lams_b, rho)  # (Bt,)

        def ilqr_iter(carry2, _):
            zs_b, us_b, cost_b, reg_b = carry2
            new_cost, zs_new, us_new, diverged = _iterate_pallas_batch(
                model, p, cfg, zs_b, us_b, lams_b, rho, reg_b, interpret
            )
            improved = (new_cost < cost_b) & ~diverged
            sel = improved[:, None, None]
            zs_b = jnp.where(sel, zs_new, zs_b)
            us_b = jnp.where(sel, us_new, us_b)
            cost_b = jnp.where(improved, new_cost, cost_b)
            reg_b = jnp.where(
                improved, jnp.maximum(reg_b * 0.5, cfg.reg_init), reg_b * 100.0
            )
            return (zs_b, us_b, cost_b, reg_b), None

        (zs_b, us_b, _, _), _ = jax.lax.scan(
            ilqr_iter,
            (zs_b, us_b, cost0, jnp.full((Bt,), cfg.reg_init, dtype)),
            None, length=cfg.ilqr_iters, unroll=cfg.unroll_ilqr,
        )

        def update_lams(zs, us, lams):
            g_stage = jax.vmap(lambda z, u: tightened_constraints(model, p, z, u))(
                zs[:-1], us
            )
            g_term = tightened_constraints(model, p, zs[-1], jnp.zeros((NU,), dtype))
            g_term = jnp.where(_state_row_mask(g_term.shape[0]), g_term, -1.0)
            g_all = jnp.concatenate([g_stage, g_term[None]], axis=0)
            return jnp.maximum(0.0, lams + rho * g_all)

        lams_b = jax.vmap(update_lams)(zs_b, us_b, lams_b)
        return (zs_b, us_b, lams_b, rho * cfg.rho_scale), None

    (zs_b, us_b, lams_b, rho), _ = jax.lax.scan(
        al_round, (zs_b, us_b, lams_b, rho), None, length=cfg.al_iters
    )

    return SolveResult(
        us=us_b,
        zs=zs_b,
        lam=lams_b,
        cost=jax.vmap(lambda zs, us: _true_cost(model, p, zs, us))(zs_b, us_b),
        max_violation=jax.vmap(lambda zs, us: _max_violation(model, p, zs, us))(zs_b, us_b),
    )
