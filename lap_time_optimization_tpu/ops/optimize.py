"""Jittable bounded minimization (the scipy.optimize replacement).

The reference drives every racing-line method through scipy's L-BFGS-B with
*finite-difference* gradients (src/trajectory.py:68-74,90-96,139-145): each
L-BFGS iteration costs O(n_ctrl)≈132 extra spline refits.  Here the pipeline
is differentiable, so we run optax's L-BFGS (two-loop recursion + zoom
linesearch) with analytic `jax.grad` — one objective + one gradient evaluation
per iteration, all inside a single compiled `lax.while_loop`.

Box constraints [lo, hi] are handled by a smooth sigmoid reparameterization,
which keeps the iterates strictly feasible and the problem unconstrained (the
optimum saturates asymptotically at the bounds, where the reference's active
constraints sit).  The whole minimizer is vmappable, which is what enables
batched multi-start / per-sector / per-epsilon sweeps on one chip.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class MinimizeResult(NamedTuple):
    x: jax.Array
    fun: jax.Array
    n_iter: jax.Array
    grad_norm: jax.Array


def _logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def bounded_transform(lo, hi):
    """Return (to_params, to_theta) maps for the box [lo, hi]."""

    def to_params(theta):
        return lo + (hi - lo) * jax.nn.sigmoid(theta)

    def to_theta(x):
        p = jnp.clip((x - lo) / (hi - lo), 1e-6, 1.0 - 1e-6)
        return _logit(p)

    return to_params, to_theta


def lbfgs_stepper(
    fun: Callable[[jax.Array], jax.Array],
    max_iter: int = 200,
    tol: float = 1e-6,
    memory_size: int = 15,
):
    """Resumable L-BFGS: returns `(init, run)` where `run(carry, n_steps)`
    advances at most `n_steps` iterations (bounded `lax.while_loop`) and can be
    called repeatedly — running k then m steps is step-for-step identical to
    running k+m in one program.

    Why segments exist: some TPU runtimes bound single-program execution time
    (the axon tunnel hard-kills any device program at ~60 s — measured, see
    PERFORMANCE.md), and data-dependent linesearch trip counts make a full
    to-convergence `while_loop` unboundedly long.  Host-dispatched segments
    keep every program short, and the host gains natural checkpoint /
    heartbeat points between segments.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def init(x0):
        return (x0, opt.init(x0), jnp.asarray(0), jnp.asarray(jnp.inf, x0.dtype))

    def run(carry, n_steps: int):
        stop_at = jnp.minimum(carry[2] + n_steps, max_iter)

        def cond(c):
            _, _, it, gnorm = c
            return (it < stop_at) & (gnorm > tol)

        def body(c):
            params, state, it, _ = c
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(grad, state, params, value=value, grad=grad, value_fn=fun)
            params = optax.apply_updates(params, updates)
            return params, state, it + 1, jnp.linalg.norm(grad)

        return jax.lax.while_loop(cond, body, carry)

    return init, run


def minimize_lbfgs(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iter: int = 200,
    tol: float = 1e-6,
    memory_size: int = 15,
) -> MinimizeResult:
    """Unconstrained L-BFGS with zoom linesearch, run to tolerance in-graph."""
    init, run = lbfgs_stepper(fun, max_iter=max_iter, tol=tol, memory_size=memory_size)
    params, state, it, gnorm = run(init(x0), max_iter)
    return MinimizeResult(x=params, fun=fun(params), n_iter=it, grad_norm=gnorm)


def minimize_bounded(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    lo: float = 0.0,
    hi: float = 1.0,
    max_iter: int = 200,
    tol: float = 1e-6,
    memory_size: int = 15,
) -> MinimizeResult:
    """Minimize fun(x) subject to lo <= x <= hi elementwise.

    Drop-in for `scipy.optimize.minimize(..., method='L-BFGS-B',
    bounds=Bounds(lo, hi))` as used throughout the reference.
    """
    lo = jnp.asarray(lo, x0.dtype)
    hi = jnp.asarray(hi, x0.dtype)
    to_params, to_theta = bounded_transform(lo, hi)

    def fun_theta(theta):
        return fun(to_params(theta))

    res = minimize_lbfgs(fun_theta, to_theta(x0), max_iter=max_iter, tol=tol, memory_size=memory_size)
    x = to_params(res.x)
    return MinimizeResult(x=x, fun=res.fun, n_iter=res.n_iter, grad_norm=res.grad_norm)


def bounded_stepper(
    fun: Callable[[jax.Array], jax.Array],
    lo: float = 0.0,
    hi: float = 1.0,
    max_iter: int = 200,
    tol: float = 1e-6,
    memory_size: int = 15,
    dtype=jnp.float32,
):
    """Segmented variant of `minimize_bounded`: `(init, run, finalize)`.

    `init(x0)` → carry; `run(carry, n_steps)` → carry (≤ n_steps iterations);
    `finalize(carry)` → MinimizeResult in the original (bounded) coordinates.
    All three are pure and jittable; the host loop between `run` calls bounds
    device-program duration (see `lbfgs_stepper`).  The host can detect
    convergence by carry[2] (iteration count) not advancing.
    """
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)
    to_params, to_theta = bounded_transform(lo, hi)

    def fun_theta(theta):
        return fun(to_params(theta))

    init0, run = lbfgs_stepper(fun_theta, max_iter=max_iter, tol=tol, memory_size=memory_size)

    def init(x0):
        return init0(to_theta(x0))

    def finalize(carry) -> MinimizeResult:
        x = to_params(carry[0])
        return MinimizeResult(x=x, fun=fun(x), n_iter=carry[2], grad_norm=carry[3])

    return init, run, finalize
