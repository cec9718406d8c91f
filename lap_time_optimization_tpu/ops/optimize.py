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


def minimize_lbfgs(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iter: int = 200,
    tol: float = 1e-6,
    memory_size: int = 15,
) -> MinimizeResult:
    """Unconstrained L-BFGS with zoom linesearch, run to tolerance in-graph."""
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        _, _, it, gnorm = carry
        return (it < max_iter) & (gnorm > tol)

    def body(carry):
        params, state, it, _ = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(grad, state, params, value=value, grad=grad, value_fn=fun)
        params = optax.apply_updates(params, updates)
        return params, state, it + 1, jnp.linalg.norm(grad)

    state0 = opt.init(x0)
    init = (x0, state0, jnp.asarray(0), jnp.asarray(jnp.inf, x0.dtype))
    params, state, it, gnorm = jax.lax.while_loop(cond, body, init)
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
