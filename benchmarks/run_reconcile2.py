"""Reconcile, part 2: WHERE does the scan lose 1.7 ms/step vs fori_loop?

run_reconcile.py measured the full closed-loop step body at 2.33 ms inside a
fori_loop but 4.06 ms inside the production scan.  Variants:

  C   fori_loop, model/p closed over as constants      (repro, 2.33 ms)
  C2  fori_loop, model/p as traced jit arguments       (isolates const-folding)
  E   lax.scan, NO stacked outputs, constants          (isolates scan carry)
  F   lax.scan, stacked outputs, constants             (= production body)
  G   production closed_loop (model/p traced args), steps-slope 50 vs 200

Slope method throughout (two lengths, dispatch excluded), readback sync.
Writes benchmarks/reconcile2_tpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(build, lengths=(50, 200)):
    import jax
    import numpy as _np

    def _sync(out):
        _np.asarray(jax.tree_util.tree_leaves(out)[0])

    ts = {}
    for n in lengths:
        fn = build(n)
        _sync(fn())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fn())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = lengths
    return (ts[n1] - ts[n0]) / (n1 - n0)


def main():
    import jax
    import jax.numpy as jnp

    from lap_time_optimization_tpu.models import load_vehicle
    from lap_time_optimization_tpu.models.bicycle import BicycleModel
    from lap_time_optimization_tpu.mpc import runner, solver as S
    from lap_time_optimization_tpu.mpc import track as mpc_track
    from lap_time_optimization_tpu.mpc.solver import OCPParams, SolverConfig, n_con

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    track = mpc_track.load("MX-5", "buckmore", "curvature",
                           base_dir=os.path.join(repo, "data"))
    model = BicycleModel(vehicle=load_vehicle("MX5"), track=track)
    dtype = jnp.float32
    p = OCPParams.reference(dtype, lateral_margin=0.05)
    cfg = SolverConfig(horizon=10)
    x0 = jnp.asarray(runner.X0_REFERENCE, dtype)
    us0 = jnp.zeros((cfg.horizon, 2), dtype)
    lam0 = jnp.zeros((cfg.horizon + 1, n_con(model)), dtype)
    carry0 = (x0, us0, lam0, jnp.zeros((2,), dtype))
    step = partial(runner._step_fn, model, p, cfg)

    results = {"meta": {"device": str(jax.devices()[0]),
                        "method": "length slopes 50 vs 200, best of 3, readback sync"}}

    def run_case(name, build):
        slope = timed(build)
        results[name] = {"ms_per_step": slope * 1e3, "hz": 1.0 / slope}
        print(f"{name}: {slope*1e3:.3f} ms/step ({1/slope:.1f} Hz)", flush=True)

    # C: fori, constants
    def build_C(n):
        @jax.jit
        def run():
            def body(_, c):
                c2, _out = step(c, None)
                return c2
            return jax.lax.fori_loop(0, n, body, carry0)
        return run
    run_case("C_fori_const", build_C)

    # C2: fori, model/p traced args
    def build_C2(n):
        @partial(jax.jit, static_argnames=())
        def run(model_, p_, carry):
            stp = partial(runner._step_fn, model_, p_, cfg)
            def body(_, c):
                c2, _out = stp(c, None)
                return c2
            return jax.lax.fori_loop(0, n, body, carry)
        return lambda: run(model, p, carry0)
    run_case("C2_fori_args", build_C2)

    # E: scan, no outputs, constants
    def build_E(n):
        @jax.jit
        def run():
            def body(c, _):
                c2, _out = step(c, None)
                return c2, None
            c, _ = jax.lax.scan(body, carry0, None, length=n)
            return c
        return run
    run_case("E_scan_noout_const", build_E)

    # F: scan, stacked outputs, constants
    def build_F(n):
        @jax.jit
        def run():
            c, outs = jax.lax.scan(step, carry0, None, length=n)
            return c, outs
        return run
    run_case("F_scan_out_const", build_F)

    # G: production closed_loop (jit with model/p args)
    def build_G(n):
        return lambda: runner.closed_loop(model, p, cfg, x0, n)
    run_case("G_production", build_G)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "reconcile2_tpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
