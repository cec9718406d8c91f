"""Reconcile the in-program single-solve rate with the closed-loop scan rate.

VERDICT r4 weak #1: `utilization_tpu.json` (a) measures one h10 solve at
~2 ms device time (496 Hz) inside a dependent-rep fori_loop, while the
fully-amortized 500-step closed-loop scan measures ~4 ms/step (252 Hz).
This script attributes the gap by timing an in-program ladder of step-body
variants, each a dependent-rep fori_loop (slope method, dispatch excluded):

  A  solve-only, carry (us, lam), fixed z0       — repro of the microbench;
     cost/max_violation are DCE'd because the body only consumes us/lam
  B  A + consume cost & max_violation            — isolates the reporting tax
  C  full closed-loop step (solve + clip + plant + shift), carry
     (x, us, lam, u_prev), outputs discarded      — the true control cycle
  D  the production `closed_loop` scan, wall/steps with readback sync
     (stacked per-step outputs included)

Writes benchmarks/reconcile_tpu.json with ms/step per variant and the
attribution (B-A = reporting, C-B = plant+clip+warm-shift, D-C = scan
stacking + dispatch remainder).

Usage: python benchmarks/run_reconcile.py [--steps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(make_fn, reps=(3, 13)):
    import jax
    import numpy as _np

    def _sync(out):
        _np.asarray(jax.tree_util.tree_leaves(out)[0])

    fns = {n: make_fn(n) for n in reps}
    ts = {}
    for n, fn in fns.items():
        _sync(fn())  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(fn())
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = reps
    slope = (ts[n1] - ts[n0]) / (n1 - n0)
    return slope, ts[n0] - slope * n0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "reconcile_tpu.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    z0 = jnp.concatenate([x0, jnp.zeros(2, dtype)])
    us0 = jnp.zeros((cfg.horizon, 2), dtype)
    lam0 = jnp.zeros((cfg.horizon + 1, n_con(model)), dtype)

    results = {"meta": {"device": str(jax.devices()[0]),
                        "method": "fori_loop slopes reps 3 vs 13, best of 3, readback sync"}}

    # ---- A: solve-only, outputs us/lam (cost/viol DCE'd)
    def make_A(n):
        @jax.jit
        def run():
            def body(_, carry):
                us, lam = carry
                r = S.solve(model, p, cfg, z0, us, lam)
                return r.us, r.lam
            return jax.lax.fori_loop(0, n, body, (us0, lam0))
        return run

    # ---- B: solve + consume cost & max_violation
    def make_B(n):
        @jax.jit
        def run():
            def body(_, carry):
                us, lam, acc = carry
                r = S.solve(model, p, cfg, z0, us, lam)
                return r.us, r.lam, acc + r.cost + r.max_violation
            return jax.lax.fori_loop(0, n, body, (us0, lam0, jnp.asarray(0.0, dtype)))
        return run

    # ---- C: the full closed-loop step body (solve + clip + plant + shift)
    def make_C(n):
        @jax.jit
        def run():
            from functools import partial
            step = partial(runner._step_fn, model, p, cfg)

            def body(_, carry):
                new_carry, out = step(carry, None)
                return new_carry
            x = x0
            carry0 = (x, us0, lam0, jnp.zeros((2,), dtype))
            return jax.lax.fori_loop(0, n, body, carry0)
        return run

    for name, mk in (("A_solve_only", make_A), ("B_plus_reporting", make_B),
                     ("C_full_step", make_C)):
        slope, intercept = slope_time(mk)
        results[name] = {"ms_per_step": slope * 1e3,
                         "dispatch_intercept_ms": intercept * 1e3,
                         "hz": 1.0 / slope}
        print(f"{name}: {slope*1e3:.3f} ms/step ({1/slope:.1f} Hz), "
              f"intercept {intercept*1e3:.1f} ms", flush=True)

    # ---- D: the production scan (wall / steps, readback sync)
    steps = args.steps
    sim = runner.closed_loop(model, p, cfg, x0, steps)
    np.asarray(sim.xs)  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim = runner.closed_loop(model, p, cfg, x0, steps)
        np.asarray(sim.xs)
        best = min(best, time.perf_counter() - t0)
    results["D_production_scan"] = {"ms_per_step": best / steps * 1e3,
                                    "hz": steps / best, "steps": steps}
    print(f"D_production_scan: {best/steps*1e3:.3f} ms/step ({steps/best:.1f} Hz)",
          flush=True)

    a = results["A_solve_only"]["ms_per_step"]
    b = results["B_plus_reporting"]["ms_per_step"]
    c = results["C_full_step"]["ms_per_step"]
    d = results["D_production_scan"]["ms_per_step"]
    results["attribution_ms"] = {
        "bare_solve": a,
        "reporting_cost_viol": b - a,
        "plant_clip_shift": c - b,
        "scan_stack_plus_dispatch": d - c,
    }
    print("attribution:", json.dumps(results["attribution_ms"], indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
