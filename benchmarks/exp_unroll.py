"""Experiment: scan-unroll factors vs single-stream NMPC rate (run on chip).

The AL-iLQR solve is latency-bound: short sequential scans over tiny
matrices.  This sweeps `SolverConfig.unroll_horizon` / `unroll_ilqr` and
reports closed-loop Hz at horizon 10.  Usage: python benchmarks/exp_unroll.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from lap_time_optimization_tpu.models import load_vehicle
from lap_time_optimization_tpu.models.bicycle import BicycleModel
from lap_time_optimization_tpu.mpc import runner
from lap_time_optimization_tpu.mpc import track as mpc_track
from lap_time_optimization_tpu.mpc.solver import OCPParams, SolverConfig

track = mpc_track.load("MX-5", "buckmore", "curvature", base_dir="/root/reference/data")
model = BicycleModel(vehicle=load_vehicle("MX5"), track=track)
x0 = jnp.asarray(runner.X0_REFERENCE, jnp.float32)
p = OCPParams.reference(jnp.float32)

STEPS = 100
variants = [
    ("baseline (1,1)", dict(unroll_horizon=1, unroll_ilqr=1)),
    ("h-unroll (10,1)", dict(unroll_horizon=10, unroll_ilqr=1)),
    ("i-unroll (1,5)", dict(unroll_horizon=1, unroll_ilqr=5)),
    ("full (10,5)", dict(unroll_horizon=10, unroll_ilqr=5)),
]
if len(sys.argv) > 1:
    variants = [v for v in variants if sys.argv[1] in v[0]]

for name, kw in variants:
    cfg = SolverConfig(horizon=10, **kw)
    t0 = time.time()
    sim = runner.closed_loop(model, p, cfg, x0, STEPS)
    sim.xs.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    sim = runner.closed_loop(model, p, cfg, x0, STEPS)
    sim.xs.block_until_ready()
    wall = time.time() - t0
    print(
        f"{name:18s}: {STEPS / wall:7.1f} Hz  (compile {compile_s:.1f}s, "
        f"progress {float(sim.xs[-1, 0]):.1f} m, "
        f"maxviol {float(jnp.max(sim.violations)):.4f})",
        flush=True,
    )
