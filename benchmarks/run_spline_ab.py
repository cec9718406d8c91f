"""A/B: dense O(n³) vs cyclic-tridiagonal O(n) spline moment solve at the
saturated search knee (VERDICT r4 item 5).

Round 1 chose the dense moment solve on an MXU argument ("batched dense LU
maps onto the MXU better than a sequential Thomas scan", ops/spline.py);
round 4's utilization evidence showed the saturated search is bounded by
exactly those "batched dense spline factorizations' compute-latency chains"
(benchmarks/utilization_tpu.json (b)).  This script races the production
`search_step` (solver="pallas", the single-chip search path) at the measured
knee B=4096 with each moment solve, plus B=1024 for the latency regime.

Timing per axon gotchas: device→host readback sync (block_until_ready can
early-ack mesh-sharded outputs), best-of-N.

Writes benchmarks/spline_ab_tpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lap_time_optimization_tpu.models import load_vehicle
    from lap_time_optimization_tpu.ops import spline
    from lap_time_optimization_tpu.parallel import mesh as pmesh
    from lap_time_optimization_tpu.track import Track

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    track = Track.load(os.path.join(repo, "data", "tracks", "buckmore.json"),
                       track_width=0.8)
    vehicle = load_vehicle(os.path.join(repo, "data", "vehicles", "tbr18.json"))
    mesh = pmesh.make_mesh(1, sp=1)
    results = {"meta": {
        "device": str(jax.devices()[0]),
        "workload": "search_step solver='pallas' (production single-chip search)",
        "method_global": "spline.FIT_METHOD_CLOSED_BATCHED flipped per column",
        "timing": "best-of-5 per round, readback sync",
    }}

    for B in (1024, 4096):
        for method in ("dense", "tridiag"):
            spline.FIT_METHOD_CLOSED_BATCHED = method
            # search_step is jitted and its cache does NOT key on the module
            # global — without this, the second method's rounds silently
            # reuse the first method's compiled program (measured: identical
            # timings to 0.1%, a pure cache artifact)
            jax.clear_caches()
            key = jax.random.PRNGKey(0)
            alphas = jax.random.uniform(key, (B, track.size), track.left.dtype)
            sigma = jnp.asarray(0.1, track.left.dtype)
            with jax.set_mesh(mesh):
                a, t, _ = pmesh.search_step(track, vehicle, alphas, key, sigma,
                                            solver="pallas")
                float(t)  # compile + sync
                best = float("inf")
                for _ in range(5):
                    a2 = a + 0.0  # don't donate the warm buffer away
                    t0 = time.perf_counter()
                    a2, t, _ = pmesh.search_step(track, vehicle, a2, key, sigma,
                                                 solver="pallas")
                    float(t)  # readback sync
                    best = min(best, time.perf_counter() - t0)
            results[f"B{B}_{method}"] = {
                "ms_per_round": best * 1e3,
                "evals_per_s": B / best,
            }
            print(f"B={B} {method}: {best*1e3:.1f} ms/round, {B/best:.0f} evals/s",
                  flush=True)

    for B in (1024, 4096):
        d, t = (results[f"B{B}_dense"], results[f"B{B}_tridiag"])
        results[f"B{B}_speedup_tridiag_over_dense"] = round(
            d["ms_per_round"] / t["ms_per_round"], 3)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "spline_ab_tpu.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
