"""Worker process for the multi-process distributed test.

Launched twice by tests/test_distributed.py (process_id 0 and 1), each with
4 virtual CPU devices, so the global mesh spans 8 devices across 2 OS
processes — the same topology class as 2 TPU hosts on DCN.  The collectives
in `parallel.sp_velocity` (ring ppermute halo, all_gather of block
summaries) cross the process boundary because the mesh is built with sp=8:
every sp-neighbor hop from device 3 to device 4 is process 0 → process 1.

Prints "WORKER_OK <max_err>" on success; the parent asserts both workers
print it and that the error is at machine precision.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    # the axon TPU plugin overrides the JAX_PLATFORMS env var; the config
    # knob is authoritative (same approach as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from lap_time_optimization_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * args.num_processes, jax.devices()

    import jax.numpy as jnp

    from lap_time_optimization_tpu.models import load_vehicle
    from lap_time_optimization_tpu.ops import spline, velocity
    from lap_time_optimization_tpu.parallel import sp_velocity
    from lap_time_optimization_tpu.track import Track

    # sp spans ALL 8 global devices → the ring ppermute and all_gather in
    # every block sweep hop across the process boundary (the DCN leg)
    mesh = distributed.global_mesh(sp=4 * args.num_processes)
    assert mesh.shape["sp"] == 4 * args.num_processes

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    track = Track.load(os.path.join(repo, "data", "tracks", "buckmore.json"), track_width=0.99)
    vehicle = load_vehicle(os.path.join(repo, "data", "vehicles", "tbr18.json"))

    sp = track.mid_spline()
    s = jnp.linspace(0.0, sp.length, track.ns)[:-1]
    k = spline.curvature(sp, s, signed=False)

    # Every process traces the same program on the same replicated host data;
    # inside jit the shard_map collectives run over the global mesh.  The
    # output is a replicated scalar, safe to fetch on every process.
    @jax.jit
    def max_err(s, k):
        v_sp = sp_velocity.solve_profile_sp(vehicle, s, k, sp.length, mesh, closed=True)
        v_seq = velocity.solve_profile(vehicle, s, k, sp.length, closed=True)
        return jnp.max(jnp.abs(v_sp - v_seq))

    with jax.set_mesh(mesh):
        err = float(max_err(s, k))
    print(f"WORKER_OK {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
