"""lap_time_optimization_tpu — a TPU-native lap-time & trajectory optimization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
`bruno-maruszczak/lap-time-optimization` project (see SURVEY.md):

* racing-line optimization (curvature-min, compromise, estimated-compromise,
  sector-wise, direct lap-time, Bayesian-opt, nonlinear multi-start) over a
  differentiable spline/velocity-profile pipeline,
* a closed-loop NMPC stack (curvilinear bicycle + Pacejka tires) solved with a
  jitted augmented-Lagrangian iLQR instead of CasADi/IPOPT,
* batched/sharded candidate search across a `jax.sharding.Mesh`.

Everything in the compute path is functional JAX: traced once, compiled by XLA,
differentiable end-to-end, and vmappable over candidate batches.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache, opt-in via LTO_JAX_CACHE=<dir>.
# (Opt-in, not default: remote-compile TPU backends have been observed to
# stall for minutes when combined with the persistent cache.)
try:  # pragma: no cover - depends on jax build
    _cache_dir = _os.environ.get("LTO_JAX_CACHE")
    if _cache_dir and _cache_dir.lower() != "off":
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from lap_time_optimization_tpu.ops import spline  # noqa: F401
from lap_time_optimization_tpu.track import Track  # noqa: F401

__all__ = ["spline", "Track", "__version__"]
