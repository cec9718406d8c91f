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

from lap_time_optimization_tpu.ops import spline  # noqa: F401
from lap_time_optimization_tpu.track import Track  # noqa: F401

__all__ = ["spline", "Track", "__version__"]
