"""rte_rrtmgp_tpu — a TPU-native (JAX/XLA/Pallas) RTE+RRTMGP radiation framework.

A from-scratch reimplementation of the capabilities of microhh/rte-rrtmgp-cpp
(RRTMGP correlated k-distribution gas optics + RTE two-stream / no-scattering
flux solvers + cloud/aerosol optics + Monte-Carlo ray tracers), redesigned for
TPU hardware:

* arrays are 0-based, C-order ``(ncol, nlay, ngpt)`` jnp arrays with the
  spectral (g-point) axis innermost so it maps onto the 128-lane vector axis,
* the reference's three parallel code trees (CPU / CUDA batch / CUDA per-gpt)
  collapse into a single JAX implementation that JIT-specializes; per-g-point
  streaming is a ``gpt_chunk`` parameter (lax.scan over spectral chunks),
* vertical solver recurrences are ``lax.scan`` sweeps (per-column, vectorized
  over columns x g-points),
* column/spectral parallelism is expressed with ``jax.sharding`` meshes, not
  explicit communication.

Reference implementation studied (not copied): /root/reference
(microhh/rte-rrtmgp-cpp; C++/CUDA; see SURVEY.md at the repo root).
"""

from . import config

__version__ = "0.1.0"
