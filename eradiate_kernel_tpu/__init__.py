"""eradiate_kernel_tpu — a TPU-native differentiable renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Eradiate
kernel (a Mitsuba 2 fork for Earth-observation radiative transfer): wavefront
surface + volumetric path tracing, spectral/RGB/mono modes, counter-based RNG,
sharded multi-chip rendering, and end-to-end differentiability.

See SURVEY.md at the repo root for the structural analysis of the reference
and the architecture mapping.
"""

__version__ = "0.1.0"

from .core.types import Variant  # noqa: F401
