"""BSDF interface shared definitions.

Mirrors include/mitsuba/render/bsdf.h: lobe flag taxonomy (bsdf.h:38-124),
BSDFContext transport mode, and the sample record. Every BSDF kind is a module
with pure wavefront functions:

  build(props, builder) -> row dict          (host side, scene build)
  sample(scene, params, slot, si, s1, s2, active) -> (BSDFSample, weight)
  eval_pdf(scene, params, slot, si, wo, active)   -> (value, pdf)

``weight`` is bsdf_value * cos / pdf (the importance weight); ``value``
includes the cosine foreshortening factor, as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import pytree_dataclass

# --- BSDFFlags (bsdf.h:38-124) ------------------------------------------------
Empty = 0x0
Null = 0x1
DiffuseReflection = 0x2
DiffuseTransmission = 0x4
GlossyReflection = 0x8
GlossyTransmission = 0x10
DeltaReflection = 0x20
DeltaTransmission = 0x40
Anisotropic = 0x1000
SpatiallyVarying = 0x2000
NonSymmetric = 0x4000
FrontSide = 0x8000
BackSide = 0x10000

Reflection = DiffuseReflection | GlossyReflection | DeltaReflection
Transmission = DiffuseTransmission | GlossyTransmission | DeltaTransmission | Null
Diffuse = DiffuseReflection | DiffuseTransmission
Glossy = GlossyReflection | GlossyTransmission
Smooth = Diffuse | Glossy
Delta = DeltaReflection | DeltaTransmission | Null
All = Reflection | Transmission

# transport modes
RADIANCE = "radiance"
IMPORTANCE = "importance"


@pytree_dataclass
class BSDFSample:
    """bsdf.h:146 BSDFSample3f."""

    wo: jnp.ndarray            # (..., 3) local frame
    pdf: jnp.ndarray           # (...,)
    eta: jnp.ndarray           # (...,) relative ior change
    sampled_type: jnp.ndarray  # (...,) uint32 lobe flags


def zero_bsdf_sample(batch, nc):
    return BSDFSample(
        wo=jnp.zeros(batch + (3,)).at[..., 2].set(1.0),
        pdf=jnp.zeros(batch),
        eta=jnp.ones(batch),
        sampled_type=jnp.zeros(batch, jnp.uint32),
    ), jnp.zeros(batch + (nc,))


def flip_z(v):
    return v * jnp.asarray([1.0, 1.0, -1.0])


def twosided_frame(twosided, wi):
    """If the instance is wrapped in `twosided` and hit from the back, work in
    the flipped frame (twosided.cpp behavior). Returns (wi', flip_mask)."""
    flip = twosided & (wi[..., 2] < 0.0)
    return jnp.where(flip[..., None], flip_z(wi), wi), flip
