"""Stokes-vector integrator (reference: src/integrators/stokes.cpp).

Runs the full polarized path tracer (`integrators.polarized` — the analog of
nesting a path tracer inside `stokes` under a ``*_polarized`` variant) and
outputs the polarization state of the camera ray as AOV channels S1..S3
alongside the S0 radiance. The final Stokes vector, accumulated in the
implicit basis of the camera ray, gets one last rotation so it aligns with
the sensor's horizontal axis (stokes.cpp:89-100: target basis =
cross(ray.d, sensor_up)).

Polarimetric fidelity per scatterer kind comes from the Mueller dispatch
(bsdfs.bsdf_eval_mueller): pplastic and measured_polarized contribute full
pBRDF matrices, smooth conductors complex-Fresnel matrices, optical elements
their element matrices; remaining kinds depolarize.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import polarized
from .polarized_vol import _sensor_basis_rotation


def aov_names(cfg):
    return ["s1", "s2", "s3"]


def n_aov(cfg):
    return 3


def _volumetric(cfg):
    extra = dict(cfg.integrator.extra)
    return bool(cfg.medium_kinds) or extra.get("child") == "volpath"


# --- regen-driver hooks ------------------------------------------------------
# stokes(volpath) rides the regenerating lane pool: polarized_vol carries
# the Mueller throughput/Stokes lane state and premultiplies the sensor-
# basis rotation at refill, so harvest just reads the carried vector.
# Pure-surface stokes(path) keeps the scan driver (integrators.polarized
# exposes no bounce hooks), selected automatically by regen_supported.

def _regen_module(cfg):
    from . import polarized_vol
    return polarized_vol if _volumetric(cfg) else polarized


def _harvest_aov(scene, vp, rw, aov_carry):
    """S1..S3 channel means from the carried sensor-basis Stokes vector
    (stokes.cpp:117 emits per-RGB components; the film AOV layer carries
    scalars — same convention as the scan path's sample_aov)."""
    s_mean = jnp.mean(vp.stokes, axis=-2)
    return s_mean[..., 1:4]


def sample_aov(scene, sampler, ray, ray_weight, active=None):
    # media present (or an explicitly volumetric child): Mueller volpath —
    # the analog of nesting `volpath` inside `stokes` under a polarized
    # variant; pure-surface scenes keep the (cheaper) polarized path tracer
    if _volumetric(scene.config):
        from . import polarized_vol
        stokes, valid, sampler = polarized_vol.sample_stokes(
            scene, sampler, ray, active)
    else:
        stokes, valid, sampler = polarized.sample_stokes(scene, sampler, ray,
                                                         active)
    # rotate into the sensor frame; the rotation acts per channel
    rot = _sensor_basis_rotation(scene, ray)
    stokes = jnp.einsum("...ij,...cj->...ci", rot, stokes)

    out_spec = stokes[..., 0]
    # AOVs: channel-mean S1..S3 (the reference emits per-RGB S-components,
    # stokes.cpp:117; the film's AOV layer here carries scalars)
    s_mean = jnp.mean(stokes, axis=-2)
    aovs = s_mean[..., 1:4]
    return out_spec, valid, sampler, aovs


def sample(scene, sampler, ray, active=None):
    spec, valid, sampler, _ = sample_aov(scene, sampler, ray,
                                         jnp.ones_like(ray.o[..., :1]),
                                         active)
    return spec, valid, sampler
