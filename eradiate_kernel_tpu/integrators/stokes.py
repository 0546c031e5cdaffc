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

from ..core import mueller as mu
from . import polarized


def aov_names(cfg):
    return ["s1", "s2", "s3"]


def n_aov(cfg):
    return 3


def _sensor_basis_rotation(scene, ray):
    """Rotation from the ray's implicit Stokes basis to the sensor-aligned
    basis (stokes.cpp:93-100)."""
    tw = scene.sensor["to_world"]
    up = tw.m[:3, 1]  # sensor up (0,1,0) in world
    target = jnp.cross(ray.d, jnp.broadcast_to(up, ray.d.shape))
    t_len = jnp.linalg.norm(target, axis=-1, keepdims=True)
    current = mu.stokes_basis(-ray.d)
    target = jnp.where(t_len > 1e-8, target / jnp.maximum(t_len, 1e-12),
                       current)
    return mu.rotate_stokes_basis(-ray.d, current, target)


def sample_aov(scene, sampler, ray, ray_weight, active=None):
    # media present (or an explicitly volumetric child): Mueller volpath —
    # the analog of nesting `volpath` inside `stokes` under a polarized
    # variant; pure-surface scenes keep the (cheaper) polarized path tracer
    extra = dict(scene.config.integrator.extra)
    volumetric = bool(scene.config.medium_kinds) or \
        extra.get("child") == "volpath"
    if volumetric:
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
