"""Second-moment wrapper integrator (reference: src/integrators/moment.cpp:28-46).

Wraps a child integrator and records the per-channel second moment of its
XYZ output as AOV channels ('m2.x','m2.y','m2.z'). The z-test render
regression harness uses these to estimate per-pixel variance
(test_renders.py:64-133).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import spectrum as sp


def aov_names(cfg):
    return ["m2.x", "m2.y", "m2.z"]


def n_aov(cfg):
    return 3


def _child(cfg):
    from . import REGISTRY
    extra = dict(cfg.integrator.extra)
    return REGISTRY[extra.get("child", "path")]


def sample(scene, sampler, ray, active=None):
    cfg = scene.config
    return _child(cfg).sample(scene, sampler, ray, active)


def sample_aov(scene, sampler, ray, ray_weight, active=None):
    """Second moment of the *splatted* sample value (incl. the sensor's
    spectral weight) so film-variance estimation matches what lands in the
    XYZ channels."""
    cfg = scene.config
    spec, valid, sampler = _child(cfg).sample(scene, sampler, ray, active)
    weighted = spec * ray_weight
    if cfg.variant.is_spectral:
        xyz = sp.spectrum_to_xyz(weighted, ray.wavelengths)
    elif cfg.variant.is_monochromatic:
        xyz = jnp.repeat(weighted, 3, axis=-1)
    else:
        xyz = sp.srgb_to_xyz(weighted)
    return spec, valid, sampler, xyz * xyz


# --- regen-driver hooks ------------------------------------------------------

def _regen_module(cfg):
    return _child(cfg)


def _harvest_aov(scene, vp, rw, aov_carry):
    """Second moment of the splatted sample value, computed at lane
    harvest from the carried path state (moment.cpp:28-46 semantics on
    the regenerating driver)."""
    cfg = scene.config
    weighted = vp.result * rw
    if cfg.variant.is_spectral:
        xyz = sp.spectrum_to_xyz(weighted, vp.ray.wavelengths)
    elif cfg.variant.is_monochromatic:
        xyz = jnp.repeat(weighted, 3, axis=-1)
    else:
        xyz = sp.srgb_to_xyz(weighted)
    return xyz * xyz
