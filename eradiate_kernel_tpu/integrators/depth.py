"""Depth AOV integrator (reference: src/integrators/depth.cpp) — smoke test."""

from __future__ import annotations

import jax.numpy as jnp

from ..render.geometry import ray_intersect


def sample(scene, sampler, ray, active=None):
    si = ray_intersect(scene.geo, ray)
    nc = ray.wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    t = jnp.where(si.is_valid, si.t, 0.0)
    return jnp.broadcast_to(t[..., None], t.shape + (nc,)), si.is_valid, sampler
