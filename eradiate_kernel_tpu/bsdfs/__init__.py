"""BSDF plugin registry and wavefront dispatch.

The reference's BSDF virtual dispatch over per-lane object pointers (Enoki
vectorized vtables, SURVEY §5.9) becomes a masked sweep over the static set of
BSDF kinds present in the scene: each kind evaluates the whole wavefront with
its lanes' gathered parameters, results are selected by kind mask. With the
handful of kinds in real scenes this is faster on TPU than any gather-based
divergence scheme — no scalarization, pure VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import bilambertian, common, diffuse, null, rpv
from .common import BSDFSample, zero_bsdf_sample

REGISTRY = {
    "diffuse": diffuse,
    "null": null,
    "rpv": rpv,
    "bilambertian": bilambertian,
}


def register_bsdf(name, module):
    """Extension hook — analog of register_bsdf (integrator_v.cpp:167):
    user-defined BSDF kinds are plain modules/namespaces with build/sample/
    eval_pdf functions."""
    REGISTRY[name] = module


def bsdf_flags(scene, bsdf_index):
    """Per-lane lobe flags (device gather from the precomputed table)."""
    return scene.bsdf_flags[bsdf_index]


def bsdf_sample(scene, bsdf_index, si, s1, s2, active, mode=common.RADIANCE):
    """Dispatch sample() over the kinds present. bsdf_index: (...,) i32."""
    cfg = scene.config
    kind_id = scene.bsdf_kind[bsdf_index]
    slot = scene.bsdf_slot[bsdf_index]
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    bs, weight = zero_bsdf_sample(si.t.shape, nc)
    for k, kind in enumerate(cfg.bsdf_kinds):
        m = active & (kind_id == k)
        b, w = REGISTRY[kind].sample(scene, scene.bsdfs[kind], slot, si, s1, s2, m, mode)
        bs = BSDFSample(
            wo=jnp.where(m[..., None], b.wo, bs.wo),
            pdf=jnp.where(m, b.pdf, bs.pdf),
            eta=jnp.where(m, b.eta, bs.eta),
            sampled_type=jnp.where(m, b.sampled_type, bs.sampled_type))
        weight = jnp.where(m[..., None], w, weight)
    return bs, weight


def bsdf_eval_pdf(scene, bsdf_index, si, wo, active, mode=common.RADIANCE):
    cfg = scene.config
    kind_id = scene.bsdf_kind[bsdf_index]
    slot = scene.bsdf_slot[bsdf_index]
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    value = jnp.zeros(si.t.shape + (nc,))
    pdf = jnp.zeros(si.t.shape)
    for k, kind in enumerate(cfg.bsdf_kinds):
        m = active & (kind_id == k)
        v, p = REGISTRY[kind].eval_pdf(scene, scene.bsdfs[kind], slot, si, wo, m, mode)
        value = jnp.where(m[..., None], v, value)
        pdf = jnp.where(m, p, pdf)
    return value, pdf
