"""BSDF plugin registry and wavefront dispatch.

The reference's BSDF virtual dispatch over per-lane object pointers (Enoki
vectorized vtables, SURVEY §5.9) becomes a masked sweep over the static set of
BSDF kinds present in the scene: each kind evaluates the whole wavefront with
its lanes' gathered parameters, results are selected by kind mask. With the
handful of kinds in real scenes this is faster on TPU than any gather-based
divergence scheme — no scalarization, pure VPU work.

Wrapper kinds (mask/blendbsdf/normalmap/bumpmap) hold a nested global BSDF
index and re-dispatch through the non-wrapper kinds (one nesting level, the
pattern real scenes use; the reference allows arbitrary depth via virtual
calls, which has no static-trace analog).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.gather import table_gather as tg

from . import (bilambertian, blendbsdf, bumpmap, circular, common,
               conductor, dielectric, diffuse, mask, normalmap, null,
               plastic, polarizer, pplastic, retarder, roughconductor,
               roughdielectric, roughplastic, rpv, thindielectric)
from .common import BSDFSample, zero_bsdf_sample

REGISTRY = {
    "diffuse": diffuse,
    "null": null,
    "rpv": rpv,
    "bilambertian": bilambertian,
    "conductor": conductor,
    "roughconductor": roughconductor,
    "dielectric": dielectric,
    "roughdielectric": roughdielectric,
    "thindielectric": thindielectric,
    "plastic": plastic,
    "roughplastic": roughplastic,
    "pplastic": pplastic,
    "mask": mask,
    "blendbsdf": blendbsdf,
    "normalmap": normalmap,
    "bumpmap": bumpmap,
    "polarizer": polarizer,
    "retarder": retarder,
    "circular": circular,
}

POLARIZED_ELEMENT_KINDS = tuple(
    k for k, v in REGISTRY.items()
    if getattr(v, "IS_POLARIZED_ELEMENT", False))

WRAPPER_KINDS = tuple(k for k, v in REGISTRY.items()
                      if getattr(v, "IS_WRAPPER", False))


def register_bsdf(name, module):
    """Extension hook — analog of register_bsdf (integrator_v.cpp:167):
    user-defined BSDF kinds are plain modules/namespaces with build/sample/
    eval_pdf functions."""
    REGISTRY[name] = module


def bsdf_flags(scene, bsdf_index):
    """Per-lane lobe flags (device gather from the precomputed table)."""
    return tg(scene.bsdf_flags, bsdf_index)


def _merge_sample(bs, weight, b, w, m):
    return BSDFSample(
        wo=jnp.where(m[..., None], b.wo, bs.wo),
        pdf=jnp.where(m, b.pdf, bs.pdf),
        eta=jnp.where(m, b.eta, bs.eta),
        sampled_type=jnp.where(m, b.sampled_type, bs.sampled_type)), \
        jnp.where(m[..., None], w, weight)


def _dispatch_sample(scene, bsdf_index, si, s1, s2, active, mode, kinds):
    cfg = scene.config
    kind_id = tg(scene.bsdf_kind, bsdf_index)
    slot = tg(scene.bsdf_slot, bsdf_index)
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    bs, weight = zero_bsdf_sample(si.t.shape, nc)
    for k, kind in enumerate(cfg.bsdf_kinds):
        if kind not in kinds:
            continue
        m = active & (kind_id == k)
        b, w = REGISTRY[kind].sample(scene, scene.bsdfs[kind], slot, si,
                                     s1, s2, m, mode)
        bs, weight = _merge_sample(bs, weight, b, w, m)
    return bs, weight


def _dispatch_eval_pdf(scene, bsdf_index, si, wo, active, mode, kinds):
    cfg = scene.config
    kind_id = tg(scene.bsdf_kind, bsdf_index)
    slot = tg(scene.bsdf_slot, bsdf_index)
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    value = jnp.zeros(si.t.shape + (nc,))
    pdf = jnp.zeros(si.t.shape)
    for k, kind in enumerate(cfg.bsdf_kinds):
        if kind not in kinds:
            continue
        m = active & (kind_id == k)
        v, p = REGISTRY[kind].eval_pdf(scene, scene.bsdfs[kind], slot, si, wo,
                                       m, mode)
        value = jnp.where(m[..., None], v, value)
        pdf = jnp.where(m, p, pdf)
    return value, pdf


def bsdf_sample(scene, bsdf_index, si, s1, s2, active, mode=common.RADIANCE):
    """Dispatch sample() over the kinds present. bsdf_index: (...,) i32."""
    return _dispatch_sample(scene, bsdf_index, si, s1, s2, active, mode,
                            scene.config.bsdf_kinds)


def bsdf_eval_pdf(scene, bsdf_index, si, wo, active, mode=common.RADIANCE):
    return _dispatch_eval_pdf(scene, bsdf_index, si, wo, active, mode,
                              scene.config.bsdf_kinds)


def dispatch_sample_nested(scene, bsdf_index, si, s1, s2, active,
                           mode=common.RADIANCE):
    """Dispatch restricted to non-wrapper kinds — called from inside wrapper
    BSDFs to evaluate their nested child without trace-time recursion."""
    kinds = tuple(k for k in scene.config.bsdf_kinds if k not in WRAPPER_KINDS)
    return _dispatch_sample(scene, bsdf_index, si, s1, s2, active, mode, kinds)


def dispatch_eval_pdf_nested(scene, bsdf_index, si, wo, active,
                             mode=common.RADIANCE):
    kinds = tuple(k for k in scene.config.bsdf_kinds if k not in WRAPPER_KINDS)
    return _dispatch_eval_pdf(scene, bsdf_index, si, wo, active, mode, kinds)


def eval_null_transmission(scene, bsdf_index, si, active):
    """Unscattered straight-through transmittance (bsdf.h
    eval_null_transmission) — used by volumetric NEE transmittance walks."""
    cfg = scene.config
    kind_id = tg(scene.bsdf_kind, bsdf_index)
    slot = tg(scene.bsdf_slot, bsdf_index)
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    out = jnp.zeros(si.t.shape + (nc,))
    for k, kind in enumerate(cfg.bsdf_kinds):
        mod = REGISTRY[kind]
        fn = getattr(mod, "eval_null_transmission", None)
        if fn is None:
            continue
        m = active & (kind_id == k)
        out = jnp.where(m[..., None], fn(scene, scene.bsdfs[kind], slot, si, m),
                        out)
    return out
