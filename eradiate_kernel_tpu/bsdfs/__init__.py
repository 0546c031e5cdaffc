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
               conductor, dielectric, diffuse, mask, measured,
               measured_polarized, normalmap, null, plastic, polarizer,
               pplastic, retarder, roughconductor, roughdielectric,
               roughplastic, rpv, thindielectric)
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
    "measured": measured,
    "measured_polarized": measured_polarized,
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


# --- polarized (Mueller-matrix) dispatch ------------------------------------------
# The reference's polarized variants make Spectrum a MuellerMatrix and reuse
# the same integrator code (SURVEY §1 variant axis). Here polarized transport
# is an explicit parallel dispatch: kinds that implement `eval_mueller` /
# `sample_mueller` return per-channel (..., nc, 4, 4) matrices in the
# implicit local Stokes bases of (-wo, si.wi); everything else falls back to
# a depolarizer carrying the scalar value (diffuse-like scatterers fully
# depolarize — the same approximation mitsuba's unpolarized-only plugins
# make via `unpolarized<Spectrum>()`).

def _depolarizer_stack(value):
    """(..., nc) scalar weights -> (..., nc, 4, 4) depolarizer matrices."""
    out = jnp.zeros(value.shape + (4, 4))
    return out.at[..., 0, 0].set(value)


def bsdf_eval_mueller(scene, bsdf_index, si, wo, active, mode=common.RADIANCE):
    """Per-channel polarized BSDF eval: (..., nc, 4, 4) Mueller stack in the
    implicit world-space Stokes bases (after to_world_mueller), plus the
    scalar sampling pdf. Mirrors what `bsdf->eval` returns in the
    reference's polarized variants (interaction.h:275 applied by the
    integrator, path.cpp:165)."""
    from ..core import mueller as mu

    cfg = scene.config
    kind_id = tg(scene.bsdf_kind, bsdf_index)
    slot = tg(scene.bsdf_slot, bsdf_index)
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral \
        else cfg.variant.n_channels
    out = jnp.zeros(si.t.shape + (nc, 4, 4))
    pdf = jnp.zeros(si.t.shape)
    for k, kind in enumerate(cfg.bsdf_kinds):
        mod = REGISTRY[kind]
        m = active & (kind_id == k)
        v, p = mod.eval_pdf(scene, scene.bsdfs[kind], slot, si, wo, m, mode)
        if hasattr(mod, "eval_mueller"):
            mm = mod.eval_mueller(scene, scene.bsdfs[kind], slot, si, wo, m,
                                  mode)
            mm = mu.to_world_mueller(si.sh_frame, mm, -wo, si.wi)
        else:
            mm = _depolarizer_stack(v)
        out = jnp.where(m[..., None, None, None], mm, out)
        pdf = jnp.where(m, p, pdf)
    return out, pdf


def bsdf_sample_mueller(scene, bsdf_index, si, s1, s2, active,
                        mode=common.RADIANCE):
    """Polarized analog of bsdf_sample: importance-samples wo with the
    scalar machinery, then returns the Mueller importance weight
    (value/pdf as a (..., nc, 4, 4) stack in world Stokes bases)."""
    from ..core import mueller as mu

    cfg = scene.config
    kind_id = tg(scene.bsdf_kind, bsdf_index)
    slot = tg(scene.bsdf_slot, bsdf_index)
    bs, w = bsdf_sample(scene, bsdf_index, si, s1, s2, active)
    nc = w.shape[-1]
    weight_m = _depolarizer_stack(w)
    for k, kind in enumerate(cfg.bsdf_kinds):
        mod = REGISTRY[kind]
        m = active & (kind_id == k)
        if kind == "null":
            # straight-through transmission preserves the full Stokes state
            mm = w[..., None, None] * jnp.eye(4)
        elif kind in POLARIZED_ELEMENT_KINDS:
            # delta-transmissive optical element: its own-frame Mueller
            # (horizontal axis = dp_du projected perpendicular to the
            # propagation direction), per-channel rescaled to the scalar
            # weight, re-based onto the implicit local Stokes frames
            m_elem = mod.mueller(scene, scene.bsdfs[kind], slot, si, m)
            f = si.wi  # light continues along wi_local (wo = -wi)
            h = si.sh_frame.to_local(si.dp_du)
            h = h - f * jnp.sum(h * f, -1, keepdims=True)
            h_len = jnp.linalg.norm(h, axis=-1, keepdims=True)
            h = jnp.where(h_len > 1e-8, h / jnp.maximum(h_len, 1e-12),
                          mu.stokes_basis(f))
            basis = mu.stokes_basis(f)
            m_elem = mu.rotate_stokes_basis(f, h, basis) @ m_elem \
                @ mu.rotate_stokes_basis(f, basis, h)
            m00 = m_elem[..., 0, 0]
            scale = w / jnp.maximum(m00, 1e-12)[..., None]
            mm = jnp.where((m00 > 1e-12)[..., None, None, None],
                           scale[..., None, None] * m_elem[..., None, :, :],
                           _depolarizer_stack(w))
            # re-base onto world-space implicit frames (wo = -wi, so the
            # in/out forward directions coincide: both si.wi)
            mm = mu.to_world_mueller(si.sh_frame, mm, si.wi, si.wi)
        elif hasattr(mod, "sample_mueller_weight"):
            mm = mod.sample_mueller_weight(scene, scene.bsdfs[kind], slot, si,
                                           bs, w, m, mode)
            mm = mu.to_world_mueller(si.sh_frame, mm, -bs.wo, si.wi)
        elif hasattr(mod, "eval_mueller"):
            mm = mod.eval_mueller(scene, scene.bsdfs[kind], slot, si, bs.wo,
                                  m, mode)
            mm = mu.to_world_mueller(si.sh_frame, mm, -bs.wo, si.wi)
            ok = bs.pdf > 0
            mm = mm / jnp.maximum(bs.pdf, 1e-20)[..., None, None, None]
            mm = jnp.where(ok[..., None, None, None], mm, 0.0)
        else:
            continue
        weight_m = jnp.where(m[..., None, None, None], mm, weight_m)
    return bs, weight_m
