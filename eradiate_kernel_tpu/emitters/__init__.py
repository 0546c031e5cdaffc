"""Emitter plugins and scene-level emitter sampling.

Counterparts of include/mitsuba/render/{endpoint,emitter}.h and src/emitters.
Scene-level sampling follows Scene::sample_emitter_direction (scene.cpp:169-215):
uniform emitter pick -> per-kind sample_direction -> shadow-ray visibility.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import warp
from ..core.math import dot, normalize
from ..render.records import DirectionSample
from ..render.texture import texture_eval
from ..render import shape_sampling
from ..render.geometry import ray_test
from ..core.ray import Ray

# emitter flags (emitter.h:14-79)
DELTA_POSITION = 0x1
DELTA_DIRECTION = 0x2
INFINITE = 0x4
SURFACE = 0x8


# --- kind implementations ------------------------------------------------------
# area (src/emitters/area.cpp): params {radiance: tex idx, shape: shape idx}
# constant (constant.cpp:43-103): params {radiance: tex idx}
# point: params {position (n,3), intensity: tex idx}
# directional (directional.cpp:64-132): params {direction (n,3), irradiance: tex}
# spot: params {position, direction, cutoff/beam angles, intensity}


def _tex(scene, tex_idx, uv, wavelengths, active):
    return texture_eval(scene, tex_idx, uv, wavelengths, active)


def area_eval(scene, params, slot, si, active):
    """Radiance of an area emitter seen from direction si.wi (front side)."""
    front = si.wi[..., 2] > 0.0
    v = _tex(scene, params["radiance"][slot], si.uv, si.wavelengths, active)
    return jnp.where((active & front)[..., None], v, 0.0)


def area_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    shape_idx = params["shape"][slot]
    ps = shape_sampling.sample_position(scene, shape_idx, s1, s2, active)
    delta = ps.p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    dist = jnp.sqrt(dist2)
    d = delta / dist[..., None]
    cos_em = dot(ps.n, -d)
    front = cos_em > 1e-7
    pdf_sa = ps.pdf * dist2 / jnp.maximum(jnp.abs(cos_em), 1e-20)
    value = _tex(scene, params["radiance"][slot], ps.uv, wavelengths, active)
    value = jnp.where((active & front)[..., None], value, 0.0)
    pdf_sa = jnp.where(front, pdf_sa, 0.0)
    ds = DirectionSample(p=ps.p, n=ps.n, uv=ps.uv, d=d, dist=dist, pdf=pdf_sa,
                         delta=jnp.zeros_like(front),
                         emitter_index=jnp.zeros(dist.shape, jnp.int32))
    return ds, value


def area_pdf_direction(scene, params, slot, ref_p, ds_p, ds_n, active):
    shape_idx = params["shape"][slot]
    delta = ds_p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    d = delta / jnp.sqrt(dist2)[..., None]
    cos_em = jnp.abs(dot(ds_n, -d))
    pdf = shape_sampling.pdf_position(scene, shape_idx) * dist2 / jnp.maximum(cos_em, 1e-20)
    return jnp.where(active & (cos_em > 1e-7), pdf, 0.0)


def constant_eval(scene, params, slot, uv, wavelengths, active):
    return _tex(scene, params["radiance"][slot], uv, wavelengths, active)


def constant_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    d = warp.square_to_uniform_sphere(s2)
    pdf = warp.square_to_uniform_sphere_pdf(d)
    r = 2.0 * scene.bsphere_radius
    p = ref_p + d * r
    value = _tex(scene, params["radiance"][slot], s2, wavelengths, active)
    ds = DirectionSample(p=p, n=-d, uv=s2, d=d, dist=jnp.full(pdf.shape, r),
                         pdf=pdf, delta=jnp.zeros(pdf.shape, bool),
                         emitter_index=jnp.zeros(pdf.shape, jnp.int32))
    return ds, value / pdf[..., None]


def point_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    p = params["position"][slot]
    delta = p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    dist = jnp.sqrt(dist2)
    d = delta / dist[..., None]
    value = _tex(scene, params["intensity"][slot],
                 jnp.zeros(dist.shape + (2,)), wavelengths, active) / dist2[..., None]
    ds = DirectionSample(p=p, n=-d, uv=jnp.zeros(dist.shape + (2,)), d=d,
                         dist=dist, pdf=jnp.ones_like(dist),
                         delta=jnp.ones(dist.shape, bool),
                         emitter_index=jnp.zeros(dist.shape, jnp.int32))
    return ds, value


def directional_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    d_emit = normalize(params["direction"][slot])  # direction light travels
    d = -d_emit
    r = 2.0 * scene.bsphere_radius
    value = _tex(scene, params["irradiance"][slot],
                 jnp.zeros(d.shape[:-1] + (2,)), wavelengths, active)
    ds = DirectionSample(p=ref_p + d * r, n=d_emit,
                         uv=jnp.zeros(d.shape[:-1] + (2,)), d=d,
                         dist=jnp.full(d.shape[:-1], r),
                         pdf=jnp.ones(d.shape[:-1]),
                         delta=jnp.ones(d.shape[:-1], bool),
                         emitter_index=jnp.zeros(d.shape[:-1], jnp.int32))
    return ds, value


KIND_SAMPLERS = {
    "area": area_sample_direction,
    "constant": constant_sample_direction,
    "point": point_sample_direction,
    "directional": directional_sample_direction,
}


# =============================================================================
# scene-level operations
# =============================================================================

def sample_emitter_direction(scene, si, s_pick, s1, s2, active,
                             test_visibility=True):
    """Scene::sample_emitter_direction (scene.cpp:169-215): uniform pick,
    per-kind direction sample, shadow ray. Returns (ds, weight) with the pick
    pmf folded into weight (weight = value / (ds.pdf * pmf) for non-delta;
    value already divided by pdf in kind samplers where noted)."""
    cfg = scene.config
    n_em = cfg.n_emitters
    batch = si.t.shape
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    if n_em == 0:
        ds = DirectionSample(
            p=jnp.zeros(batch + (3,)), n=jnp.zeros(batch + (3,)),
            uv=jnp.zeros(batch + (2,)), d=jnp.zeros(batch + (3,)),
            dist=jnp.zeros(batch), pdf=jnp.zeros(batch),
            delta=jnp.zeros(batch, bool),
            emitter_index=jnp.full(batch, -1, jnp.int32))
        return ds, jnp.zeros(batch + (nc,))

    idx = jnp.minimum((s_pick * n_em).astype(jnp.int32), n_em - 1)
    kind_id = scene.emitter_kind[idx]
    slot = scene.emitter_slot[idx]

    ds = None
    value = jnp.zeros(batch + (nc,))
    for k, kind in enumerate(cfg.emitter_kinds):
        m = active & (kind_id == k)
        d_k, v_k = KIND_SAMPLERS[kind](scene, scene.emitters[kind], slot,
                                       si.p, si.wavelengths, s1, s2, m)
        if kind == "area":
            # convert to weight = value / pdf
            v_k = jnp.where(d_k.pdf[..., None] > 0,
                            v_k / jnp.maximum(d_k.pdf[..., None], 1e-20), 0.0)
        if ds is None:
            ds, value = d_k, jnp.where(m[..., None], v_k, 0.0)
        else:
            sel = lambda a, b: jnp.where(m[..., None] if b.ndim > m.ndim else m, a, b)
            ds = DirectionSample(
                p=sel(d_k.p, ds.p), n=sel(d_k.n, ds.n), uv=sel(d_k.uv, ds.uv),
                d=sel(d_k.d, ds.d), dist=sel(d_k.dist, ds.dist),
                pdf=sel(d_k.pdf, ds.pdf), delta=sel(d_k.delta, ds.delta),
                emitter_index=ds.emitter_index)
            value = jnp.where(m[..., None], v_k, value)

    pick_pmf = 1.0 / n_em
    ds = ds.replace(pdf=ds.pdf * pick_pmf, emitter_index=idx)
    value = value * n_em

    if test_visibility:
        shadow_ray, _dist = si.spawn_ray_to(ds.p)
        occluded = ray_test(scene.geo, shadow_ray)
        value = jnp.where((active & ~occluded)[..., None], value, 0.0)
    else:
        value = jnp.where(active[..., None], value, 0.0)
    return ds, value


def pdf_emitter_direction(scene, ref_p, si_hit, escaped, active):
    """Solid-angle pdf that sample_emitter_direction would have produced the
    direction that hit ``si_hit`` (or escaped to the environment) — used for
    MIS on BSDF-sampled rays (scene.cpp pdf_emitter_direction)."""
    cfg = scene.config
    n_em = cfg.n_emitters
    if n_em == 0:
        return jnp.zeros(ref_p.shape[:-1])
    pdf = jnp.zeros(ref_p.shape[:-1])
    # area emitter hit
    if "area" in cfg.emitter_kinds:
        em_idx = scene.shape_emitter[jnp.maximum(si_hit.shape_index, 0)]
        has = active & si_hit.is_valid & (em_idx >= 0)
        params = scene.emitters["area"]
        slot = scene.emitter_slot[jnp.maximum(em_idx, 0)]
        p_area = area_pdf_direction(scene, params, slot, ref_p, si_hit.p,
                                    si_hit.n, has)
        pdf = jnp.where(has, p_area, pdf)
    # environment
    if cfg.env_emitter >= 0:
        m = active & escaped
        pdf = jnp.where(m, warp.INV_FOUR_PI, pdf)
    return pdf / n_em


def eval_emitter_hit(scene, si, active):
    """Radiance emitted toward the viewer at a surface hit (area emitters)."""
    cfg = scene.config
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.zeros(si.t.shape + (nc,))
    if "area" not in cfg.emitter_kinds:
        return out
    em_idx = scene.shape_emitter[jnp.maximum(si.shape_index, 0)]
    has = active & si.is_valid & (em_idx >= 0)
    slot = scene.emitter_slot[jnp.maximum(em_idx, 0)]
    v = area_eval(scene, scene.emitters["area"], slot, si, has)
    return jnp.where(has[..., None], v, out)


def eval_environment(scene, ray, escaped, active):
    """Environment radiance for escaped rays (constant emitter)."""
    cfg = scene.config
    nc = ray.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.zeros(ray.o.shape[:-1] + (nc,))
    if cfg.env_emitter < 0:
        return out
    slot = scene.emitter_slot[cfg.env_emitter]
    m = active & escaped
    v = constant_eval(scene, scene.emitters["constant"],
                      jnp.full(ray.o.shape[:-1], slot, jnp.int32),
                      jnp.zeros(ray.o.shape[:-1] + (2,)), ray.wavelengths, m)
    return jnp.where(m[..., None], v, out)
