"""Emitter plugins and scene-level emitter sampling.

Counterparts of include/mitsuba/render/{endpoint,emitter}.h and src/emitters.
Scene-level sampling follows Scene::sample_emitter_direction (scene.cpp:169-215):
uniform emitter pick -> per-kind sample_direction -> shadow-ray visibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import warp
from ..core.frame import Frame
from ..core.gather import table_gather as _tg
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
    v = _tex(scene, _tg(params["radiance"], slot), si.uv, si.wavelengths, active)
    return jnp.where((active & front)[..., None], v, 0.0)


def area_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    shape_idx = _tg(params["shape"], slot)
    ps = shape_sampling.sample_position(scene, shape_idx, s1, s2, active)
    delta = ps.p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    dist = jnp.sqrt(dist2)
    d = delta / dist[..., None]
    cos_em = dot(ps.n, -d)
    front = cos_em > 1e-7
    pdf_sa = ps.pdf * dist2 / jnp.maximum(jnp.abs(cos_em), 1e-20)
    value = _tex(scene, _tg(params["radiance"], slot), ps.uv, wavelengths, active)
    value = jnp.where((active & front)[..., None], value, 0.0)
    pdf_sa = jnp.where(front, pdf_sa, 0.0)
    ds = DirectionSample(p=ps.p, n=ps.n, uv=ps.uv, d=d, dist=dist, pdf=pdf_sa,
                         delta=jnp.zeros_like(front),
                         emitter_index=jnp.zeros(dist.shape, jnp.int32))
    return ds, value


def area_pdf_direction(scene, params, slot, ref_p, ds_p, ds_n, active):
    shape_idx = _tg(params["shape"], slot)
    delta = ds_p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    d = delta / jnp.sqrt(dist2)[..., None]
    cos_em = jnp.abs(dot(ds_n, -d))
    pdf = shape_sampling.pdf_position(scene, shape_idx) * dist2 / jnp.maximum(cos_em, 1e-20)
    return jnp.where(active & (cos_em > 1e-7), pdf, 0.0)


def constant_eval(scene, params, slot, uv, wavelengths, active):
    return _tex(scene, _tg(params["radiance"], slot), uv, wavelengths, active)


def constant_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    d = warp.square_to_uniform_sphere(s2)
    pdf = warp.square_to_uniform_sphere_pdf(d)
    r = 2.0 * scene.bsphere_radius
    p = ref_p + d * r
    value = _tex(scene, _tg(params["radiance"], slot), s2, wavelengths, active)
    ds = DirectionSample(p=p, n=-d, uv=s2, d=d, dist=jnp.full(pdf.shape, r),
                         pdf=pdf, delta=jnp.zeros(pdf.shape, bool),
                         emitter_index=jnp.zeros(pdf.shape, jnp.int32))
    return ds, value / pdf[..., None]


def point_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    p = _tg(params["position"], slot)
    delta = p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    dist = jnp.sqrt(dist2)
    d = delta / dist[..., None]
    value = _tex(scene, _tg(params["intensity"], slot),
                 jnp.zeros(dist.shape + (2,)), wavelengths, active) / dist2[..., None]
    ds = DirectionSample(p=p, n=-d, uv=jnp.zeros(dist.shape + (2,)), d=d,
                         dist=dist, pdf=jnp.ones_like(dist),
                         delta=jnp.ones(dist.shape, bool),
                         emitter_index=jnp.zeros(dist.shape, jnp.int32))
    return ds, value


def directional_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    d_emit = normalize(_tg(params["direction"], slot))  # direction light travels
    d = -d_emit
    r = 2.0 * scene.bsphere_radius
    value = _tex(scene, _tg(params["irradiance"], slot),
                 jnp.zeros(d.shape[:-1] + (2,)), wavelengths, active)
    ds = DirectionSample(p=ref_p + d * r, n=d_emit,
                         uv=jnp.zeros(d.shape[:-1] + (2,)), d=d,
                         dist=jnp.full(d.shape[:-1], r),
                         pdf=jnp.ones(d.shape[:-1]),
                         delta=jnp.ones(d.shape[:-1], bool),
                         emitter_index=jnp.zeros(d.shape[:-1], jnp.int32))
    return ds, value


def spot_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2, active):
    """src/emitters/spot.cpp — cone spotlight with linear falloff between
    beam and cutoff angles; delta position."""
    p = _tg(params["position"], slot)
    delta = p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    dist = jnp.sqrt(dist2)
    d = delta / dist[..., None]
    # angle between the spot axis and the direction toward ref
    axis = normalize(_tg(params["direction"], slot))
    cos_a = dot(axis, -d)
    ccut = _tg(params["cos_cutoff"], slot)
    cbeam = _tg(params["cos_beam"], slot)
    falloff = jnp.clip((cos_a - ccut) / jnp.maximum(cbeam - ccut, 1e-6),
                       0.0, 1.0)
    value = _tex(scene, _tg(params["intensity"], slot),
                 jnp.zeros(dist.shape + (2,)), wavelengths, active)
    value = value * (falloff / dist2)[..., None]
    ds = DirectionSample(p=p, n=-d, uv=jnp.zeros(dist.shape + (2,)), d=d,
                         dist=dist, pdf=jnp.ones_like(dist),
                         delta=jnp.ones(dist.shape, bool),
                         emitter_index=jnp.zeros(dist.shape, jnp.int32))
    return ds, value


def projector_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2,
                               active):
    """src/emitters/projector.cpp — perspective image projection from a
    delta position; the texture uv comes from projecting the direction
    through the projector's frustum."""
    from ..core.transform import Transform

    p = _tg(params["position"], slot)
    delta = p - ref_p
    dist2 = jnp.maximum(jnp.sum(delta * delta, -1), 1e-20)
    dist = jnp.sqrt(dist2)
    d = delta / dist[..., None]
    # direction from projector toward ref in the projector frame (+z fwd)
    w2l = Transform(m=_tg(params["w2l_m"], slot), inv_t=_tg(params["w2l_it"], slot))
    d_loc = w2l.transform_vector(-d)
    tan_x = _tg(params["tan_half_fov"], slot)
    aspect = _tg(params["aspect"], slot)
    z = jnp.maximum(d_loc[..., 2], 1e-6)
    # sample mapping shared with perspective (sensor.h:196-230): the
    # camera_to_sample chain mirrors x, so u = (1 - x_ndc)/2
    u = 0.5 * (1.0 - d_loc[..., 0] / (z * tan_x))
    v = 0.5 * (1.0 - d_loc[..., 1] / (z * tan_x * aspect))
    inside = (d_loc[..., 2] > 0) & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    uv = jnp.stack([u, v], -1)
    value = _tex(scene, _tg(params["irradiance"], slot), uv, wavelengths,
                 active & inside)
    value = jnp.where((active & inside)[..., None], value / dist2[..., None],
                      0.0)
    ds = DirectionSample(p=p, n=-d, uv=uv, d=d, dist=dist,
                         pdf=jnp.ones_like(dist),
                         delta=jnp.ones(dist.shape, bool),
                         emitter_index=jnp.zeros(dist.shape, jnp.int32))
    return ds, value


# --- envmap (src/emitters/envmap.cpp): lat-long bitmap with 2D importance ----
#
# Direction convention — the reference's y-up lat-long mapping
# (envmap.cpp:142-143,162-166): u = atan2(x, -z) / 2pi, v = acos(y) / pi in
# emitter-local space, so an identity-to_world envmap reads the SAME texels
# as the reference (theta from +y; u=0 faces -z). Sampling inverts a
# (sin-theta * luminance)-weighted row/column CDF pair — the flat-array
# equivalent of Hierarchical2D (distr_2d.h:18-57).

def _envmap_dir_to_uv(params, slot, d):
    from ..core.transform import Transform
    w2l = Transform(m=_tg(params["w2l_m"], slot), inv_t=_tg(params["w2l_it"], slot))
    dl = normalize(w2l.transform_vector(d))
    theta = jnp.arccos(jnp.clip(dl[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(dl[..., 0], -dl[..., 2])
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    return jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], -1), theta


def _envmap_uv_to_dir(params, slot, uv):
    from ..core.transform import Transform
    phi = uv[..., 0] * 2 * jnp.pi
    theta = uv[..., 1] * jnp.pi
    st = jnp.sin(theta)
    # inverse of (atan2(x, -z), acos(y)): sphdir in the y-up frame
    dl = jnp.stack([st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)],
                   -1)
    w2l = Transform(m=_tg(params["w2l_m"], slot), inv_t=_tg(params["w2l_it"], slot))
    return normalize(w2l.inverse().transform_vector(dl)), theta


def _envmap_bilinear(params, slot, uv, wavelengths, nc):
    # vertex-aligned bilinear (envmap.cpp convention): texels are vertex
    # samples; the stored image carries a duplicated wrap column so
    # u in [0,1] spans the azimuth seam and v in [0,1] spans pole to pole
    img = _tg(params["image"], slot)  # (H, W+1, 3)
    H, W = img.shape[-3], img.shape[-2]
    u = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)
    v = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)
    x0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    x1 = x0 + 1
    y1 = y0 + 1
    fx = jnp.clip(u - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(v - y0, 0.0, 1.0)[..., None]
    if img.ndim == 3:  # single slot selected per lane
        gather = lambda y, x: img[y, x]
    else:
        gather = lambda y, x: img[jnp.arange(img.shape[0]), y, x]
    if "spec_coeff" in params:  # spectral variants (build-time static)
        # rgb2spec upsampling (envmap.cpp:69-89): bilinear interp of the
        # per-texel sigmoid-poly coeffs + brightness scale, evaluated at
        # the ray's hero wavelengths
        from ..render.texture import srgb_model_eval

        cf = _tg(params["spec_coeff"], slot)
        sc = _tg(params["spec_scale"], slot)
        if cf.ndim == 3:
            gc = lambda y, x: cf[y, x]
            gs = lambda y, x: sc[y, x]
        else:
            ar = jnp.arange(cf.shape[0])
            gc = lambda y, x: cf[ar, y, x]
            gs = lambda y, x: sc[ar, y, x]
        fx1 = fx[..., 0]
        fy1 = fy[..., 0]
        coeff = (gc(y0, x0) * (1 - fx) * (1 - fy) + gc(y0, x1) * fx * (1 - fy)
                 + gc(y1, x0) * (1 - fx) * fy + gc(y1, x1) * fx * fy)
        s = (gs(y0, x0) * (1 - fx1) * (1 - fy1) + gs(y0, x1) * fx1 * (1 - fy1)
             + gs(y1, x0) * (1 - fx1) * fy1 + gs(y1, x1) * fx1 * fy1)
        return (srgb_model_eval(coeff, wavelengths)
                * (s * _tg(params["scale"], slot))[..., None])
    c = (gather(y0, x0) * (1 - fx) * (1 - fy) + gather(y0, x1) * fx * (1 - fy)
         + gather(y1, x0) * (1 - fx) * fy + gather(y1, x1) * fx * fy)
    rgb = c * _tg(params["scale"], slot)[..., None]
    if nc == 3:
        return rgb
    return jnp.mean(rgb, -1, keepdims=True)  # mono


def envmap_eval(scene, params, slot, d, wavelengths, active):
    nc = wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    uv, _theta = _envmap_dir_to_uv(params, slot, d)
    v = _envmap_bilinear(params, slot, uv, wavelengths, nc)
    return jnp.where(active[..., None], v, 0.0)


def envmap_pdf_direction(scene, params, slot, d, active):
    """Hierarchical2D bilinear density / spherical Jacobian
    (envmap.cpp:205-207: warp.eval(uv) / (2 pi^2 sin theta))."""
    from ..core.hierarchical2d import h2d_pdf

    uv, theta = _envmap_dir_to_uv(params, slot, d)
    p = h2d_pdf(params, slot, uv, prefix="h2d_")
    st = jnp.maximum(jnp.sin(theta), 1e-6)
    pdf = p / (2.0 * jnp.pi * jnp.pi * st)
    return jnp.where(active, pdf, 0.0)


def envmap_sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2,
                            active):
    """Hierarchical2D mip warp (envmap.cpp:160-180): uv sampled with density
    proportional to the bilinearly-interpolated sin-weighted luminance, so
    value/pdf is exactly the color/luminance ratio — bounded even for a
    single hot sun texel."""
    from ..core.hierarchical2d import h2d_sample

    uv, p2 = h2d_sample(params, slot, s2, prefix="h2d_")
    d, theta = _envmap_uv_to_dir(params, slot, uv)
    st = jnp.maximum(jnp.sin(theta), 1e-6)
    pdf = jnp.where(p2 > 0, p2 / (2.0 * jnp.pi * jnp.pi * st), 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    nc = wavelengths.shape[-1] if scene.config.variant.is_spectral \
        else scene.config.variant.n_channels
    value = _envmap_bilinear(params, slot, uv, wavelengths, nc)
    value = jnp.where((active & (pdf > 0))[..., None],
                      value / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    r = 2.0 * scene.bsphere_radius
    ds = DirectionSample(p=ref_p + d * r, n=-d, uv=uv, d=d,
                         dist=jnp.full(pdf.shape, r), pdf=pdf,
                         delta=jnp.zeros(pdf.shape, bool),
                         emitter_index=jnp.zeros(pdf.shape, jnp.int32))
    return ds, value


KIND_SAMPLERS = {
    "area": area_sample_direction,
    "constant": constant_sample_direction,
    "point": point_sample_direction,
    "directional": directional_sample_direction,
    "spot": spot_sample_direction,
    "projector": projector_sample_direction,
    "envmap": envmap_sample_direction,
}

# User-registered emitter kinds (register_emitter — the trampoline analog,
# integrator_v.cpp:167 pattern applied to emitters).
CUSTOM = {}


def register_emitter(name, module):
    """Extension hook for user-defined *NEE-sampled* emitters (the point/
    spot/directional family: delta or finite-direction emitters picked up by
    next-event estimation; emitters needing ray-hit or escaped-ray eval —
    the area/envmap family — are structural and not registrable).

    ``module`` must provide:

      build(props, builder) -> row dict    (scene-build time, NumPy; use
                                            builder.texture/spectrum for
                                            radiometric values)
      sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2,
                       active) -> (DirectionSample, value)
        value = radiance/intensity with any finite pdf already divided out
        (the point_sample_direction contract); ds.delta marks delta
        directions; ds.pdf is the solid-angle density (0 for delta).
    """
    CUSTOM[name] = module
    KIND_SAMPLERS[name] = module.sample_direction


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
    kind_id = _tg(scene.emitter_kind, idx)
    slot = _tg(scene.emitter_slot, idx)

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


def pdf_emitter_direction(scene, ref_p, si_hit, escaped, active, d=None):
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
        em_idx = _tg(scene.shape_emitter, jnp.maximum(si_hit.shape_index, 0))
        has = active & si_hit.is_valid & (em_idx >= 0)
        params = scene.emitters["area"]
        slot = _tg(scene.emitter_slot, jnp.maximum(em_idx, 0))
        p_area = area_pdf_direction(scene, params, slot, ref_p, si_hit.p,
                                    si_hit.n, has)
        pdf = jnp.where(has, p_area, pdf)
    # environment
    if cfg.env_emitter >= 0:
        m = active & escaped
        if "envmap" in cfg.emitter_kinds and d is not None:
            slot = scene.emitter_slot[cfg.env_emitter]
            # si_hit is invalid for escaped rays; the ray direction d is the
            # query (passed by the integrators for exactly this case)
            p_env = envmap_pdf_direction(
                scene, scene.emitters["envmap"],
                jnp.full(ref_p.shape[:-1], slot, jnp.int32), d, m)
            pdf = jnp.where(m, p_env, pdf)
        else:
            pdf = jnp.where(m, warp.INV_FOUR_PI, pdf)
    return pdf / n_em


def eval_emitter_hit(scene, si, active):
    """Radiance emitted toward the viewer at a surface hit (area emitters)."""
    cfg = scene.config
    nc = si.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.zeros(si.t.shape + (nc,))
    if "area" not in cfg.emitter_kinds:
        return out
    em_idx = _tg(scene.shape_emitter, jnp.maximum(si.shape_index, 0))
    has = active & si.is_valid & (em_idx >= 0)
    slot = _tg(scene.emitter_slot, jnp.maximum(em_idx, 0))
    v = area_eval(scene, scene.emitters["area"], slot, si, has)
    return jnp.where(has[..., None], v, out)


def eval_environment(scene, ray, escaped, active):
    """Environment radiance for escaped rays (constant / envmap emitter)."""
    cfg = scene.config
    nc = ray.wavelengths.shape[-1] if cfg.variant.is_spectral else cfg.variant.n_channels
    out = jnp.zeros(ray.o.shape[:-1] + (nc,))
    if cfg.env_emitter < 0:
        return out
    slot_full = jnp.full(ray.o.shape[:-1],
                         scene.emitter_slot[cfg.env_emitter], jnp.int32)
    m = active & escaped
    if "envmap" in cfg.emitter_kinds:
        v = envmap_eval(scene, scene.emitters["envmap"], slot_full, ray.d,
                        ray.wavelengths, m)
    else:
        v = constant_eval(scene, scene.emitters["constant"], slot_full,
                          jnp.zeros(ray.o.shape[:-1] + (2,)),
                          ray.wavelengths, m)
    return jnp.where(m[..., None], v, out)


# =============================================================================
# Endpoint::sample_ray — emission-ray sampling (endpoint.h:42-118)
# =============================================================================
# Per-kind analogs of the reference's Emitter::sample_ray: draw a ray leaving
# the emitter plus its importance weight (spectral sample weight included in
# spectral mode). No in-tree integrator emits rays (the reference's consumer,
# a particle tracer, was never merged — projector.cpp:117 TODO), but the API
# is first-class reference surface and the entry point for light tracing.


def _sample_wl(scene, tex_idx, uv, wl_sample, active):
    """Spectral mode: importance-sample the emitter's radiometric texture
    spectrum (Texture::sample_spectrum, the area.cpp:107-113 branch);
    rgb/mono: empty wavelength vector, weight = plain eval."""
    if scene.config.variant.is_spectral:
        from ..render.texture import texture_sample_spectrum
        return texture_sample_spectrum(scene, tex_idx, uv, wl_sample, active)
    wl = jnp.zeros(uv.shape[:-1] + (0,))
    return wl, _tex(scene, tex_idx, uv, wl, active)


def area_sample_ray(scene, params, slot, wl_s, s_a, s_b, s_c, time, active):
    """area.cpp:74-119: shape-area position + cosine-hemisphere direction;
    weight = spectrum_weight * pi / p_area. (The reference importance-samples
    the radiance texture's sample_position only when spatially varying — a
    variance trade; area-uniform sampling is unbiased either way.)"""
    shape_idx = _tg(params["shape"], slot)
    ps = shape_sampling.sample_position(scene, shape_idx, s_a, s_b, active)
    wl, spec = _sample_wl(scene, _tg(params["radiance"], slot), ps.uv,
                          wl_s, active)
    d = Frame.from_normal(ps.n).to_world(warp.square_to_cosine_hemisphere(s_c))
    w = spec * (jnp.pi / jnp.maximum(ps.pdf, 1e-20))[..., None]
    return Ray.make(ps.p, d, time=time, wavelengths=wl), w


def constant_sample_ray(scene, params, slot, wl_s, s_a, s_b, s_c, time,
                        active):
    """constant.cpp:60-79: position uniform on the scene bounding sphere,
    inward cosine direction; weight = spec * 4 * (pi * R)^2."""
    uv0 = jnp.zeros(slot.shape + (2,))
    wl, spec = _sample_wl(scene, _tg(params["radiance"], slot), uv0,
                          wl_s, active)
    v0 = warp.square_to_uniform_sphere(s_b)
    r = scene.bsphere_radius
    o = scene.bsphere_center + v0 * r
    d = Frame.from_normal(-v0).to_world(warp.square_to_cosine_hemisphere(s_c))
    w = spec * (4.0 * (jnp.pi * r) ** 2)
    return Ray.make(o, d, time=time, wavelengths=wl), w


def point_sample_ray(scene, params, slot, wl_s, s_a, s_b, s_c, time, active):
    """point.cpp:60-78: uniform-sphere direction, weight = 4*pi*intensity."""
    uv0 = jnp.zeros(slot.shape + (2,))
    wl, spec = _sample_wl(scene, _tg(params["intensity"], slot), uv0,
                          wl_s, active)
    d = warp.square_to_uniform_sphere(s_b)
    o = jnp.broadcast_to(_tg(params["position"], slot), d.shape)
    return Ray.make(o, d, time=time, wavelengths=wl), spec * (4.0 * jnp.pi)


def directional_sample_ray(scene, params, slot, wl_s, s_a, s_b, s_c, time,
                           active):
    """directional.cpp:80-106: origin on the bounding-sphere cross-section
    disk upwind of the scene, fixed direction; weight = pi * R^2 * E."""
    uv0 = jnp.zeros(slot.shape + (2,))
    wl, spec = _sample_wl(scene, _tg(params["irradiance"], slot), uv0,
                          wl_s, active)
    d = normalize(_tg(params["direction"], slot))
    off = warp.square_to_uniform_disk_concentric(s_b)
    fr = Frame.from_normal(d)
    perp = fr.s * off[..., 0:1] + fr.t * off[..., 1:2]
    r = scene.bsphere_radius
    o = scene.bsphere_center + (perp - d) * r
    return Ray.make(o, d, time=time, wavelengths=wl), \
        spec * (jnp.pi * r ** 2)


def spot_sample_ray(scene, params, slot, wl_s, s_a, s_b, s_c, time, active):
    """spot.cpp:117-137: direction uniform in the cutoff cone; weight =
    intensity * falloff / pdf_cone."""
    uv0 = jnp.zeros(slot.shape + (2,))
    wl, spec = _sample_wl(scene, _tg(params["intensity"], slot), uv0,
                          wl_s, active)
    axis = normalize(_tg(params["direction"], slot))
    ccut = _tg(params["cos_cutoff"], slot)
    cbeam = _tg(params["cos_beam"], slot)
    local = warp.square_to_uniform_cone(s_b, ccut)
    pdf = warp.square_to_uniform_cone_pdf(local, ccut)
    d = Frame.from_normal(axis).to_world(local)
    falloff = jnp.clip((local[..., 2] - ccut)
                       / jnp.maximum(cbeam - ccut, 1e-6), 0.0, 1.0)
    o = jnp.broadcast_to(_tg(params["position"], slot), d.shape)
    w = spec * (falloff / jnp.maximum(pdf, 1e-20))[..., None]
    return Ray.make(o, d, time=time, wavelengths=wl), w


def projector_sample_ray(scene, params, slot, wl_s, s_a, s_b, s_c, time,
                         active):
    """projector.cpp:117-152: sample a film uv, shoot through the frustum.
    The uv is drawn uniformly (pdf = 1 over [0,1]^2) where the reference
    importance-samples the irradiance texture — same estimator, different
    variance, on a path the reference itself marks untested."""
    uv = s_c
    wl, spec = _sample_wl(scene, _tg(params["irradiance"], slot), uv,
                          wl_s, active)
    tan_x = _tg(params["tan_half_fov"], slot)
    aspect = _tg(params["aspect"], slot)
    d_loc = jnp.stack([(1.0 - 2.0 * uv[..., 0]) * tan_x,
                       (1.0 - 2.0 * uv[..., 1]) * tan_x * aspect,
                       jnp.ones(uv.shape[:-1])], -1)
    # local->world rotation = inverse of the stored world->local matrix
    l2w = jnp.linalg.inv(_tg(params["w2l_m"], slot))
    d = normalize(jnp.einsum("...ij,...j->...i", l2w[..., :3, :3], d_loc))
    o = jnp.broadcast_to(_tg(params["position"], slot), d.shape)
    return Ray.make(o, d, time=time, wavelengths=wl), spec


KIND_RAY_SAMPLERS = {
    "area": area_sample_ray,
    "constant": constant_sample_ray,
    "point": point_sample_ray,
    "directional": directional_sample_ray,
    "spot": spot_sample_ray,
    "projector": projector_sample_ray,
    # envmap: the reference itself throws (envmap.cpp:149-154)
}


def sample_emitter_ray(scene, sampler, time, active=True):
    """Wavefront emission-ray dispatch: uniform emitter pick x per-kind
    Endpoint::sample_ray; the pick pmf is folded into the weight. Returns
    (ray, weight, emitter_index, sampler). Raises for scenes containing
    emitter kinds without a ray sampler (envmap matches the reference's
    NotImplementedError)."""
    cfg = scene.config
    n_em = cfg.n_emitters
    assert n_em > 0, "sample_emitter_ray: scene has no emitters"
    for kind in cfg.emitter_kinds:
        if kind not in KIND_RAY_SAMPLERS:
            raise NotImplementedError(
                f"sample_ray for emitter kind {kind!r} "
                "(envmap.cpp:149-154 matches)")

    sampler, s_pick = sampler.next_1d()
    sampler, wl_s = sampler.next_1d()
    sampler, s_a = sampler.next_1d()
    sampler, s_b = sampler.next_2d()
    sampler, s_c = sampler.next_2d()
    idx = jnp.minimum((s_pick * n_em).astype(jnp.int32), n_em - 1)
    kind_id = _tg(scene.emitter_kind, idx)
    slot = _tg(scene.emitter_slot, idx)
    batch = idx.shape
    active = jnp.broadcast_to(jnp.asarray(active), batch)

    nw = 4 if cfg.variant.is_spectral else 0
    nc = nw if cfg.variant.is_spectral else cfg.variant.n_channels
    ray = Ray.make(jnp.zeros(batch + (3,)),
                   jnp.zeros(batch + (3,)).at[..., 2].set(1.0),
                   time=time, wavelengths=jnp.zeros(batch + (nw,)))
    weight = jnp.zeros(batch + (nc,))
    for k, kind in enumerate(cfg.emitter_kinds):
        m = active & (kind_id == k)
        r_k, w_k = KIND_RAY_SAMPLERS[kind](
            scene, scene.emitters[kind], slot, wl_s, s_a, s_b, s_c, time, m)
        mv = m[..., None]
        ray = Ray(o=jnp.where(mv, r_k.o, ray.o),
                  d=jnp.where(mv, r_k.d, ray.d),
                  mint=jnp.where(m, r_k.mint, ray.mint),
                  maxt=jnp.where(m, r_k.maxt, ray.maxt),
                  time=ray.time,
                  wavelengths=jnp.where(mv if nw else m[..., None],
                                        r_k.wavelengths, ray.wavelengths))
        weight = jnp.where(mv, w_k * n_em, weight)
    weight = jnp.where(active[..., None], weight, 0.0)
    return ray, weight, idx, sampler
