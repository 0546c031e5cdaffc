"""AOV wrapper integrator (reference: src/integrators/aov.cpp:65-99).

Wraps a child integrator and appends arbitrary-output-variable channels to
the film. AOV spec string: "name:type,name:type,..." with types
depth | position | uv | geo_normal | sh_normal | prim_index | shape_index.
The child integrator runs as usual; AOVs come from the camera-ray hit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..render.geometry import ray_intersect

_TYPE_CHANNELS = {
    "depth": 1, "position": 3, "uv": 2, "geo_normal": 3, "sh_normal": 3,
    "prim_index": 1, "shape_index": 1, "duv_dx": 2, "duv_dy": 2,
}


def parse_aovs(cfg):
    """[(name, type), ...] from the integrator config's extra tuple."""
    extra = dict(cfg.integrator.extra)
    spec = extra.get("aovs", "")
    out = []
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        name, ty = part.split(":")
        assert ty in _TYPE_CHANNELS, f"unknown aov type {ty!r}"
        out.append((name.strip(), ty.strip()))
    return out


def aov_names(cfg):
    names = []
    for name, ty in parse_aovs(cfg):
        n = _TYPE_CHANNELS[ty]
        if n == 1:
            names.append(name)
        else:
            names += [f"{name}.{c}" for c in "xyzw"[:n]]
    return names


def n_aov(cfg):
    return sum(_TYPE_CHANNELS[ty] for _, ty in parse_aovs(cfg))


def _child(cfg):
    from . import REGISTRY
    extra = dict(cfg.integrator.extra)
    return REGISTRY[extra.get("child", "path")]


def sample(scene, sampler, ray, active=None):
    cfg = scene.config
    return _child(cfg).sample(scene, sampler, ray, active)


def needs_differentials(cfg):
    """True when the AOV spec asks for screen-space UV partials — the
    driver then generates offset camera rays (bsdf.h:493-494 analog; no
    bundled BSDF sets NeedsDifferentials, so the aov integrator is the
    reference's only in-tree consumer, aov.cpp:124,212-213)."""
    return any(ty in ("duv_dx", "duv_dy") for _, ty in parse_aovs(cfg))


def _aov_columns(cfg, si, duv, spec_shape):
    """Assemble the AOV channel block from the camera-ray hit (shared by
    the scan driver's sample_aov and the regen driver's refill hook)."""
    cols = []
    for _name, ty in parse_aovs(cfg):
        if ty == "depth":
            cols.append(jnp.where(si.is_valid, si.t, 0.0)[..., None])
        elif ty == "position":
            cols.append(jnp.where(si.is_valid[..., None], si.p, 0.0))
        elif ty == "uv":
            cols.append(jnp.where(si.is_valid[..., None], si.uv, 0.0))
        elif ty == "geo_normal":
            cols.append(jnp.where(si.is_valid[..., None], si.n, 0.0))
        elif ty == "sh_normal":
            cols.append(jnp.where(si.is_valid[..., None], si.sh_frame.n, 0.0))
        elif ty == "prim_index":
            cols.append(si.prim_index.astype(jnp.float32)[..., None])
        elif ty == "shape_index":
            cols.append(si.shape_index.astype(jnp.float32)[..., None])
        elif ty in ("duv_dx", "duv_dy"):
            assert duv is not None, \
                "duv aovs need the differential ray path (driver bug)"
            part = duv[0] if ty == "duv_dx" else duv[1]
            cols.append(jnp.where(si.is_valid[..., None], part, 0.0))
    return (jnp.concatenate(cols, -1) if cols
            else jnp.zeros(spec_shape[:-1] + (0,)))


def sample_aov(scene, sampler, ray, ray_weight, active=None, ray_diff=None):
    cfg = scene.config
    spec, valid, sampler = _child(cfg).sample(scene, sampler, ray, active)
    si = ray_intersect(scene.geo, ray)
    duv = None
    if ray_diff is not None:
        from ..render.records import compute_uv_partials
        duv = compute_uv_partials(si, ray_diff)
    aovs = _aov_columns(cfg, si, duv, spec.shape)
    return spec, valid, sampler, aovs


# --- regen-driver hooks (integrators.render_wavefront_regen) -----------------
# The lane pool bounces the CHILD's state; AOVs come from the camera-ray
# first hit, so they are computed once at lane refill and carried until
# harvest. duv_dx/duv_dy need the differential-ray machinery and keep the
# scan driver (integrators.regen_supported gates on needs_differentials).

def _regen_module(cfg):
    return _child(cfg)


def _refill_aov(scene, ray, active):
    cfg = scene.config
    si = ray_intersect(scene.geo, ray)
    return _aov_columns(cfg, si, None, ray.o.shape[:-1] + (1,))


def _harvest_aov(scene, vp, rw, aov_carry):
    return aov_carry
