"""Integrator registry + the wavefront render driver.

Counterpart of SamplingIntegrator::render (src/librender/integrator.cpp):
the GPU wavefront branch (integrator.cpp:140-172) is the design template —
idx -> pixel mapping over the whole film x spp wavefront, multi-pass
accumulation via ``samples_per_pass``, XYZAW film accumulation
(integrator.cpp:233-288).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.rng import Sampler
from .. import sensors
from ..films import N_BASE_CHANNELS, develop, film_put
from . import aov, depth, direct, moment, path, stokes, volpath, volpathmis
from .bins import bins, nbins

REGISTRY = {
    "path": path,
    "direct": direct,
    "depth": depth,
    "volpath": volpath,
    "volpathmis": volpathmis,
    "aov": aov,
    "moment": moment,
    "stokes": stokes,
    "bins": bins,
    "nbins": nbins,
}


def n_aov(cfg):
    mod = REGISTRY[cfg.integrator.kind]
    return mod.n_aov(cfg) if hasattr(mod, "n_aov") else 0


def aov_names(cfg):
    mod = REGISTRY[cfg.integrator.kind]
    return mod.aov_names(cfg) if hasattr(mod, "aov_names") else []


def register_integrator(name, module):
    """User-defined integrators: any module/namespace with
    sample(scene, sampler, ray, active) -> (spec, valid, sampler) — the
    analog of the reference's Python trampoline integrators
    (integrator_v.cpp:24-122)."""
    REGISTRY[name] = module


def render_wavefront(scene, lane_offset, n_lanes, seed, spp):
    """Render one pass of ``n_lanes`` samples starting at global sample index
    ``lane_offset``; returns the partial film (H, W, C). Lanes beyond the
    total wavefront (pad lanes under sharding) are masked out."""
    cfg = scene.config
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    cx, cy = cfg.crop_offset
    total = ch * cw * spp

    lane = lane_offset + jnp.arange(n_lanes, dtype=jnp.uint32)
    lane_ok = lane < total
    lane = jnp.minimum(lane, total - 1)
    pixel = (lane // spp).astype(jnp.uint32)
    px = (pixel % cw).astype(jnp.float32) + cx
    py = (pixel // cw).astype(jnp.float32) + cy

    sampler = Sampler.seed(seed, lane, kind=cfg.sampler_kind, spp=spp)
    sampler, jitter = sampler.next_2d()
    pos = jnp.stack([px, py], -1) + jitter  # continuous pixel coords
    pos_film = pos / jnp.asarray([W, H], jnp.float32)

    time = jnp.zeros(n_lanes)
    ray, ray_weight, sampler = sensors.sample_ray(scene, sampler, pos_film, time)

    integrator = REGISTRY[cfg.integrator.kind]
    extra = n_aov(cfg)
    if extra:
        spec, valid, sampler, aovs = integrator.sample_aov(
            scene, sampler, ray, ray_weight)
    else:
        spec, valid, sampler = integrator.sample(scene, sampler, ray)
        aovs = jnp.zeros(spec.shape[:-1] + (0,))
    spec = spec * ray_weight

    if cfg.variant.is_spectral:
        xyz = sp.spectrum_to_xyz(spec, ray.wavelengths)
    elif cfg.variant.is_monochromatic:
        xyz = jnp.repeat(spec, 3, axis=-1)
    else:
        xyz = sp.srgb_to_xyz(spec)

    values = jnp.concatenate([
        xyz,
        jnp.where(valid, 1.0, 0.0)[..., None],
        jnp.ones((n_lanes, 1)),
        aovs,
    ], axis=-1)
    values = jnp.where(lane_ok[..., None], values, 0.0)

    image = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
    rp = dict(cfg.rfilter_params)
    image = film_put(image, pos - jnp.asarray([cx, cy], jnp.float32),
                     values, cfg.rfilter, rp)
    return image


def render(scene, seed=0, spp=None, samples_per_pass=None, develop_film=True,
           return_aovs=False):
    """Full render: multi-pass wavefront accumulation (integrator.cpp:59-65).

    Returns the developed image (H, W, 3|1); with ``return_aovs=True`` also a
    {name: (H, W) array} dict of the integrator's weight-normalized AOV
    channels (aov.cpp/moment.cpp outputs). ``develop_film=False`` returns the
    raw film instead.
    """
    cfg = scene.config
    spp = spp or cfg.spp
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    total = ch * cw * spp
    if samples_per_pass is None:
        samples_per_pass = min(total, 1 << 22)
    n_passes = -(-total // samples_per_pass)

    extra = n_aov(cfg)
    film = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
    run = jax.jit(render_wavefront, static_argnames=("n_lanes", "spp"))
    for p in range(n_passes):
        off = p * samples_per_pass
        n = min(samples_per_pass, total - off)
        film = film + run(scene, jnp.uint32(off), n, seed, spp)
    if not develop_film:
        return film
    mode = "mono" if cfg.variant.is_monochromatic else "rgb"
    img = develop(film[..., :N_BASE_CHANNELS], mode, cfg.pixel_format)
    if not return_aovs:
        return img
    w = jnp.maximum(film[..., 4:5], 1e-12)
    aov_img = film[..., N_BASE_CHANNELS:] / w
    aovs = {name: aov_img[..., i]
            for i, name in enumerate(aov_names(cfg))}
    return img, aovs
