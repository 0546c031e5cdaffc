"""Sensor plugins.

Counterpart of include/mitsuba/render/sensor.h and src/sensors. Each kind is a
module-level function set; ``sample_ray(scene, params, pos_film, s_aperture,
s_time, s_wavelength)`` maps film-plane positions in [0,1)^2 plus aux samples
to a primary Ray and a spectral importance weight (sensor.cpp:30-80).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.math import normalize
from ..core.ray import Ray
from ..core.transform import Transform


def _wavelengths(scene, sampler, batch):
    cfg = scene.config
    sampler, s_wavelength = sampler.next_1d()
    if cfg.variant.is_spectral:
        wl, weight = sp.sample_wavelength(s_wavelength)
        return wl, weight, sampler
    return (jnp.zeros(batch + (0,)),
            jnp.ones(batch + (cfg.variant.n_channels,)), sampler)


def perspective_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/perspective.cpp — pinhole camera.

    params: to_world Transform (4,4) [single sensor], tan_half_fov_x ().
    Convention: u in [0,1) left->right maps +x; v top->bottom maps -y;
    camera looks down +z (matches Transform.look_at).
    """
    batch = pos_film.shape[:-1]
    tw: Transform = params["to_world"]
    tan_x = params["tan_half_fov"]
    aspect = scene.config.film_height / scene.config.film_width
    x = (2.0 * pos_film[..., 0] - 1.0) * tan_x
    y = (1.0 - 2.0 * pos_film[..., 1]) * tan_x * aspect
    d_cam = normalize(jnp.stack([x, y, jnp.ones_like(x)], -1))
    d = tw.transform_vector(d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(tw.translation, batch + (3,))
    wl, weight, sampler = _wavelengths(scene, sampler, batch)
    ray = Ray.make(o, d, time=time, wavelengths=wl)
    return ray, weight, sampler


def thinlens_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/thinlens.cpp — perspective + finite aperture/focus."""
    from ..core import warp

    batch = pos_film.shape[:-1]
    tw: Transform = params["to_world"]
    tan_x = params["tan_half_fov"]
    aperture = params["aperture_radius"]
    focus = params["focus_distance"]
    aspect = scene.config.film_height / scene.config.film_width
    x = (2.0 * pos_film[..., 0] - 1.0) * tan_x
    y = (1.0 - 2.0 * pos_film[..., 1]) * tan_x * aspect
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
    p_focus = d_cam * (focus / d_cam[..., 2:3])
    sampler, s_aperture = sampler.next_2d()
    ap = warp.square_to_uniform_disk_concentric(s_aperture) * aperture
    o_cam = jnp.concatenate([ap, jnp.zeros(batch + (1,))], -1)
    d_cam2 = normalize(p_focus - o_cam)
    o = tw.transform_affine_point(o_cam)
    d = tw.transform_vector(d_cam2)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wl, weight, sampler = _wavelengths(scene, sampler, batch)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def radiancemeter_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/radiancemeter.cpp — single ray from origin along direction."""
    batch = pos_film.shape[:-1]
    tw: Transform = params["to_world"]
    o = jnp.broadcast_to(tw.translation, batch + (3,))
    d = jnp.broadcast_to(
        normalize(tw.transform_vector(jnp.asarray([0.0, 0.0, 1.0]))), batch + (3,))
    wl, weight, sampler = _wavelengths(scene, sampler, batch)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def distant_sample_ray(scene, params, sampler, pos_film, time):
    """[ERADIATE] src/sensors/distant.cpp:290-385 — records radiance leaving
    the scene along a fixed direction. Default target/origin mode: rays aim
    at the bounding-sphere cross-section perpendicular to the direction and
    start one bounding-sphere radius outside (RayTargetType::None +
    RayOriginType::BoundingSphere). Single-direction films (1x1)."""
    from ..core import warp
    from ..core.math import coordinate_system

    batch = pos_film.shape[:-1]
    d = normalize(params["direction"])
    d = jnp.broadcast_to(d, batch + (3,))
    s, t = coordinate_system(d)
    sampler, s_aperture = sampler.next_2d()
    offset = warp.square_to_uniform_disk_concentric(s_aperture)
    r = scene.bsphere_radius
    target = scene.bsphere_center + (s * offset[..., 0:1]
                                     + t * offset[..., 1:2]) * r
    o = target - d * r
    wl, weight, sampler = _wavelengths(scene, sampler, batch)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def irradiancemeter_sample_ray(scene, params, sampler, pos_film, time):
    """[ERADIATE-adjacent] src/sensors/irradiancemeter.cpp:60-110 — cosine-
    weighted rays from the surface of an attached shape; weight pi converts
    the cosine-hemisphere estimator to irradiance."""
    from ..core import warp
    from ..core.frame import Frame
    from ..render import shape_sampling

    batch = pos_film.shape[:-1]
    shape_idx = jnp.broadcast_to(params["shape"], batch)
    sampler, s_face = sampler.next_1d()
    sampler, s_pos = sampler.next_2d()
    sampler, s_dir = sampler.next_2d()
    ps = shape_sampling.sample_position(scene, shape_idx, s_face, s_pos)
    local = warp.square_to_cosine_hemisphere(s_dir)
    d = Frame.from_normal(ps.n).to_world(local)
    wl, weight, sampler = _wavelengths(scene, sampler, batch)
    return Ray.make(ps.p + ps.n * 1e-4, d, time=time, wavelengths=wl), \
        weight * jnp.pi, sampler


REGISTRY = {
    "perspective": perspective_sample_ray,
    "thinlens": thinlens_sample_ray,
    "radiancemeter": radiancemeter_sample_ray,
    "distant": distant_sample_ray,
    "irradiancemeter": irradiancemeter_sample_ray,
}


def sample_ray(scene, sampler, pos_film, time):
    """Returns (ray, weight, sampler)."""
    fn = REGISTRY[scene.config.sensor_kind]
    return fn(scene, scene.sensor, sampler, pos_film, time)
