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


def _wavelengths(scene, s_wavelength, batch):
    cfg = scene.config
    if cfg.variant.is_spectral:
        wl, weight = sp.sample_wavelength(s_wavelength)
        return wl, weight
    return jnp.zeros(batch + (0,)), jnp.ones(batch + (cfg.variant.n_channels,))


def perspective_sample_ray(scene, params, pos_film, s_aperture, time,
                           s_wavelength):
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
    wl, weight = _wavelengths(scene, s_wavelength, batch)
    ray = Ray.make(o, d, time=time, wavelengths=wl)
    return ray, weight


def thinlens_sample_ray(scene, params, pos_film, s_aperture, time,
                        s_wavelength):
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
    ap = warp.square_to_uniform_disk_concentric(s_aperture) * aperture
    o_cam = jnp.concatenate([ap, jnp.zeros(batch + (1,))], -1)
    d_cam2 = normalize(p_focus - o_cam)
    o = tw.transform_affine_point(o_cam)
    d = tw.transform_vector(d_cam2)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wl, weight = _wavelengths(scene, s_wavelength, batch)
    return Ray.make(o, d, time=time, wavelengths=wl), weight


def radiancemeter_sample_ray(scene, params, pos_film, s_aperture, time,
                             s_wavelength):
    """src/sensors/radiancemeter.cpp — single ray from origin along direction."""
    batch = pos_film.shape[:-1]
    tw: Transform = params["to_world"]
    o = jnp.broadcast_to(tw.translation, batch + (3,))
    d = jnp.broadcast_to(
        normalize(tw.transform_vector(jnp.asarray([0.0, 0.0, 1.0]))), batch + (3,))
    wl, weight = _wavelengths(scene, s_wavelength, batch)
    return Ray.make(o, d, time=time, wavelengths=wl), weight


REGISTRY = {
    "perspective": perspective_sample_ray,
    "thinlens": thinlens_sample_ray,
    "radiancemeter": radiancemeter_sample_ray,
}


def sample_ray(scene, pos_film, s_aperture, time, s_wavelength):
    fn = REGISTRY[scene.config.sensor_kind]
    return fn(scene, scene.sensor, pos_film, s_aperture, time, s_wavelength)
