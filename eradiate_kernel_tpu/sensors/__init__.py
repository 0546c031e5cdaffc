"""Sensor plugins.

Counterpart of include/mitsuba/render/sensor.h and src/sensors. Each kind is a
module-level function; ``sample_ray(scene, sampler, pos_film, time)`` maps
film-plane positions in [0,1)^2 plus aux samples to a primary Ray and a
spectral importance weight (sensor.cpp:30-80).

The Eradiate suite (distant / mdistant / mradiancemeter / distantflux) records
radiance *leaving* the scene: rays start outside the bounding sphere and
travel along fixed directions. Wavelengths follow the sensor's spectral
response function (``srf``) when one is attached (perspective.cpp:106-180):
hero wavelengths are importance-sampled from the srf and the constant
importance weight equals its integral, so the film records the
srf-convolved radiance.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import spectrum as sp
from ..core import warp
from ..core.math import coordinate_system, normalize
from ..core.ray import Ray
from ..core.transform import Transform


def _sample_srf(params, s):
    """Invert the piecewise-linear srf CDF for stratified hero wavelengths.
    Returns (wavelengths (..., 4), weight (..., 4) = srf integral)."""
    nodes = params["srf_nodes"]      # (K,) wavelengths
    cdf = params["srf_cdf"]          # (K,) normalized CDF, cdf[0]=0, [-1]=1
    integral = params["srf_integral"]  # () integral of srf over wavelength
    ws = sp.sample_shifted(s)        # (..., 4)
    idx = jnp.clip(jnp.searchsorted(cdf, ws, side="right") - 1,
                   0, nodes.shape[0] - 2)
    c0 = cdf[idx]
    c1 = cdf[idx + 1]
    f = (ws - c0) / jnp.maximum(c1 - c0, 1e-12)
    lam = nodes[idx] * (1.0 - f) + nodes[idx + 1] * f
    return lam, jnp.broadcast_to(integral, lam.shape)


def _sample_srf_lines(params, s):
    """Discrete-line srf: hero wavelengths land exactly on the lines
    (discrete.cpp pmf sampling); constant weight = sum of line weights."""
    lines = params["srf_lines"]
    cdf = params["srf_line_cdf"]
    integral = params["srf_integral"]
    ws = sp.sample_shifted(s)
    idx = jnp.clip(jnp.searchsorted(cdf, ws, side="right") - 1,
                   0, lines.shape[0] - 1)
    lam = lines[idx]
    return lam, jnp.broadcast_to(integral, lam.shape)


def _wavelengths(scene, sampler, batch, params=None):
    cfg = scene.config
    sampler, s_wavelength = sampler.next_1d()
    if cfg.variant.is_spectral:
        if params is not None and "srf_lines" in params:
            wl, weight = _sample_srf_lines(params, s_wavelength)
        elif params is not None and "srf_nodes" in params:
            wl, weight = _sample_srf(params, s_wavelength)
        else:
            wl, weight = sp.sample_wavelength(s_wavelength)
        return wl, weight, sampler
    return (jnp.zeros(batch + (0,)),
            jnp.ones(batch + (cfg.variant.n_channels,)), sampler)


def _static(scene, key, default=None):
    return dict(scene.config.sensor_static).get(key, default)


def _sensor_to_world(params, time):
    """Static to_world, or the keyframe interpolation at the (batched) ray
    time when the sensor carries an AnimatedTransform (transform.h:364;
    sensor.cpp evaluates m_to_world at the ray's time)."""
    anim = params.get("to_world_anim")
    if anim is None:
        return params["to_world"]
    return anim.eval(time)


def perspective_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/perspective.cpp — pinhole camera.

    params: to_world Transform (4,4) [single sensor], tan_half_fov_x ().
    Convention (sensor.h:196-230 perspective_projection inverted): film
    u=0 (image left) maps to camera-space +x = the look_at ``left`` axis
    (cross(up, dir)); v top->bottom maps +y->-y; camera looks down +z.
    x_cam = tan * (1 - 2u) — the camera_to_sample chain scale(-0.5,..) o
    translate(-1,..) o perspective carries a sign flip in x.
    """
    batch = pos_film.shape[:-1]
    tw: Transform = _sensor_to_world(params, time)
    tan_x = params["tan_half_fov"]
    aspect = scene.config.film_height / scene.config.film_width
    x = (1.0 - 2.0 * pos_film[..., 0]) * tan_x
    y = (1.0 - 2.0 * pos_film[..., 1]) * tan_x * aspect
    d_cam = normalize(jnp.stack([x, y, jnp.ones_like(x)], -1))
    d = tw.transform_vector(d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(tw.translation, batch + (3,))
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    ray = Ray.make(o, d, time=time, wavelengths=wl)
    return ray, weight, sampler


def thinlens_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/thinlens.cpp — perspective + finite aperture/focus."""
    batch = pos_film.shape[:-1]
    tw: Transform = _sensor_to_world(params, time)
    tan_x = params["tan_half_fov"]
    aperture = params["aperture_radius"]
    focus = params["focus_distance"]
    aspect = scene.config.film_height / scene.config.film_width
    x = (1.0 - 2.0 * pos_film[..., 0]) * tan_x  # see perspective_sample_ray
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
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def radiancemeter_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/radiancemeter.cpp — single ray from origin along direction."""
    batch = pos_film.shape[:-1]
    tw: Transform = _sensor_to_world(params, time)
    o = jnp.broadcast_to(tw.translation, batch + (3,))
    d = jnp.broadcast_to(
        normalize(tw.transform_vector(jnp.asarray([0.0, 0.0, 1.0]))), batch + (3,))
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def mradiancemeter_sample_ray(scene, params, sampler, pos_film, time):
    """[ERADIATE] src/sensors/mradiancemeter.cpp — N independent radiance
    meters, one film pixel each (film = Nx1). params: origins (N, 3),
    directions (N, 3)."""
    batch = pos_film.shape[:-1]
    W = scene.config.film_width
    idx = jnp.clip((pos_film[..., 0] * W).astype(jnp.int32), 0, W - 1)
    o = params["origins"][idx]
    d = normalize(params["directions"][idx])
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def _distant_origin(scene, sampler, d, target_mode, params):
    """Shared distant-ray construction: pick the target point, then start
    upstream of it — one radius for cross-section targets, one diameter for
    point targets (distant.cpp:376-384, mdistant.cpp:244,258;
    RayOriginType::BoundingSphere). Returns (origin, target, sampler)."""
    r = scene.bsphere_radius
    if target_mode == "point":
        target = jnp.broadcast_to(params["target"], d.shape)
        o = target - d * (2.0 * r)
    else:  # 'none': uniform over the bounding-sphere cross-section disk
        s, t = coordinate_system(d)
        sampler, s_aperture = sampler.next_2d()
        offset = warp.square_to_uniform_disk_concentric(s_aperture)
        target = scene.bsphere_center + (s * offset[..., 0:1]
                                         + t * offset[..., 1:2]) * r
        o = target - d * r
    return o, target, sampler


def distant_sample_ray(scene, params, sampler, pos_film, time):
    """[ERADIATE] src/sensors/distant.cpp — records radiance leaving the
    scene along ``direction``; traced rays travel along -direction unless
    ``flip_directions`` (distant.cpp:74-85,314-332).

    Direction mode is picked by the film size (distant.cpp:74-85), with
    v0 in the sensor frame (to_world = look_at(0, direction, up)):
      1x1  single   — v0 = +z
      Nx1  plane    — v0 = (cos(pi u), 0, sin(pi u)) (SampleWidth arc)
      NxM  hemisphere — v0 uniform over the +z hemisphere
    and ray.d = -to_world(v0) (+ if flipped).
    Target: bounding-sphere cross-section ('none', default — the weight
    carries the reference's 1/dot(-d, z_world) normalization,
    distant.cpp:365) or a fixed point (weight 1); origins sit R / 2R
    upstream respectively (distant.cpp:376-384)."""
    batch = pos_film.shape[:-1]
    mode = _static(scene, "direction_mode", "single")
    target_mode = _static(scene, "target_mode", "none")
    sgn = 1.0 if _static(scene, "flip_directions", False) else -1.0
    tw: Transform = params["to_world"]
    if mode == "single":
        v0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                              batch + (3,))
    elif mode == "plane":
        ang = jnp.pi * pos_film[..., 0]
        v0 = jnp.stack([jnp.cos(ang), jnp.zeros_like(ang),
                        jnp.sin(ang)], -1)
    else:  # hemisphere
        v0 = warp.square_to_uniform_hemisphere(pos_film)
    d = normalize(tw.transform_vector(v0)) * sgn
    o, _target, sampler = _distant_origin(scene, sampler, d, target_mode, params)
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    if target_mode == "none":
        # cross-section normalization (distant.cpp:365): divide by the
        # cosine between -d and the world vertical; near-horizontal rays
        # (den -> 0, weight -> inf in the reference) are zeroed instead
        den = -d[..., 2]
        weight = jnp.where(den[..., None] > 1e-6,
                           weight / jnp.maximum(den, 1e-6)[..., None], 0.0)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def mdistant_sample_ray(scene, params, sampler, pos_film, time):
    """[ERADIATE] src/sensors/mdistant.cpp:69-279 — multi-direction distant
    sensor: film pixel x records radiance leaving along directions[x]."""
    batch = pos_film.shape[:-1]
    W = scene.config.film_width
    idx = jnp.clip((pos_film[..., 0] * W).astype(jnp.int32), 0, W - 1)
    d = normalize(params["directions"][idx])
    target_mode = _static(scene, "target_mode", "none")
    o, _target, sampler = _distant_origin(scene, sampler, d, target_mode, params)
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def distantflux_sample_ray(scene, params, sampler, pos_film, time):
    """[ERADIATE] src/sensors/distantflux.cpp:208-226 — hemispherical
    exitant flux.

    The film square is warped UNIFORMLY over the to_world +z hemisphere
    (pixel <-> uniform-warp stratum, matching the reference's film
    layout); ray.d = -to_world(v0), and each sample carries weight
    cos(-d, reference_normal) * 2*pi / (W*H) (= cos / (pdf * n_pixels))
    so the film SUM estimates  F = int L(d) cos(theta) dd."""
    batch = pos_film.shape[:-1]
    tw: Transform = params["to_world"]
    v0 = warp.square_to_uniform_hemisphere(pos_film)
    d = -normalize(tw.transform_vector(v0))
    nrm = normalize(tw.transform_vector(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32)))
    target_mode = _static(scene, "target_mode", "none")
    o, _target, sampler = _distant_origin(scene, sampler, d, target_mode, params)
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    n_pix = scene.config.film_width * scene.config.film_height
    cos_n = jnp.sum(-d * nrm, -1)
    weight = weight * (cos_n * 2.0 * jnp.pi / n_pix)[..., None]
    return Ray.make(o, d, time=time, wavelengths=wl), weight, sampler


def irradiancemeter_sample_ray(scene, params, sampler, pos_film, time):
    """src/sensors/irradiancemeter.cpp:60-110 — cosine-weighted rays from the
    surface of an attached shape; weight pi converts the cosine-hemisphere
    estimator to irradiance."""
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
    wl, weight, sampler = _wavelengths(scene, sampler, batch, params)
    return Ray.make(ps.p + ps.n * 1e-4, d, time=time, wavelengths=wl), \
        weight * jnp.pi, sampler


REGISTRY = {
    "perspective": perspective_sample_ray,
    "thinlens": thinlens_sample_ray,
    "radiancemeter": radiancemeter_sample_ray,
    "mradiancemeter": mradiancemeter_sample_ray,
    "distant": distant_sample_ray,
    "mdistant": mdistant_sample_ray,
    "distantflux": distantflux_sample_ray,
    "irradiancemeter": irradiancemeter_sample_ray,
}


def register_sensor(name, fn):
    """Extension hook (sensor trampoline analog, integrator_v.cpp:167)."""
    REGISTRY[name] = fn


def sample_ray(scene, sampler, pos_film, time):
    """Returns (ray, weight, sampler). Sensors with a shutter interval
    replace the caller's time with a per-lane uniform draw over
    [shutter_open, shutter_close] (sensor.cpp:58-62) — statically gated so
    shutterless scenes keep their RNG streams unchanged."""
    params = scene.sensor
    if "shutter_open" in params:  # presence is a build-time static
        sampler, u = sampler.next_1d()
        time = params["shutter_open"] + u * params["shutter_span"]
    fn = REGISTRY[scene.config.sensor_kind]
    return fn(scene, params, sampler, pos_film, time)


def sample_ray_differential(scene, sampler, pos_film, time, diff_scale=1.0):
    """Sensor::sample_ray_differential (sensor.cpp:59-84): the main ray plus
    two rays re-sampled one film pixel over in x and y. The offset calls
    replay the SAME sampler state as the main ray (the reference passes
    identical sample1/sample3 to all three sample_ray calls), so aperture /
    wavelength / shutter draws match; only the advanced state of the main
    call is kept. Differentials are pre-scaled by ``diff_scale``
    (= 1/sqrt(spp), Ray::scale_differential + integrator.cpp:257-261).

    Returns (ray, RayDifferential, weight, sampler)."""
    from ..render.records import RayDifferential

    cfg = scene.config
    ray, weight, sampler_out = sample_ray(scene, sampler, pos_film, time)
    dx = jnp.asarray([1.0 / cfg.film_width, 0.0], jnp.float32)
    dy = jnp.asarray([0.0, 1.0 / cfg.film_height], jnp.float32)
    ray_x, _, _ = sample_ray(scene, sampler, pos_film + dx, time)
    ray_y, _, _ = sample_ray(scene, sampler, pos_film + dy, time)
    rd = RayDifferential(
        o_x=ray.o + (ray_x.o - ray.o) * diff_scale,
        d_x=ray.d + (ray_x.d - ray.d) * diff_scale,
        o_y=ray.o + (ray_y.o - ray.o) * diff_scale,
        d_y=ray.d + (ray_y.d - ray.d) * diff_scale)
    return ray, rd, weight, sampler_out
