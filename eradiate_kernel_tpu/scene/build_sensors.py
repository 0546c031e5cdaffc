"""Sensor construction — split out of scene/build.py (kept import-compatible via
re-exports there)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.transform import Transform, as_transform

_SENSOR_TYPES = ("perspective", "thinlens", "radiancemeter", "mradiancemeter",
                 "distant", "mdistant", "distantflux", "irradiancemeter")


def _build_srf(spec, params):
    """Discretize a spectral response function onto a uniform grid and build
    the piecewise-constant sampling CDF (perspective.cpp:106-180 srf
    importance sampling). Adds srf_nodes/srf_cdf/srf_integral to params."""
    K = 257
    t = spec["type"]
    if t == "uniform":
        lo, hi = spec.get("lambda_min", 360.0), spec.get("lambda_max", 830.0)
        nodes = np.linspace(lo, hi, K)
        vals = np.full(K, float(spec.get("value", 1.0)))
    elif t == "regular":
        lo, hi = spec["lambda_min"], spec["lambda_max"]
        src = np.asarray(spec["values"], np.float64)
        nodes = np.linspace(lo, hi, K)
        vals = np.interp(nodes, np.linspace(lo, hi, len(src)), src)
    elif t == "irregular":
        wav = np.asarray(spec["wavelengths"], np.float64)
        src = np.asarray(spec["values"], np.float64)
        nodes = np.linspace(wav[0], wav[-1], K)
        vals = np.interp(nodes, wav, src)
    elif t == "discrete":
        # exact line sampling (nbins.cpp companion, discrete.cpp pmf):
        # hero wavelengths land exactly on the lines, weight = sum of line
        # weights (the pmf cancels)
        wav = np.asarray(spec["wavelengths"], np.float64)
        w = np.asarray(spec.get("values", np.ones_like(wav)), np.float64)
        cdf = np.concatenate([[0.0], np.cumsum(w)]) / w.sum()
        params["srf_lines"] = jnp.asarray(wav, jnp.float32)
        params["srf_line_cdf"] = jnp.asarray(cdf, jnp.float32)
        params["srf_integral"] = jnp.asarray(float(w.sum()), jnp.float32)
        return
    else:
        raise ValueError(f"unsupported srf spectrum type {t!r}")
    # piecewise-constant cell masses -> exact linear CDF inversion
    cell = 0.5 * (vals[1:] + vals[:-1]) * np.diff(nodes)
    integral = float(cell.sum())
    cdf = np.concatenate([[0.0], np.cumsum(cell)]) / max(integral, 1e-30)
    params["srf_nodes"] = jnp.asarray(nodes, jnp.float32)
    params["srf_cdf"] = jnp.asarray(cdf, jnp.float32)
    params["srf_integral"] = jnp.asarray(integral, jnp.float32)


def _parse_fov(val, aspect):
    """sensor.cpp:113-165 parse_fov: either `fov` + `fov_axis`
    (x | y | smaller | larger | diagonal) or a 35mm-equivalent
    `focal_length` ("<x>mm", 36x24mm sensor, diagonal axis; default 50mm)
    -> horizontal field of view in degrees."""
    if "fov" in val and "focal_length" in val:
        raise ValueError("Please specify either a focal length "
                         "('focal_length') or a field of view ('fov')!")
    if "fov" in val:
        fov = float(val["fov"])
        axis = str(val.get("fov_axis", "x")).lower()
        if axis == "smaller":
            axis = "y" if aspect > 1 else "x"
        elif axis == "larger":
            axis = "x" if aspect > 1 else "y"
    else:
        f = str(val.get("focal_length", "50mm"))
        if f.endswith("mm"):
            f = f[:-2]
        value = float(f)
        fov = 2.0 * np.rad2deg(
            np.arctan(np.sqrt(36.0 ** 2 + 24.0 ** 2) / (2.0 * value)))
        axis = "diagonal"
    if axis == "x":
        result = fov
    elif axis == "y":
        result = np.rad2deg(2.0 * np.arctan(
            np.tan(0.5 * np.deg2rad(fov)) * aspect))
    elif axis == "diagonal":
        diagonal = 2.0 * np.tan(0.5 * np.deg2rad(fov))
        width = diagonal / np.sqrt(1.0 + 1.0 / (aspect * aspect))
        result = np.rad2deg(2.0 * np.arctan(0.5 * width))
    else:
        raise ValueError("The 'fov_axis' parameter must be set to one of "
                         "'smaller', 'larger', 'diagonal', 'x', or 'y'!")
    if not 0.0 < result < 180.0:
        raise ValueError("The horizontal field of view must be in the "
                         "range [0, 180]!")
    return float(result)


def _build_sensor(b, t, val, film_cfg):
    """Build (sensor_params, sensor_static) for sensor type ``t``."""
    from ..core.transform import as_animated_transform

    anim = as_animated_transform(val.get("to_world"))
    if anim is not None:
        # static fallback = first keyframe; sample_ray re-evaluates per-lane
        # at the ray time when "to_world_anim" is present
        tw = anim.eval(anim.times[0])
    else:
        tw = as_transform(val.get("to_world"))
    params = {}
    static = {}
    if anim is not None:
        params["to_world_anim"] = anim
    if "shutter_open" in val or "shutter_close" in val:
        so = float(val.get("shutter_open", 0.0))
        sc_ = float(val.get("shutter_close", so))
        params["shutter_open"] = jnp.asarray(so, jnp.float32)
        params["shutter_span"] = jnp.asarray(sc_ - so, jnp.float32)
    if t in ("perspective", "thinlens"):
        aspect = film_cfg.get("width", 64) / film_cfg.get("height", 64)
        fov = _parse_fov(val, aspect)
        params["to_world"] = tw
        params["tan_half_fov"] = jnp.asarray(np.tan(np.deg2rad(fov) / 2),
                                             jnp.float32)
        if t == "thinlens":
            params["aperture_radius"] = jnp.asarray(
                float(val.get("aperture_radius", 0.1)), jnp.float32)
            params["focus_distance"] = jnp.asarray(
                float(val.get("focus_distance", 1.0)), jnp.float32)
    elif t == "radiancemeter":
        params["to_world"] = tw
    elif t == "mradiancemeter":
        origins = np.asarray(val["origins"], np.float32).reshape(-1, 3)
        directions = np.asarray(val["directions"], np.float32).reshape(-1, 3)
        assert len(origins) == len(directions)
        params["origins"] = jnp.asarray(origins)
        params["directions"] = jnp.asarray(directions)
        film_cfg["width"] = len(origins)
        film_cfg["height"] = 1
        film_cfg["rfilter"] = "box"
    elif t == "distant":
        if "direction" in val:
            # direction is exclusive with to_world (distant.cpp:243-263):
            # the sensor frame is look_at(0, direction, up) with up from
            # `orientation` (up = direction x orientation) or the canonical
            # coordinate_system basis; rays travel along -direction.
            if "to_world" in val:
                raise ValueError("distant: only one of 'direction' and "
                                 "'to_world' can be specified")
            dirc = np.asarray(val["direction"], np.float64)
            dirc = dirc / np.linalg.norm(dirc)
            if "orientation" in val:
                up = np.cross(dirc, np.asarray(val["orientation"],
                                               np.float64))
                up = up / np.linalg.norm(up)
            else:
                from ..core.math import coordinate_system
                _s, up_j = coordinate_system(jnp.asarray(dirc, jnp.float32))
                up = np.asarray(up_j, np.float64)
            tw = Transform.look_at([0.0, 0.0, 0.0], list(dirc), list(up))
        params["to_world"] = tw
        static["flip_directions"] = bool(val.get("flip_directions", False))
        if "target" in val:
            params["target"] = jnp.asarray(
                np.asarray(val["target"], np.float32))
            static["target_mode"] = "point"
        else:
            static["target_mode"] = "none"
        w, h = film_cfg["width"], film_cfg["height"]
        static["direction_mode"] = ("single" if (w, h) == (1, 1)
                                    else "plane" if h == 1 else "hemisphere")
    elif t == "mdistant":
        directions = np.asarray(val["directions"], np.float32).reshape(-1, 3)
        params["directions"] = jnp.asarray(directions)
        if "target" in val:
            params["target"] = jnp.asarray(
                np.asarray(val["target"], np.float32))
            static["target_mode"] = "point"
        else:
            static["target_mode"] = "none"
        film_cfg["width"] = len(directions)
        film_cfg["height"] = 1
        film_cfg["rfilter"] = "box"
    elif t == "distantflux":
        params["to_world"] = tw
        if "target" in val:
            params["target"] = jnp.asarray(
                np.asarray(val["target"], np.float32))
            static["target_mode"] = "point"
        else:
            static["target_mode"] = "none"
    elif t == "irradiancemeter":
        sh = val.get("shape")
        assert isinstance(sh, dict) and sh.get("type") == "ref", \
            "irradiancemeter needs {'shape': {'type': 'ref', 'id': <name>}}"
        kind, idx = b.named[sh["id"]]
        assert kind == "shape"
        params["shape"] = jnp.asarray(np.int32(idx))
    else:
        raise ValueError(f"unknown sensor type {t!r}")
    if "srf" in val:
        _build_srf(val["srf"], params)
    return params, tuple(sorted(static.items()))


