"""Canned test scenes (analog of src/python/python/test/scenes.py:9-261)."""

from __future__ import annotations

import numpy as np

from ..core.transform import Transform


def cornell_box(width=64, height=64, spp=16, max_depth=6, integrator="path"):
    """The classic Cornell box built from rectangles (matches the geometry of
    resources/data/scenes/cbox — re-derived, not copied)."""
    T = Transform
    box = {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": max_depth},
        "sensor": {
            "type": "perspective",
            "fov": 39.3077,
            "to_world": T.look_at([0, 0, -3.9], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "white_bsdf": {"type": "diffuse",
                       "reflectance": {"type": "rgb", "value": [0.885, 0.698, 0.666]}},
        "red_bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0.57, 0.04, 0.04]}},
        "green_bsdf": {"type": "diffuse",
                       "reflectance": {"type": "rgb", "value": [0.105, 0.37, 0.067]}},
        # floor y=-1
        "floor": {"type": "rectangle",
                  "to_world": (T.translate([0, -1, 0]) @ T.rotate([1, 0, 0], -90)).m,
                  "bsdf": {"type": "ref", "id": "white_bsdf"}},
        # ceiling y=+1
        "ceiling": {"type": "rectangle",
                    "to_world": (T.translate([0, 1, 0]) @ T.rotate([1, 0, 0], 90)).m,
                    "bsdf": {"type": "ref", "id": "white_bsdf"}},
        # back wall z=+1
        "back": {"type": "rectangle",
                 "to_world": (T.translate([0, 0, 1]) @ T.rotate([1, 0, 0], 180)).m,
                 "bsdf": {"type": "ref", "id": "white_bsdf"}},
        # The reference sample mapping (sensor.h:196-230) puts camera-space
        # +x (= world +x for this look_at) on the LEFT of the image, so the
        # canonical red-left Cornell look needs red at x=+1 (matching the
        # original Cornell data: red wall at large x).
        # wall x=-1 (green in the image's right half), normal +x
        "left": {"type": "rectangle",
                 "to_world": (T.translate([-1, 0, 0]) @ T.rotate([0, 1, 0], 90)).m,
                 "bsdf": {"type": "ref", "id": "green_bsdf"}},
        # wall x=+1 (red, image left), normal -x
        "right": {"type": "rectangle",
                  "to_world": (T.translate([1, 0, 0]) @ T.rotate([0, 1, 0], -90)).m,
                  "bsdf": {"type": "ref", "id": "red_bsdf"}},
        # area light near the ceiling, facing down
        "light": {"type": "rectangle",
                  "to_world": (T.translate([0, 0.99, 0]) @ T.rotate([1, 0, 0], 90)
                               @ T.scale([0.23, 0.19, 1.0])).m,
                  "bsdf": {"type": "diffuse", "reflectance": 0.0},
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb",
                                           "value": [18.387, 13.9873, 6.75357]}}},
    }
    return box


def furnace(albedo=0.5, radiance=1.0, width=16, height=16, spp=64,
            max_depth=32, integrator="path"):
    """Furnace test: a diffuse sphere inside a constant environment. The
    analytic answer for radiance seen at the sphere is
    L = radiance * (1 - albedo^inf) ... = radiance (closed sphere) — for an
    open view: L_sphere = radiance * sum_k albedo^k over bounces."""
    return {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": max_depth},
        "sensor": {
            "type": "perspective",
            "fov": 40.0,
            "to_world": Transform.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]).m,
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "sphere": {"type": "sphere", "radius": 1.0,
                   "bsdf": {"type": "diffuse", "reflectance": albedo}},
        "env": {"type": "constant", "radiance": radiance},
    }


def atmosphere(width=64, height=64, spp=16, max_depth=16, grid_res=16,
               tau=0.36, albedo=0.9, surface_reflectance=0.3,
               sun_direction=(0.3, 0.0, -0.94), sensor="perspective"):
    """Plane-parallel Rayleigh atmosphere over a Lambertian ground — the
    north-star Eradiate workload (BASELINE.md configs[3]-like): gridvolume
    sigma_t with an exponential profile, Rayleigh phase, directional sun,
    ratio-tracked transmittance.

    The atmosphere occupies x,y in [0,1]*40-ish horizontally (scaled grid
    frame) and z in [0, 1]; the vertical optical depth is ``tau``.
    """
    import numpy as np

    # grid_res: int D -> (D, 4, 4) plane-parallel profile; tuple (D, H, W)
    # -> full 3D grid with a mild horizontal density modulation (broken
    # clouds / aerosol patchiness) so large grids exercise real 3D lookups
    if isinstance(grid_res, (tuple, list)):
        D, Hc, Wc = grid_res
    else:
        D, Hc, Wc = grid_res, 4, 4
    z = (np.arange(D) + 0.5) / D
    profile = np.exp(-z / 0.25)
    profile *= tau / (profile.mean() * 1.0)  # unit slab height
    sigma = np.broadcast_to(profile[:, None, None],
                            (D, Hc, Wc)).astype(np.float32)
    if Hc > 4 or Wc > 4:
        yy = (np.arange(Hc) + 0.5) / Hc
        xx = (np.arange(Wc) + 0.5) / Wc
        mod = (1.0 + 0.5 * np.sin(2 * np.pi * 3 * xx)[None, None, :]
               * np.sin(2 * np.pi * 3 * yy)[None, :, None]
               * np.exp(-z / 0.5)[:, None, None])
        sigma = (sigma * mod).astype(np.float32)

    if sensor == "distant":
        sensor_dict = {
            # direction = outgoing-radiance direction (rays trace along -direction,
            # distant.cpp:314-332): TOA view records radiance leaving upward
            "type": "distant", "direction": [0, 0, 1],
            "target": [0.5, 0.5, 0.0],
            "film": {"width": 1, "height": 1, "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        }
    else:
        sensor_dict = {
            "type": "perspective", "fov": 60.0,
            "to_world": {"type": "look_at", "origin": [0.5, 0.5, 3.0],
                         "target": [0.5, 0.5, 0.0], "up": [0, 1, 0]},
            "film": {"width": width, "height": height,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        }

    return {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": max_depth},
        "sensor": sensor_dict,
        "surface": {
            "type": "rectangle",
            "to_world": [{"type": "scale", "value": 20.0},
                         {"type": "translate", "value": [0.5, 0.5, 0.0]}],
            "bsdf": {"type": "rpv", "rho_0": surface_reflectance,
                     "g": -0.1, "k": 0.7},
        },
        "atmo": {
            "type": "cube",
            "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]},
                         {"type": "translate", "value": [0.5, 0.5, 0.5]}],
            "bsdf": {"type": "null"},
            "interior": {
                "type": "heterogeneous",
                "sigma_t": {"type": "gridvolume", "data": sigma,
                            "to_world": [{"type": "scale",
                                          "value": [40.0, 40.0, 1.0]},
                                         {"type": "translate",
                                          "value": [-19.5, -19.5, 0.0]}]},
                "albedo": albedo,
                "phase": {"type": "rayleigh"},
            },
        },
        "sun": {"type": "directional",
                "direction": list(sun_direction), "irradiance": 1.0},
    }
