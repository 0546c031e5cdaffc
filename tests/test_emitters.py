"""Emitter tests: spot falloff, projector frustum, envmap eval + importance
sampling (analog of src/emitters/tests)."""

import numpy as np
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators


def test_spot_inverse_square_and_cone():
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 64}},
        "floor": {"type": "rectangle",
                  "bsdf": {"type": "diffuse", "reflectance": 1.0}},
        "light": {"type": "spot", "position": [0, 0, 2],
                  "direction": [0, 0, -1],
                  "cutoff_angle": 30.0, "beam_width": 20.0,
                  "intensity": 10.0},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    # center of the beam: L = I cos / (d^2 pi) = 10 / (4 pi)
    assert img[8, 8, 1] == pytest.approx(10 / (4 * np.pi), rel=0.02)
    # outside the cutoff cone: dark
    assert img[0, 0, 1] < 0.01


def _gradient_env(H=32, W=64):
    # vertex convention (envmap.cpp:90): row y sits at theta = y/(H-1)*pi,
    # so sampling the analytic gradient at vertex angles keeps the
    # piecewise-bilinear radiance equal to the closed form
    th = np.arange(H) / (H - 1) * np.pi
    env = np.zeros((H, W, 3), np.float32)
    env[..., :] = (0.2 + 0.8 * np.cos(th)[:, None, None] ** 2)
    return env


def test_envmap_eval_at_pole():
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, 0],
                                "target": [0, 0, 5], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 16}},
        # reference y-up lat-long convention: rotate the local +y pole to +z
        "sky": {"type": "envmap", "data": _gradient_env(),
                "to_world": {"type": "rotate", "axis": [1, 0, 0], "angle": 90}},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    assert img[0, 0, 1] == pytest.approx(1.0, abs=0.01)


def test_envmap_lit_plane_matches_analytic():
    """White Lambertian plane under the gradient sky:
    L = (1/pi) * 2pi * int_0^1 (0.2 + 0.8 u^2) u du = 0.6.
    Exercises envmap NEE importance sampling + MIS + escaped-ray pdf."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "distant", "direction": [0, 0, 1],
                   "target": [0, 0, 0],
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 2048}},
        "floor": {"type": "rectangle",
                  "to_world": {"type": "scale", "value": 50.0},
                  "bsdf": {"type": "diffuse", "reflectance": 1.0}},
        # reference y-up lat-long convention: rotate the local +y pole to +z
        "sky": {"type": "envmap", "data": _gradient_env(),
                "to_world": {"type": "rotate", "axis": [1, 0, 0], "angle": 90}},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    assert img[0, 0, 1] == pytest.approx(0.6, rel=0.02), img[0, 0, 1]


def test_envmap_importance_low_variance():
    """A tiny bright patch in an otherwise black sky: importance sampling
    must find it at low spp (uniform sampling would almost never hit it)."""
    env = np.full((32, 64, 3), 1e-4, np.float32)
    env[2:4, 10:12] = 500.0  # small, very bright patch near the pole
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "distant", "direction": [0, 0, 1],
                   "target": [0, 0, 0],
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 256}},
        "floor": {"type": "rectangle",
                  "to_world": {"type": "scale", "value": 50.0},
                  "bsdf": {"type": "diffuse", "reflectance": 1.0}},
        "sky": {"type": "envmap", "data": env,
                "to_world": {"type": "rotate", "axis": [1, 0, 0], "angle": 90}},
    })
    imgs = [np.asarray(integrators.render(scene, seed=s))[0, 0, 1]
            for s in range(4)]
    m = np.mean(imgs)
    # analytic: (500/pi) * patch cos-weighted solid angle / pi = 1.693
    assert m == pytest.approx(1.693, rel=0.25), m
    # uniform sphere sampling would hit the ~0.14%-solid-angle patch so
    # rarely that the seed spread would be ~3x the mean; importance
    # sampling holds it to a fraction
    assert np.std(imgs) / m < 0.3, (m, np.std(imgs))


def test_projector_frustum():
    """Projector lights only inside its frustum; image uv maps across it."""
    img_data = np.zeros((8, 8, 3), np.float32)
    img_data[:, :4] = [4.0, 0.0, 0.0]   # left half red
    img_data[:, 4:] = [0.0, 4.0, 0.0]   # right half green
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, 3],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 64}},
        "floor": {"type": "rectangle",
                  "bsdf": {"type": "diffuse", "reflectance": 1.0}},
        "light": {"type": "projector",
                  "to_world": {"type": "look_at", "origin": [0, 0, 2],
                               "target": [0, 0, 0], "up": [0, 1, 0]},
                  "fov": 40.0,
                  "irradiance": {"type": "bitmap", "data": img_data}},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    center_l = img[8, 5]
    center_r = img[8, 11]
    # one side red-dominant, the other green-dominant (orientation depends
    # on the projector frame; assert the split exists)
    assert (center_l[0] > 2 * center_l[1]) != (center_r[0] > 2 * center_r[1])
    # corners outside the 40-degree frustum are dark
    assert img[0, 0].max() < 0.02


def test_envmap_from_compressed_exr_file(tmp_path):
    """Real-asset path: a ZIP-compressed f16 EXR envmap loaded by filename
    (the in-the-wild OpenEXR default the round-1 reader could not decode)."""
    from eradiate_kernel_tpu.utils import bitmap

    env = (0.2 + 0.6 * np.cos(np.linspace(0, np.pi, 16))[:, None, None] ** 2
           * np.ones((16, 32, 3))).astype(np.float32)
    p = str(tmp_path / "sky.exr")
    bitmap.write_exr(p, env, compression="zip", pixel_type="f16")
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, 0],
                                "target": [0, 0, 5], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 8}},
        "sky": {"type": "envmap", "filename": p,
                "to_world": {"type": "rotate", "axis": [1, 0, 0], "angle": 90}},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    assert img[0, 0, 1] == pytest.approx(0.8, abs=0.02)
