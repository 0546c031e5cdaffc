"""Volumetric path tracer tests: analytic homogeneous-medium gates
(BASELINE.json configs[1]) and heterogeneous ratio-tracking sanity."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators


def _medium_sphere_scene(sigma_t, albedo, radius=1.0, env=1.0, spp=64,
                         max_depth=32, width=8, height=8, medium_extra=None,
                         phase=None):
    med = {"type": "homogeneous", "sigma_t": sigma_t, "albedo": albedo}
    if phase:
        med["phase"] = phase
    if medium_extra:
        med.update(medium_extra)
    return {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": max_depth,
                       "rr_depth": 1000},
        "sensor": {"type": "perspective", "fov": 30.0,
                   "to_world": __import__("eradiate_kernel_tpu.core.transform",
                                          fromlist=["Transform"]).Transform
                   .look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]).m,
                   "film": {"type": "hdrfilm", "width": width, "height": height,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "bound": {"type": "sphere", "radius": radius, "interior": med},
        "env": {"type": "constant", "radiance": env},
    }


def test_absorbing_medium_transmittance():
    """Pure absorption (albedo 0): L = exp(-sigma_t * chord) * L_env."""
    sigma_t = 0.8
    scene = load_dict(_medium_sphere_scene(sigma_t, 0.0, spp=256, max_depth=64))
    img = np.asarray(integrators.render(scene, seed=1))
    center = img[3:5, 3:5].mean()
    expected = np.exp(-sigma_t * 2.0)  # chord through the unit sphere
    assert abs(center - expected) < 0.04, (center, expected)
    corner = img[0, 0].mean()
    assert abs(corner - 1.0) < 0.02, corner


def test_scattering_furnace():
    """Conservative scattering (albedo 1) in a constant env: L = 1 everywhere
    (the volumetric furnace test — checks delta tracking + NEE + phase)."""
    scene = load_dict(_medium_sphere_scene(1.0, 1.0, spp=128, max_depth=256,
                                           medium_extra=None))
    img = np.asarray(integrators.render(scene, seed=2))
    assert abs(img.mean() - 1.0) < 0.03, img.mean()
    assert abs(img[4, 4].mean() - 1.0) < 0.08, img[4, 4]


def test_scattering_furnace_hg():
    scene = load_dict(_medium_sphere_scene(1.0, 1.0, spp=64, max_depth=256,
                                           phase={"type": "hg", "g": 0.5}))
    img = np.asarray(integrators.render(scene, seed=3))
    assert abs(img.mean() - 1.0) < 0.05, img.mean()


def test_scattering_furnace_rayleigh():
    scene = load_dict(_medium_sphere_scene(1.0, 1.0, spp=64, max_depth=256,
                                           phase={"type": "rayleigh"}))
    img = np.asarray(integrators.render(scene, seed=4))
    assert abs(img.mean() - 1.0) < 0.05, img.mean()


def test_heterogeneous_constant_grid_matches_homogeneous():
    """A gridvolume with constant density must match the homogeneous result
    (ratio tracking with sigma_n > 0 — configs[3] sanity)."""
    from eradiate_kernel_tpu.core.transform import Transform

    sigma_t = 1.2
    # grid over [-1,1]^3 with constant density; majorant = 2x (forces nulls)
    grid = np.full((4, 4, 4), sigma_t, np.float32)
    het = {
        "type": "heterogeneous",
        "sigma_t": {"type": "gridvolume", "data": grid,
                    "to_world": (Transform.translate([-1, -1, -1])
                                 @ Transform.scale([2, 2, 2])).m},
        "albedo": 0.0,
        "scale": 1.0,
    }
    scene_h = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 64, "rr_depth": 1000},
        "sensor": {"type": "perspective", "fov": 25.0,
                   "to_world": Transform.look_at([0, 0, -4], [0, 0, 0],
                                                 [0, 1, 0]).m,
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 256}},
        "bound": {"type": "cube", "interior": het},
        "env": {"type": "constant", "radiance": 1.0},
    })
    img = np.asarray(integrators.render(scene_h, seed=5))
    center = img[3:5, 3:5].mean()
    expected = np.exp(-sigma_t * 2.0)
    assert abs(center - expected) < 0.05, (center, expected)
