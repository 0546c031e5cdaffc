"""Wrapper integrator tests: aov, moment, bins/nbins (analog of
src/integrators/tests for aov.cpp:65-99, moment.cpp:28-46, bins.cpp:12-58)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.core.types import Variant


def scene_dict(integrator, spp=16, w=8):
    return {
        "type": "scene",
        "integrator": integrator,
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": w, "height": w,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "sphere": {"type": "sphere", "radius": 1.0,
                   "bsdf": {"type": "diffuse", "reflectance": 0.5}},
        "env": {"type": "constant", "radiance": 1.0},
    }


def test_aov_depth_and_normals():
    scene = load_dict(scene_dict({
        "type": "aov", "aovs": "dd:depth,nn:sh_normal",
        "child": {"type": "path", "max_depth": 2}}))
    img, aovs = integrators.render(scene, seed=1, return_aovs=True)
    assert set(aovs) == {"dd", "nn.x", "nn.y", "nn.z"}
    d = np.asarray(aovs["dd"])
    # center pixel hits the unit sphere at distance 3; corners miss (0)
    assert d[4, 4] == pytest.approx(3.0, abs=0.05)
    assert d[0, 0] == 0.0
    # center normal points back toward the camera (-z)
    assert np.asarray(aovs["nn.z"])[4, 4] == pytest.approx(-1.0, abs=0.05)
    # radiance image still present and sane
    assert np.asarray(img).mean() > 0.1


def test_moment_variance_estimate():
    """moment m2 AOVs allow an unbiased per-pixel variance estimate:
    var = m2 - mean^2 >= 0, and ~0 for the zero-variance background."""
    scene = load_dict(scene_dict({
        "type": "moment", "child": {"type": "path", "max_depth": 2}}, spp=64))
    img, aovs = integrators.render(scene, seed=1, return_aovs=True)
    film = np.asarray(integrators.render(scene, seed=1, develop_film=False))
    w = np.maximum(film[..., 4], 1e-12)
    mean_y = film[..., 1] / w
    m2_y = np.asarray(aovs["m2.y"])
    var = m2_y - mean_y ** 2
    assert var.min() > -1e-4
    # background pixels see the constant env -> zero variance
    assert abs(var[0, 0]) < 1e-6
    # silhouette pixels mix sphere and env -> positive variance
    assert var.max() > 1e-3


def test_bins_partition_recovers_total():
    """Two bins covering the whole sampled range must sum to the full
    spectral integral of a flat spectrum (bins.cpp partition property)."""
    d = scene_dict({
        "type": "bins",
        "bins": "lo:360:600,hi:600:830",
        "child": {"type": "path", "max_depth": 2}}, spp=128, w=4)
    del d["sphere"]  # env-only: corner pixels must see exactly L=1
    scene = load_dict(d, Variant("spectral"))
    img, aovs = integrators.render(scene, seed=2, return_aovs=True)
    total = np.asarray(aovs["lo"]) + np.asarray(aovs["hi"])
    # background: flat L=1 over the 470nm sampled range -> integral 470
    assert total[0, 0] == pytest.approx(470.0, rel=0.02), total[0, 0]
    # bins are a ~(240, 230) split of the range
    assert np.asarray(aovs["lo"])[0, 0] == pytest.approx(240.0, rel=0.05)


def test_nbins_line():
    d = scene_dict({
        "type": "nbins", "bins": "l550:550", "tolerance": 25.0,
        "child": {"type": "path", "max_depth": 2}}, spp=256, w=4)
    del d["sphere"]
    scene = load_dict(d, Variant("spectral"))
    img, aovs = integrators.render(scene, seed=3, return_aovs=True)
    # flat unit spectrum: bin integral = bin width = 50 nm
    assert np.asarray(aovs["l550"])[0, 0] == pytest.approx(50.0, rel=0.15)


def test_uv_partials_match_offset_hits():
    """compute_uv_partials (interaction.h:217-249) against an exact oracle:
    for a planar shape the tangent-plane least-squares solve must equal the
    uv difference of actually intersecting the offset rays."""
    from eradiate_kernel_tpu import sensors
    from eradiate_kernel_tpu.core.ray import Ray
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu.render.geometry import (
        compute_surface_interaction, ray_intersect)
    from eradiate_kernel_tpu.render.records import compute_uv_partials

    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0.2, -0.3, -4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": 16, "height": 16}},
        "rect": {"type": "rectangle", "to_world": {"type": "scale",
                                                   "value": [3, 3, 1]},
                 "bsdf": {"type": "diffuse"}},
    })
    pos_film = jnp.asarray([[0.5, 0.5], [0.3, 0.6], [0.7, 0.4],
                            [0.45, 0.55], [0.62, 0.37]], jnp.float32)
    n = pos_film.shape[0]
    smp = Sampler.seed(jnp.uint32(3), jnp.arange(n, dtype=jnp.uint32))
    ray, rd, _w, _s = sensors.sample_ray_differential(
        scene, smp, pos_film, jnp.zeros(n), diff_scale=1.0)
    si = ray_intersect(scene.geo, ray)
    assert bool(jnp.all(si.is_valid))
    duv_dx, duv_dy = compute_uv_partials(si, rd)

    six = ray_intersect(scene.geo, Ray.make(rd.o_x, rd.d_x,
                                            wavelengths=ray.wavelengths))
    siy = ray_intersect(scene.geo, Ray.make(rd.o_y, rd.d_y,
                                            wavelengths=ray.wavelengths))
    np.testing.assert_allclose(np.asarray(duv_dx),
                               np.asarray(six.uv - si.uv), atol=2e-4)
    np.testing.assert_allclose(np.asarray(duv_dy),
                               np.asarray(siy.uv - si.uv), atol=2e-4)
    # degenerate dp_du/dp_dv lanes produce zeros, not NaN
    si0 = si.replace(dp_du=jnp.zeros_like(si.dp_du),
                     dp_dv=jnp.zeros_like(si.dp_dv))
    z_dx, z_dy = compute_uv_partials(si0, rd)
    assert np.all(np.asarray(z_dx) == 0) and np.all(np.asarray(z_dy) == 0)


def test_aov_duv_render():
    """duv_dx/duv_dy AOVs through the wavefront driver (aov.cpp:124,212):
    a camera-filling rectangle has an analytically known uv footprint per
    pixel; at spp=1 diff_scale=1 so duv_dx ~ one-pixel uv step."""
    w = 8
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "aov", "aovs": "d1:duv_dx,d2:duv_dy",
                       "child": {"type": "depth"}},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": {"type": "look_at", "origin": [0, 0, -1],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": w, "height": w,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 1}},
        # rectangle spans [-4,4]^2 at z=0 — fills the 45-degree view
        "rect": {"type": "rectangle",
                 "to_world": {"type": "scale", "value": [4, 4, 1]},
                 "bsdf": {"type": "diffuse"}},
    })
    img, aovs = integrators.render(scene, seed=1, return_aovs=True)
    assert {"d1.x", "d1.y", "d2.x", "d2.y"} <= set(aovs)
    d1x = np.asarray(aovs["d1.x"])
    d2y = np.asarray(aovs["d2.y"])
    assert np.all(np.isfinite(d1x)) and np.all(np.isfinite(d2y))
    # center pixel: film x step = 2*tan(22.5)/8 world units = /8 of the
    # rect's 8-unit uv span... uv spans 1 over 8 world units, so
    # duv_dx.x ~ 2*tan(22.5deg)/w/8 at the center
    expect = 2.0 * np.tan(np.radians(22.5)) / w / 8.0
    # film x runs opposite to camera +x (= the rect's u axis) per the
    # reference sample mapping (sensor.h:196-230), film y opposite to v
    assert d1x[w // 2, w // 2] == pytest.approx(-expect, rel=0.15)
    assert d2y[w // 2, w // 2] == pytest.approx(-expect, rel=0.15)


# =============================================================================
# Regen-driver support for wrapper integrators (VERDICT r4 item 6)
# =============================================================================

@pytest.mark.parametrize("integrator", [
    {"type": "aov", "aovs": "dd:depth,nn:geo_normal,pp:position",
     "child": {"type": "path", "max_depth": 3}},
    {"type": "aov", "aovs": "dd:depth",
     "child": {"type": "volpath", "max_depth": 3}},
    {"type": "moment", "child": {"type": "path", "max_depth": 3}},
])
def test_wrapper_regen_matches_scan_driver(integrator):
    """aov/moment wrappers run on the regenerating lane-pool driver
    (camera-hit AOVs computed at lane refill and carried; harvest-time
    AOVs from the carried state) and agree with the scan driver
    sample-for-sample (reference: aov.cpp:65-99, moment.cpp:28-46)."""
    scene = load_dict(scene_dict(integrator))
    img_s, aov_s = integrators.render(scene, seed=3, return_aovs=True,
                                      regen=False)
    img_r, aov_r = integrators.render(scene, seed=3, return_aovs=True,
                                      regen=True)
    assert np.allclose(np.asarray(img_s), np.asarray(img_r), atol=2e-6)
    assert set(aov_s) == set(aov_r)
    for k in aov_s:
        assert np.allclose(np.asarray(aov_s[k]), np.asarray(aov_r[k]),
                           atol=2e-5), k


def test_wrapper_regen_wide_filter_matches_scan():
    """The film_put (wide-filter) regen path carries AOV channels too."""
    d = scene_dict({"type": "moment", "child": {"type": "path",
                                                "max_depth": 3}})
    d["sensor"]["film"]["rfilter"] = {"type": "gaussian"}
    scene = load_dict(d)
    img_s, aov_s = integrators.render(scene, seed=5, return_aovs=True,
                                      regen=False)
    img_r, aov_r = integrators.render(scene, seed=5, return_aovs=True,
                                      regen=True)
    assert np.allclose(np.asarray(img_s), np.asarray(img_r), atol=2e-5)
    for k in aov_s:
        assert np.allclose(np.asarray(aov_s[k]), np.asarray(aov_r[k]),
                           atol=2e-4), k


def test_bins_regen_matches_scan_driver():
    """bins on the regen driver (spectral variant)."""
    from eradiate_kernel_tpu.core.types import Variant

    d = scene_dict({"type": "bins",
                    "bins": "lo:400:550,hi:550:700",
                    "child": {"type": "path", "max_depth": 3}})
    scene = load_dict(d, Variant("spectral"))
    img_s, aov_s = integrators.render(scene, seed=7, return_aovs=True,
                                      regen=False)
    img_r, aov_r = integrators.render(scene, seed=7, return_aovs=True,
                                      regen=True)
    assert np.allclose(np.asarray(img_s), np.asarray(img_r), atol=2e-5)
    for k in aov_s:
        assert np.allclose(np.asarray(aov_s[k]), np.asarray(aov_r[k]),
                           atol=2e-4), k
