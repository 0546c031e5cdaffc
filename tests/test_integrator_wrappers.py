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
