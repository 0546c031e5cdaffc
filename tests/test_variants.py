"""Variant-parametrized end-to-end gates: every integrator x mono/rgb/
spectral on the analytic furnace (the reference's variant-fixture pattern,
src/conftest.py:35-90)."""

import numpy as np
import pytest

from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.core.types import Variant
from eradiate_kernel_tpu.scene import load_dict


def furnace(integrator, albedo=0.6, depth=16):
    return {
        "type": "scene",
        "integrator": {"type": integrator, "max_depth": depth,
                       "rr_depth": 1000},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 128}},
        "sphere": {"type": "sphere", "radius": 1.0,
                   "bsdf": {"type": "diffuse", "reflectance": albedo}},
        "env": {"type": "constant", "radiance": 1.0},
    }


@pytest.mark.parametrize("mode", ["mono", "rgb", "spectral"])
@pytest.mark.parametrize("integrator", ["path", "volpath", "volpathmis"])
def test_furnace_all_variants(mode, integrator):
    scene = load_dict(furnace(integrator), Variant(mode))
    img = np.asarray(integrators.render(scene, seed=5))
    assert np.all(np.isfinite(img))
    c = img[3:5, 3:5].mean()
    tol = 0.05 if mode == "spectral" else 0.03
    assert c == pytest.approx(0.6, abs=tol), (mode, integrator, c)
    corner = img[0, 0].mean()
    assert corner == pytest.approx(1.0, abs=tol), (mode, integrator, corner)


@pytest.mark.parametrize("mode", ["mono", "rgb", "spectral"])
def test_volumetric_furnace_all_variants(mode):
    """Absorbing slab transmittance across variants."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 16},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, -3],
                                "target": [0, 0, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 4096}},
        "slab": {"type": "cube", "bsdf": {"type": "null"},
                 "interior": {"type": "homogeneous", "sigma_t": 0.7,
                              "albedo": 0.0}},
        "env": {"type": "constant", "radiance": 1.0},
    }, Variant(mode))
    img = np.asarray(integrators.render(scene, seed=3))
    expect = np.exp(-2 * 0.7)
    assert img[0, 0].mean() == pytest.approx(expect, rel=0.08), \
        (mode, img[0, 0])
