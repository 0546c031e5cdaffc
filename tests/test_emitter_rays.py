"""Endpoint::sample_ray parity (endpoint.h:42-118; area.cpp:74-119,
constant.cpp:60-79, point.cpp:60-78, directional.cpp:80-106,
spot.cpp:117-137, envmap.cpp:149-154 NotImplemented).

Oracles: for each emitter the Monte Carlo mean of the ray weight must equal
the emitter's total power (per unit wavelength in spectral mode), which is
closed-form for every kind."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu import emitters
from eradiate_kernel_tpu.core.rng import Sampler
from eradiate_kernel_tpu.scene import load_dict

N = 4096


def _scene(emitter, extra_shapes=None):
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 4, "height": 4}},
        "em": emitter,
    }
    if extra_shapes:
        d.update(extra_shapes)
    return load_dict(d)


def _rays(scene, seed=7, n=N):
    smp = Sampler.seed(jnp.uint32(seed), jnp.arange(n, dtype=jnp.uint32))
    return emitters.sample_emitter_ray(scene, smp, jnp.zeros(n))


def test_point_power():
    scene = _scene({"type": "point", "position": [1, 2, 3],
                    "intensity": 2.5})
    ray, w, idx, _ = _rays(scene)
    # every sample: weight = 4*pi*I exactly (point.cpp:69)
    np.testing.assert_allclose(np.asarray(w), 4 * np.pi * 2.5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ray.o), np.broadcast_to([1.0, 2.0, 3.0], (N, 3)),
        atol=1e-6)
    norms = np.linalg.norm(np.asarray(ray.d), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # directions cover the sphere: mean ~ 0
    assert np.all(np.abs(np.asarray(ray.d).mean(0)) < 0.05)


def test_area_power():
    # rectangle scaled 2x2 -> area 16, L=0.5: every sample weight
    # = L*pi/p_area = L*pi*A (area.cpp:117)
    scene = _scene({"type": "rectangle",
                    "to_world": {"type": "scale", "value": [2, 2, 1]},
                    "emitter": {"type": "area", "radiance": 0.5}})
    ray, w, _i, _ = _rays(scene)
    np.testing.assert_allclose(np.asarray(w), 0.5 * np.pi * 16.0, rtol=1e-4)
    o = np.asarray(ray.o)
    assert np.all(np.abs(o[:, 2]) < 1e-5)           # on the z=0 plane
    assert np.all(np.abs(o[:, :2]) <= 2.0 + 1e-5)   # inside the rect
    d = np.asarray(ray.d)
    assert np.all(d[:, 2] > 0)                      # emitting off +n
    # cosine-weighted: E[cos theta] = 2/3
    assert d[:, 2].mean() == pytest.approx(2 / 3, abs=0.02)


def test_constant_weight_and_geometry():
    scene = _scene({"type": "constant", "radiance": 0.7},
                   extra_shapes={"s": {"type": "sphere", "radius": 1.0,
                                       "bsdf": {"type": "diffuse"}}})
    ray, w, _i, _ = _rays(scene)
    r = float(np.asarray(scene.bsphere_radius))
    c = np.asarray(scene.bsphere_center)
    np.testing.assert_allclose(np.asarray(w),
                               0.7 * 4 * (np.pi * r) ** 2, rtol=1e-4)
    o = np.asarray(ray.o)
    np.testing.assert_allclose(np.linalg.norm(o - c, axis=-1), r, rtol=1e-4)
    # directions point inward
    inward = np.sum(np.asarray(ray.d) * (c - o), -1)
    assert np.all(inward > -1e-6)


def test_directional_geometry_and_weight():
    scene = _scene({"type": "directional", "direction": [0, 0, -1],
                    "irradiance": 1.3},
                   extra_shapes={"s": {"type": "sphere", "radius": 2.0,
                                       "bsdf": {"type": "diffuse"}}})
    ray, w, _i, _ = _rays(scene)
    r = float(np.asarray(scene.bsphere_radius))
    c = np.asarray(scene.bsphere_center)
    np.testing.assert_allclose(np.asarray(w), 1.3 * np.pi * r * r, rtol=1e-4)
    d = np.asarray(ray.d)
    np.testing.assert_allclose(d, np.broadcast_to([0.0, 0.0, -1.0], d.shape),
                               atol=1e-6)
    o = np.asarray(ray.o)
    # origins sit on the upwind disk: z = c.z + r, radial offset <= r
    np.testing.assert_allclose(o[:, 2], c[2] + r, rtol=1e-4)
    rad = np.linalg.norm(o[:, :2] - c[:2], axis=-1)
    assert np.all(rad <= r + 1e-4)


def test_spot_power_matches_falloff_integral():
    cut, beam = 40.0, 20.0
    scene = _scene({"type": "spot", "position": [0, 0, 0],
                    "direction": [0, 0, 1], "intensity": 1.0,
                    "cutoff_angle": cut, "beam_width": beam})
    ray, w, _i, _ = _rays(scene, n=16384)
    ccut = np.cos(np.radians(cut))
    cbeam = np.cos(np.radians(beam))
    # E[weight] = I * integral of falloff over the cone:
    # 2*pi * [ (1-cbeam) + (cbeam-ccut)/2 ]  for the linear falloff
    expect = 2 * np.pi * ((1 - cbeam) + 0.5 * (cbeam - ccut))
    assert np.asarray(w)[:, 0].mean() == pytest.approx(expect, rel=0.02)
    # all rays inside the cutoff cone
    assert np.all(np.asarray(ray.d)[:, 2] >= ccut - 1e-5)


def test_mixed_scene_pick_pmf():
    """Uniform pick over two emitters: per-kind weights are scaled by n so
    the mean power adds."""
    scene = _scene({"type": "point", "position": [0, 0, 0],
                    "intensity": 1.0},
                   extra_shapes={"p2": {"type": "point",
                                        "position": [1, 0, 0],
                                        "intensity": 3.0}})
    _ray, w, idx, _ = _rays(scene, n=32768)
    # E[w] = (4pi*1 + 4pi*3)/2 * 2 = 4pi*4 / ... pick pmf folded: each
    # sample = n * 4pi*I_k, mean = sum_k 4pi*I_k
    assert np.asarray(w)[:, 0].mean() == pytest.approx(
        4 * np.pi * 4.0, rel=0.03)
    assert set(np.unique(np.asarray(idx))) == {0, 1}


def test_envmap_raises():
    scene = _scene({"type": "envmap",
                    "data": np.ones((4, 8, 3), np.float32)})
    with pytest.raises(NotImplementedError):
        _rays(scene)


def test_spectral_area_ray():
    """Spectral mode: wavelengths importance-sampled; weight integrates to
    radiance * pi * A per unit wavelength (uniform spectrum -> weight =
    L * range * pi * A / range ... the sample-weight already folds the
    spectral pdf so E[w * cmf-free] equals power density)."""
    from eradiate_kernel_tpu.core import spectrum as sp
    from eradiate_kernel_tpu.core.types import Variant
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 4, "height": 4}},
        "rect": {"type": "rectangle",
                 "emitter": {"type": "area",
                             "radiance": {"type": "uniform", "value": 0.5}}},
    }, Variant("spectral"))
    ray, w, _i, _ = _rays(scene, n=512)
    assert ray.wavelengths.shape == (512, 4)
    wl = np.asarray(ray.wavelengths)
    assert np.all(wl >= sp.WAVELENGTH_MIN) and np.all(wl <= sp.WAVELENGTH_MAX)
    # uniform spectrum: sample_spectrum weight = value * range; rect area 4
    rng = sp.WAVELENGTH_MAX - sp.WAVELENGTH_MIN
    np.testing.assert_allclose(np.asarray(w),
                               0.5 * rng * np.pi * 4.0, rtol=1e-3)
