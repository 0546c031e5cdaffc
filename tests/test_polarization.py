"""Polarization tests: Mueller closed forms, Malus' law through the stokes
integrator, wave plates (analog of the reference's polarization test suite)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.core import mueller as mu
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.scene import load_dict


def test_polarizer_on_unpolarized():
    s = jnp.asarray([1.0, 0, 0, 0])
    out = np.asarray(mu.linear_polarizer(1.0) @ s)
    assert np.allclose(out, [0.5, 0.5, 0, 0])


def test_malus_matrices():
    """Two polarizers at relative angle theta: I = I0/2 cos^2(theta)."""
    s = jnp.asarray([1.0, 0, 0, 0])
    for theta in (0.0, np.pi / 6, np.pi / 4, np.pi / 3, np.pi / 2):
        m2 = mu.rotated_element(jnp.asarray(theta), mu.linear_polarizer(1.0))
        out = np.asarray(m2 @ (mu.linear_polarizer(1.0) @ s))
        assert out[0] == pytest.approx(0.5 * np.cos(theta) ** 2, abs=1e-6), theta


def test_quarter_wave_plate_makes_circular():
    """Linear @45deg through a quarter-wave plate -> circular light."""
    s_lin45 = jnp.asarray([1.0, 0, 1.0, 0])
    qwp = mu.linear_retarder(jnp.asarray(np.pi / 2))
    out = np.asarray(qwp @ s_lin45)
    assert abs(out[3]) == pytest.approx(1.0, abs=1e-6)
    assert out[1] == pytest.approx(0.0, abs=1e-6)


def test_specular_reflection_brewster():
    """At Brewster's angle, reflected light is fully s-polarized."""
    eta = 1.5
    brewster = np.arctan(eta)
    m = np.asarray(mu.specular_reflection(jnp.asarray([np.cos(brewster)]),
                                          jnp.asarray(eta)))[0]
    s_out = m @ np.array([1.0, 0, 0, 0])
    # degree of polarization = |S1|/S0 = 1 at Brewster
    assert abs(s_out[1]) / s_out[0] == pytest.approx(1.0, abs=1e-4)


def _bench_scene(elements, spp=64):
    """Optical bench: env light -> element stack -> camera, along +z."""
    d = {
        "type": "scene",
        "integrator": {"type": "stokes",
                       "child": {"type": "path", "max_depth": 2}},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": spp}},
        "env": {"type": "constant", "radiance": 1.0},
    }
    for i, el in enumerate(elements):
        el = dict(el)
        el_z = -3.0 + i  # stack toward the camera
        d[f"el{i}"] = {"type": "rectangle",
                       "to_world": {"type": "translate",
                                    "value": [0, 0, el_z]},
                       "bsdf": el}
    return load_dict(d)


def test_stokes_single_polarizer():
    scene = _bench_scene([{"type": "polarizer", "theta": 30.0}])
    img, aovs = integrators.render(scene, seed=1, return_aovs=True)
    s0 = float(np.asarray(img)[0, 0, 1])
    assert s0 == pytest.approx(0.5, abs=0.01)
    # fully linearly polarized output: sqrt(s1^2+s2^2) = s0
    s1 = float(aovs["s1"][0, 0])
    s2 = float(aovs["s2"][0, 0])
    dop = np.hypot(s1, s2) / s0
    assert dop == pytest.approx(1.0, abs=0.02), (s1, s2, s0)


@pytest.mark.parametrize("theta", [0.0, 30.0, 45.0, 60.0, 90.0])
def test_stokes_malus_law(theta):
    """Camera <- polarizer(theta) <- polarizer(0) <- light: Malus' law."""
    scene = _bench_scene([
        {"type": "polarizer", "theta": 0.0},      # nearest the light
        {"type": "polarizer", "theta": theta},    # nearest the camera
    ])
    img = np.asarray(integrators.render(scene, seed=1))
    s0 = float(img[0, 0, 1])
    expect = 0.5 * np.cos(np.deg2rad(theta)) ** 2
    assert s0 == pytest.approx(expect, abs=0.02), (theta, s0, expect)


def test_stokes_crossed_polarizers_with_qwp():
    """Crossed polarizers pass nothing; inserting a 45deg quarter-wave plate
    lets a quarter of the light through (classic demonstration)."""
    crossed = _bench_scene([
        {"type": "polarizer", "theta": 0.0},
        {"type": "polarizer", "theta": 90.0},
    ])
    img = np.asarray(integrators.render(crossed, seed=1))
    assert float(img[0, 0, 1]) == pytest.approx(0.0, abs=0.01)

    with_qwp = _bench_scene([
        {"type": "polarizer", "theta": 0.0},
        {"type": "retarder", "theta": 45.0, "delta": 180.0},  # half-wave @45
        {"type": "polarizer", "theta": 90.0},
    ])
    img2 = np.asarray(integrators.render(with_qwp, seed=1))
    # half-wave plate at 45deg rotates the plane by 90 -> full transmission
    assert float(img2[0, 0, 1]) == pytest.approx(0.5, abs=0.02)


def test_stokes_conductor_reflection_polarizes():
    """A single specular metallic reflection partially polarizes unpolarized
    light (conductor.cpp:242-264 Fresnel Mueller path through the polarized
    transport). Geometry: camera looks +z at a 45deg-tilted mirror that
    reflects the view toward an area light off to one side."""
    from eradiate_kernel_tpu.scene import load_dict

    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "stokes",
                       "child": {"type": "path", "max_depth": 3}},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 32}},
        # mirror tilted 45 degrees about x: reflects +z view into +y
        "mirror": {"type": "rectangle",
                   "to_world": {"type": "look_at", "origin": [0, 0, 0],
                                "target": [0, 1, -1], "up": [0, 1, 1]},
                   "bsdf": {"type": "conductor", "material": "au"}},
        "light": {"type": "rectangle",
                  "to_world": {"type": "look_at", "origin": [0, 40, 0],
                               "target": [0, 0, 0], "up": [1, 0, 0]},
                  "emitter": {"type": "area", "radiance": 10.0}},
    })
    img, aovs = integrators.render(scene, seed=3, return_aovs=True)
    s0 = float(np.asarray(img)[0, 0, 1])
    s1 = float(aovs["s1"][0, 0])
    s2 = float(aovs["s2"][0, 0])
    s3 = float(aovs["s3"][0, 0])
    assert s0 > 1e-3, s0
    dop = np.sqrt(s1 * s1 + s2 * s2 + s3 * s3) / s0
    # gold at 45deg incidence: clearly partial polarization, not full
    assert 0.02 < dop < 0.9, (dop, s0, s1, s2, s3)
    # physical: |S_i| <= S0
    assert max(abs(s1), abs(s2), abs(s3)) <= s0 * (1 + 1e-4)


def test_stokes_diffuse_depolarizes():
    """Diffuse scattering fully depolarizes: polarizer -> diffuse wall ->
    camera yields DOP ~ 0 even though the illumination is polarized."""
    from eradiate_kernel_tpu.scene import load_dict

    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "stokes",
                       "child": {"type": "path", "max_depth": 3}},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 64}},
        "env": {"type": "constant", "radiance": 1.0},
        "wall": {"type": "rectangle",
                 "to_world": {"type": "look_at", "origin": [0, 0, 1],
                              "target": [0, 0, -4], "up": [0, 1, 0]},
                 "bsdf": {"type": "diffuse", "reflectance": 0.8}},
    })
    img, aovs = integrators.render(scene, seed=5, return_aovs=True)
    s0 = float(np.asarray(img)[0, 0, 1])
    dop = np.hypot(float(aovs["s1"][0, 0]), float(aovs["s2"][0, 0])) / s0
    assert s0 > 0.1
    assert dop < 0.02, dop


def test_stokes_glass_reflection_highly_polarized():
    """45deg specular reflection off smooth glass: Rs/Rp = 0.092/0.0085 for
    eta=1.5 -> DOP ~ 0.83 (dielectric.cpp:250-307 Mueller path)."""
    from eradiate_kernel_tpu.scene import load_dict

    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "stokes",
                       "child": {"type": "path", "max_depth": 3}},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 32}},
        "glass": {"type": "rectangle",
                  "to_world": {"type": "look_at", "origin": [0, 0, 0],
                               "target": [0, 1, -1], "up": [0, 1, 1]},
                  "bsdf": {"type": "dielectric"}},
        "light": {"type": "rectangle",
                  "to_world": {"type": "look_at", "origin": [0, 40, 0],
                               "target": [0, 0, 0], "up": [1, 0, 0]},
                  "emitter": {"type": "area", "radiance": 10.0}},
    })
    img, aovs = integrators.render(scene, seed=7, return_aovs=True)
    s0 = float(np.asarray(img)[0, 0, 1])
    s1 = float(aovs["s1"][0, 0])
    s2 = float(aovs["s2"][0, 0])
    assert s0 > 1e-4, s0
    dop = np.hypot(s1, s2) / s0
    assert 0.6 < dop <= 1.001, (dop, s0, s1, s2)


# ---------------------------------------------------------------------------
# polarized VOLUMETRIC transport (integrators/polarized_vol.py)
# ---------------------------------------------------------------------------

def _atmo_scene(phase_dict, width=4, spp=2):
    from eradiate_kernel_tpu.scene import load_dict

    return load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 6},
        "sensor": {"type": "perspective", "fov": 60.0,
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, 3.0],
                                "target": [0.5, 0.5, 0.0], "up": [0, 1, 0]},
                   "film": {"width": width, "height": width,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "surface": {"type": "rectangle",
                    "to_world": [{"type": "scale", "value": 20.0},
                                 {"type": "translate",
                                  "value": [0.5, 0.5, 0.0]}],
                    "bsdf": {"type": "diffuse", "reflectance": 0.4}},
        "atmo": {"type": "cube",
                 "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]},
                              {"type": "translate",
                               "value": [0.5, 0.5, 0.5]}],
                 "bsdf": {"type": "null"},
                 "interior": {"type": "homogeneous", "sigma_t": 0.4,
                              "albedo": 0.8, "phase": phase_dict}},
        "sun": {"type": "directional", "direction": [0.3, 0.0, -0.94],
                "irradiance": 1.0},
    })


def _camera_rays(sc, n=64, res=4, spp=2, seed=0):
    from eradiate_kernel_tpu import sensors
    from eradiate_kernel_tpu.core.rng import Sampler

    lane = jnp.arange(n, dtype=jnp.uint32)
    smp = Sampler.seed(seed, lane)
    smp, jit2 = smp.next_2d()
    pix = lane // spp
    pos = jnp.stack([(pix % res).astype(jnp.float32),
                     (pix // res).astype(jnp.float32)], -1) + jit2
    ray, _w, smp = sensors.sample_ray(sc, smp, pos / res, jnp.zeros(n))
    return ray, smp


def test_polarized_volpath_s0_matches_scalar():
    """With a polarization-preserving medium (isotropic phase: scalar Mueller
    factors) and depolarizing ground, the Mueller volpath's S0 must equal the
    scalar volpath per sample, and no polarization may appear (unpolarized
    sources)."""
    from eradiate_kernel_tpu.integrators import polarized_vol, volpath

    sc = _atmo_scene({"type": "isotropic"})
    ray, smp = _camera_rays(sc)
    spec, _v, _s = volpath.sample(sc, smp, ray)
    stokes, _v2, _s2 = polarized_vol.sample_stokes(sc, smp, ray)
    assert np.allclose(np.asarray(spec), np.asarray(stokes[..., 0]),
                       rtol=1e-5, atol=1e-7)
    assert float(np.abs(np.asarray(stokes[..., 1:])).max()) == 0.0


def test_polarized_volpath_rayleigh_polarizes():
    """Rayleigh media must produce linear polarization (S1/S2) and shift S0
    from the scalar estimate (the known scalar-RT error of Rayleigh
    atmospheres); circular polarization stays zero for unpolarized sources
    and Rayleigh-only scattering."""
    from eradiate_kernel_tpu.integrators import polarized_vol, volpath

    sc = _atmo_scene({"type": "rayleigh"})
    ray, smp = _camera_rays(sc)
    stokes, _v, _s = polarized_vol.sample_stokes(sc, smp, ray)
    s = np.asarray(stokes)
    assert np.isfinite(s).all()
    assert np.abs(s[..., 1:3]).max() > 1e-4, "no linear polarization produced"
    # Rayleigh + depolarizing ground cannot create circular polarization
    assert np.abs(s[..., 3]).max() < 1e-6
    # physical sanity: |(S1,S2,S3)| <= S0 per channel wherever S0 > 0
    lanes = s[..., 0] > 1e-6
    dop = np.sqrt((s[..., 1:] ** 2).sum(-1))[lanes] / s[..., 0][lanes]
    assert (dop <= 1.0 + 1e-4).all(), dop.max()


def test_rayleigh_scatter_matrix():
    """Unit checks of the Rayleigh Mueller matrix: M00 is the scalar phase
    value; 90-degree scattering of unpolarized light is fully linearly
    polarized perpendicular to the scattering plane."""
    from eradiate_kernel_tpu.core import mueller as mu

    m90 = np.asarray(mu.rayleigh_scatter(jnp.array(0.0)))
    k = 3.0 / (16.0 * np.pi)
    assert np.isclose(m90[0, 0], k)
    s_out = m90 @ np.array([1.0, 0, 0, 0])
    assert np.isclose(s_out[1] / s_out[0], 1.0)  # DoP = 1 at 90 deg
    # forward scattering: no polarization of unpolarized light
    m0 = np.asarray(mu.rayleigh_scatter(jnp.array(1.0)))
    s_fwd = m0 @ np.array([1.0, 0, 0, 0])
    assert np.isclose(s_fwd[1], 0.0) and np.isclose(s_fwd[0], 2 * k)


def test_stokes_integrator_volumetric():
    """The stokes wrapper dispatches to the Mueller volpath for scenes with
    media and returns S1..S3 AOVs."""
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.scene import load_dict

    d = {
        "type": "scene",
        "integrator": {"type": "stokes", "max_depth": 6},
        "sensor": {"type": "perspective", "fov": 60.0,
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, 3.0],
                                "target": [0.5, 0.5, 0.0], "up": [0, 1, 0]},
                   "film": {"width": 4, "height": 4,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "atmo": {"type": "cube",
                 "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]},
                              {"type": "translate",
                               "value": [0.5, 0.5, 0.5]}],
                 "bsdf": {"type": "null"},
                 "interior": {"type": "homogeneous", "sigma_t": 0.6,
                              "albedo": 0.9,
                              "phase": {"type": "rayleigh"}}},
        "sun": {"type": "directional", "direction": [1.0, 0.0, -0.2],
                "irradiance": 5.0},
    }
    img, aovs = integrators.render(load_dict(d), return_aovs=True)
    assert set(aovs) == {"s1", "s2", "s3"}
    assert np.isfinite(np.asarray(img)).all()
    s1 = np.abs(np.asarray(aovs["s1"])).max()
    s2 = np.abs(np.asarray(aovs["s2"])).max()
    assert s1 + s2 > 1e-4, "volumetric stokes produced no polarization"


def test_roughdielectric_mueller_consistency():
    """roughdielectric eval_mueller: M[0,0] equals the scalar eval value
    (S0 parity) and unpolarized input yields DoP <= 1."""
    import jax
    from eradiate_kernel_tpu import bsdfs, sensors
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu.render.geometry import ray_intersect
    from eradiate_kernel_tpu.render.geometry import compute_surface_interaction

    sc = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 45.0,
                   "to_world": {"type": "look_at", "origin": [0, 0, 4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": 4, "height": 4,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 1}},
        "s": {"type": "sphere", "radius": 1.0,
              "bsdf": {"type": "roughdielectric", "alpha": 0.3,
                       "int_ior": 1.5, "ext_ior": 1.0}},
    })
    n = 64
    smp = Sampler.seed(0, jnp.arange(n, dtype=jnp.uint32))
    smp, j2 = smp.next_2d()
    pix = jnp.arange(n, dtype=jnp.uint32) % 16
    pos = jnp.stack([(pix % 4).astype(jnp.float32),
                     (pix // 4).astype(jnp.float32)], -1) + j2
    ray, _w, smp = sensors.sample_ray(sc, smp, pos / 4.0, jnp.zeros(n))
    si = ray_intersect(sc.geo, ray)
    act = si.is_valid
    bsdf_idx = jnp.zeros(n, jnp.int32)

    # random directions in both hemispheres
    smp, u = smp.next_2d()
    z = 2.0 * u[..., 0] - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[..., 1]
    wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)

    val, pdf = bsdfs.bsdf_eval_pdf(sc, bsdf_idx, si, wo, act)
    m, pdf2 = bsdfs.bsdf_eval_mueller(sc, bsdf_idx, si, wo, act)
    v = np.asarray(val)
    m00 = np.asarray(m[..., 0, 0])
    assert np.allclose(m00, v, rtol=1e-4, atol=1e-6), \
        np.abs(m00 - v).max()
    # unpolarized input: |(S1,S2,S3)| <= S0
    s_out = np.asarray(m[..., :, 0])
    dop_num = np.sqrt((s_out[..., 1:] ** 2).sum(-1))
    ok = s_out[..., 0] > 1e-9
    assert (dop_num[ok] <= s_out[..., 0][ok] * (1 + 1e-4)).all()
    # polarization is actually produced at glancing reflections
    assert dop_num.max() > 1e-6


def test_phase_mueller_physical_validity():
    """phase_mueller for rayleigh media: M[0,0] equals the scalar phase for
    random direction pairs (S0 parity after the world-basis rotations), and
    the matrix maps physical Stokes vectors (DoP <= 1) to physical ones."""
    from eradiate_kernel_tpu import phase as ph
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    sc = load_dict(atmosphere(width=4, height=4, spp=2, max_depth=4))
    n = 256
    rng = np.random.RandomState(3)
    wi = rng.randn(n, 3).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rng.randn(n, 3).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    idx = jnp.zeros(n, jnp.int32)

    val = np.asarray(ph.phase_eval(sc, idx, jnp.asarray(wi), jnp.asarray(wo)))
    m = np.asarray(ph.phase_mueller(sc, idx, jnp.asarray(wi),
                                    jnp.asarray(wo)))
    assert np.allclose(m[..., 0, 0], val, rtol=1e-5, atol=1e-7)

    # random physical input Stokes vectors
    s_in = rng.randn(n, 4).astype(np.float32)
    s_in[:, 0] = np.abs(s_in[:, 0]) + np.linalg.norm(s_in[:, 1:], axis=-1)
    s_out = np.einsum("nij,nj->ni", m, s_in)
    ok = s_out[:, 0] > 1e-9
    dop = np.linalg.norm(s_out[ok, 1:], axis=-1) / s_out[ok, 0]
    assert (dop <= 1.0 + 1e-4).all(), dop.max()


def test_stokes_regen_driver_equivalence():
    """stokes(volpath) on the regenerating lane pool must reproduce the
    scan driver's S0 image and S1..S3 AOVs (polarized_vol regen hooks:
    sensor-basis rotation premultiplied at refill == post-rotation of the
    scan path, by linearity of the Mueller chain)."""
    import sys
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.scene import load_dict

    d = {
        "type": "scene",
        "integrator": {"type": "stokes", "max_depth": 6},
        "sensor": {"type": "perspective", "fov": 60.0,
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, 3.0],
                                "target": [0.5, 0.5, 0.0], "up": [0, 1, 0]},
                   "film": {"width": 6, "height": 6,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "surface": {"type": "rectangle",
                    "to_world": [{"type": "scale", "value": 20.0},
                                 {"type": "translate",
                                  "value": [0.5, 0.5, 0.0]}],
                    "bsdf": {"type": "diffuse", "reflectance": 0.4}},
        "atmo": {"type": "cube",
                 "to_world": [{"type": "scale", "value": [20.0, 20.0, 0.5]},
                              {"type": "translate",
                               "value": [0.5, 0.5, 0.5]}],
                 "bsdf": {"type": "null"},
                 "interior": {"type": "homogeneous", "sigma_t": 0.6,
                              "albedo": 0.9,
                              "phase": {"type": "rayleigh"}}},
        "sun": {"type": "directional", "direction": [1.0, 0.0, -0.2],
                "irradiance": 5.0},
    }
    sc = load_dict(d)
    assert integrators.regen_supported(sc.config)
    img_a, aovs_a = integrators.render(sc, seed=3, return_aovs=True)
    img_b, aovs_b = integrators.render(sc, seed=3, return_aovs=True,
                                       regen=True)
    conftest = sys.modules["conftest"]
    conftest.assert_driver_equivalent(img_a, img_b, max_flips=1)
    for k in ("s1", "s2", "s3"):
        conftest.assert_driver_equivalent(
            np.asarray(aovs_a[k])[..., None],
            np.asarray(aovs_b[k])[..., None], max_flips=1)


def test_stokes_surface_regen_driver_equivalence():
    """Pure-surface stokes(path) on the regenerating lane pool: the
    restructured polarized._bounce (fresh-lane intersection at entry,
    next-vertex intersection at exit) must reproduce the scan driver
    sample-for-sample, including optical-element Mueller chains."""
    import sys
    from eradiate_kernel_tpu import integrators

    scene = _bench_scene([{"type": "polarizer", "theta": 30.0},
                          {"type": "retarder", "theta": 15.0,
                           "delta": 90.0}], spp=32)
    assert integrators.regen_supported(scene.config)
    img_a, aovs_a = integrators.render(scene, seed=5, return_aovs=True)
    img_b, aovs_b = integrators.render(scene, seed=5, return_aovs=True,
                                       regen=True)
    conftest = sys.modules["conftest"]
    conftest.assert_driver_equivalent(img_a, img_b)
    for k in ("s1", "s2", "s3"):
        conftest.assert_driver_equivalent(
            np.asarray(aovs_a[k])[..., None],
            np.asarray(aovs_b[k])[..., None])
