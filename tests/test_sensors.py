"""Sensor tests (analog of src/sensors/tests/test_distant.py etc.):
analytic radiance/flux gates for the Eradiate sensor suite."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.core.types import Variant


def env_scene(sensor, radiance=0.7, extra=None, spp=32, variant=None):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {**sensor,
                   "sampler": {"type": "independent", "sample_count": spp}},
        "env": {"type": "constant", "radiance": radiance},
    }
    if extra:
        d.update(extra)
    return load_dict(d, variant)


def film(sensor, **kw):
    scene = env_scene(sensor, **kw)
    return np.asarray(integrators.render(scene, seed=1))


def test_distant_single_direction():
    # rays travel along -direction (distant.cpp:314-332)
    img = film({"type": "distant", "direction": [0, 0, 1],
                "film": {"width": 1, "height": 1,
                         "rfilter": {"type": "box"}}})
    assert img.shape[:2] == (1, 1)
    assert np.allclose(img, 0.7, atol=1e-3), img


def test_distant_plane_mode():
    # point target: weight 1, so the constant env reads back exactly
    img = film({"type": "distant", "target": [0.0, 0.0, 0.0],
                "film": {"width": 8, "height": 1,
                         "rfilter": {"type": "box"}}})
    assert img.shape[:2] == (1, 8)
    assert np.allclose(img, 0.7, atol=1e-3), img


def test_distant_hemisphere_mode():
    img = film({"type": "distant", "target": [0.0, 0.0, 0.0],
                "film": {"width": 4, "height": 4,
                         "rfilter": {"type": "box"}}})
    assert np.allclose(img, 0.7, atol=1e-3), img


def test_distant_cross_section_cosine_weight():
    """Default (cross-section) targeting divides the weight by
    dot(-d, z_world) (distant.cpp:357-366): a slanted view of a constant
    env reads radiance / cos(theta)."""
    direction = [0.6, 0.0, 0.8]  # rays travel -direction; -d = +direction
    img = film({"type": "distant", "direction": direction,
                "film": {"width": 1, "height": 1,
                         "rfilter": {"type": "box"}}})
    assert np.allclose(img, 0.7 / 0.8, atol=1e-3), img


def test_distant_sees_surface():
    """Distant sensor looking straight down at a big white rect lit by the
    env: L = albedo * L_env for a Lambertian plane under uniform sky."""
    # point target: the default cross-section disk extends past the rect
    # and would (correctly) average in the background
    img = film({"type": "distant", "direction": [0, 0, 1],
                "target": [0.0, 0.0, 0.0],
                "film": {"width": 1, "height": 1,
                         "rfilter": {"type": "box"}}},
               radiance=1.0, spp=512,
               extra={"surf": {"type": "rectangle",
                               "to_world": {"type": "scale", "value": 100.0},
                               "bsdf": {"type": "diffuse",
                                        "reflectance": 0.4}}})
    assert np.allclose(img, 0.4, atol=0.02), img


def test_distant_point_target():
    img = film({"type": "distant", "direction": [0, 0, 1],
                "target": [0.0, 0.0, 0.0],
                "film": {"width": 1, "height": 1,
                         "rfilter": {"type": "box"}}})
    assert np.allclose(img, 0.7, atol=1e-3), img


def test_mdistant():
    dirs = [[0, 0, -1], [0.6, 0, -0.8], [0, 0.6, -0.8]]
    img = film({"type": "mdistant", "directions": dirs})
    assert img.shape[:2] == (1, 3)
    assert np.allclose(img, 0.7, atol=1e-3), img


def test_mradiancemeter():
    img = film({"type": "mradiancemeter",
                "origins": [[0, 0, 3], [5, 5, 3]],
                "directions": [[0, 0, -1], [0, 0, 1]]})
    assert img.shape[:2] == (1, 2)
    assert np.allclose(img, 0.7, atol=1e-3), img


def test_distantflux_constant_env():
    """Hemispherical flux of a unit-radiance constant env is pi; the film
    SUM carries it (cosine-warp strata)."""
    scene = env_scene({"type": "distantflux",
                       "film": {"width": 4, "height": 4,
                                "rfilter": {"type": "box"}}},
                      radiance=1.0)
    img = np.asarray(integrators.render(scene, seed=1))
    assert img.sum(axis=(0, 1))[1] == pytest.approx(np.pi, rel=0.01), \
        img.sum(axis=(0, 1))


def test_irradiancemeter_constant_env():
    """Irradiance on a surface under a unit-radiance uniform sky is pi."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "meter_shape": {"type": "rectangle",
                        "to_world": {"type": "translate",
                                     "value": [0, 0, 0]},
                        "bsdf": {"type": "diffuse", "reflectance": 0.0}},
        "sensor": {"type": "irradiancemeter",
                   "shape": {"type": "ref", "id": "meter_shape"},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 256}},
        "env": {"type": "constant", "radiance": 1.0},
    })
    img = np.asarray(integrators.render(scene, seed=2))
    assert img[0, 0, 1] == pytest.approx(np.pi, rel=0.02), img


def test_srf_sampling_support_and_weight():
    """srf-importance-sampled wavelengths stay inside the srf support and
    carry the srf integral as weight (perspective.cpp:173-181)."""
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu import sensors

    scene = env_scene({"type": "perspective",
                       "film": {"width": 4, "height": 4,
                                "rfilter": {"type": "box"}},
                       "srf": {"type": "regular", "lambda_min": 500.0,
                               "lambda_max": 600.0, "values": [1.0, 1.0]}},
                      variant=Variant("spectral"))
    n = 4096
    smp = Sampler.seed(0, jnp.arange(n, dtype=jnp.uint32))
    pos = jnp.full((n, 2), 0.5)
    ray, weight, _ = sensors.sample_ray(scene, smp, pos, jnp.zeros(n))
    wl = np.asarray(ray.wavelengths)
    assert wl.shape[-1] == 4
    assert wl.min() >= 500.0 - 1e-3 and wl.max() <= 600.0 + 1e-3
    assert np.allclose(np.asarray(weight), 100.0, rtol=1e-3)  # integral
    # stratification: the 4 hero wavelengths of one lane span the support
    spread = wl.max(axis=1) - wl.min(axis=1)
    assert (spread > 50.0).all()


def test_srf_render_matches_uniform_reference():
    """Flat-spectrum env rendered through a flat srf must match the
    srf-integral-weighted analytic value: film records
    integral(srf * L * ybar) under the luminance channel."""
    from eradiate_kernel_tpu.core import spectrum as sp

    sensor = {"type": "perspective",
              "film": {"width": 4, "height": 4, "rfilter": {"type": "box"}},
              "srf": {"type": "regular", "lambda_min": 360.0,
                      "lambda_max": 830.0, "values": [1.0, 1.0]}}
    scene = env_scene(sensor, radiance=1.0, spp=256,
                      variant=Variant("spectral"))
    img = np.asarray(integrators.render(scene, seed=3))
    # integral of the normalized ybar over the srf support = 1 by table
    # normalization; weight = srf integral; estimator divides by the range
    # via the uniform-pdf-free srf sampler -> expect Y ~= 1
    y = sp.luminance(jnp.asarray(img)).mean()
    assert float(y) == pytest.approx(1.0, rel=0.05), float(y)


# ---------------------------------------------------------------------------
# animated sensor transforms + shutter (transform.h:364 AnimatedTransform)
# ---------------------------------------------------------------------------

def test_animated_transform_interpolation():
    """Keyframe endpoints reproduce exactly; translation lerps; rotation
    slerps (45 deg at the midpoint of a 0->90 deg sweep)."""
    from eradiate_kernel_tpu.core.transform import (AnimatedTransform,
                                                    as_transform)

    at = AnimatedTransform.from_keyframes([
        (0.0, {"type": "look_at", "origin": [0, 0, 3],
               "target": [0, 0, 0], "up": [0, 1, 0]}),
        (1.0, {"type": "look_at", "origin": [2, 0, 3],
               "target": [2, 0, 0], "up": [0, 1, 0]}),
    ])
    ref0 = as_transform({"type": "look_at", "origin": [0, 0, 3],
                         "target": [0, 0, 0], "up": [0, 1, 0]})
    assert np.allclose(np.asarray(at.eval(jnp.asarray(0.0)).m),
                       np.asarray(ref0.m), atol=1e-5)
    assert np.allclose(np.asarray(at.eval(jnp.asarray(0.5)).translation),
                       [1.0, 0.0, 3.0], atol=1e-5)

    at2 = AnimatedTransform.from_keyframes([
        (0.0, {"type": "rotate", "axis": [0, 0, 1], "angle": 0.0}),
        (1.0, {"type": "rotate", "axis": [0, 0, 1], "angle": 90.0}),
    ])
    v = np.asarray(at2.eval(jnp.asarray(0.5))
                   .transform_vector(jnp.asarray([1.0, 0.0, 0.0])))
    s = np.sqrt(0.5)
    assert np.allclose(v, [s, s, 0.0], atol=1e-5)


def test_motion_blur_camera():
    """An animated camera with a shutter interval spreads ray origins over
    the keyframe path and changes the rendered image."""
    from eradiate_kernel_tpu.utils.scenes import cornell_box
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu import integrators, sensors

    d = cornell_box(width=8, height=8, spp=4, max_depth=3)
    d["sensor"]["to_world"] = {"type": "animation", "keyframes": [
        [0.0, {"type": "look_at", "origin": [0, 0, -3.9],
               "target": [0, 0, 0], "up": [0, 1, 0]}],
        [1.0, {"type": "look_at", "origin": [0.4, 0, -3.9],
               "target": [0.4, 0, 0], "up": [0, 1, 0]}],
    ]}
    d["sensor"]["shutter_open"] = 0.0
    d["sensor"]["shutter_close"] = 1.0
    sc = load_dict(d)

    n = 64
    smp = Sampler.seed(0, jnp.arange(n, dtype=jnp.uint32))
    smp, _j = smp.next_2d()
    pos = jnp.full((n, 2), 0.5)
    ray, _w, smp = sensors.sample_ray(sc, smp, pos, jnp.zeros(n))
    ox = np.asarray(ray.o[:, 0])
    assert ox.min() < 0.05 and ox.max() > 0.35  # spans the keyframe sweep

    img = np.asarray(integrators.render(sc))
    assert np.isfinite(img).all() and img.mean() > 0.05
    d_static = cornell_box(width=8, height=8, spp=4, max_depth=3)
    img_static = np.asarray(integrators.render(load_dict(d_static)))
    assert not np.allclose(img, img_static, atol=1e-3)


def test_animation_xml_tag(tmp_path):
    """<animation name="to_world"> parses into keyframes (xml.cpp
    Tag::Animation)."""
    from eradiate_kernel_tpu.scene.xml import load_string

    xml = """<scene version="2.0.0">
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <animation name="to_world">
          <transform time="0">
            <translate x="0" y="0" z="-4"/>
          </transform>
          <transform time="1">
            <translate x="1" y="0" z="-4"/>
          </transform>
        </animation>
        <float name="shutter_open" value="0"/>
        <float name="shutter_close" value="1"/>
        <film type="hdrfilm">
          <integer name="width" value="4"/>
          <integer name="height" value="4"/>
        </film>
        <sampler type="independent"><integer name="sample_count" value="2"/></sampler>
      </sensor>
      <shape type="rectangle">
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant"><spectrum name="radiance" value="0.5"/></emitter>
    </scene>"""
    sc = load_string(xml)
    assert "to_world_anim" in sc.sensor
    from eradiate_kernel_tpu import integrators
    img = np.asarray(integrators.render(sc))
    assert np.isfinite(img).all()


def test_parse_fov_axes():
    """parse_fov (sensor.cpp:113-165): fov_axis x/y/smaller/larger/
    diagonal and the 35mm-equivalent focal_length all reduce to the
    horizontal fov."""
    import math

    def tanx(sensor):
        scene = env_scene(sensor)
        return float(scene.sensor["tan_half_fov"])

    film = {"width": 32, "height": 16, "rfilter": {"type": "box"}}
    base = {"type": "perspective", "film": dict(film)}
    # x axis: tan directly
    assert tanx({**base, "fov": 40.0}) == pytest.approx(
        math.tan(math.radians(20.0)), rel=1e-6)
    # y axis: scaled by aspect = W/H = 2
    assert tanx({**base, "fov": 40.0, "fov_axis": "y"}) == pytest.approx(
        math.tan(math.radians(20.0)) * 2.0, rel=1e-6)
    # smaller == y for aspect > 1; larger == x
    assert tanx({**base, "fov": 40.0, "fov_axis": "smaller"}) == \
        pytest.approx(math.tan(math.radians(20.0)) * 2.0, rel=1e-6)
    assert tanx({**base, "fov": 40.0, "fov_axis": "larger"}) == \
        pytest.approx(math.tan(math.radians(20.0)), rel=1e-6)
    # diagonal
    diag = 2.0 * math.tan(math.radians(20.0))
    width = diag / math.sqrt(1.0 + 0.25)
    assert tanx({**base, "fov": 40.0, "fov_axis": "diagonal"}) == \
        pytest.approx(width / 2.0, rel=1e-6)
    # 50mm focal length on a square film -> ~34.02 deg horizontal
    sq = {"type": "perspective",
          "film": {"width": 16, "height": 16, "rfilter": {"type": "box"}}}
    assert tanx({**sq, "focal_length": "50mm"}) == pytest.approx(
        math.tan(math.radians(34.0222 / 2)), rel=1e-3)
    # default (no fov): the same 50mm
    assert tanx(sq) == pytest.approx(
        math.tan(math.radians(34.0222 / 2)), rel=1e-3)
    with pytest.raises(ValueError, match="focal length"):
        env_scene({**sq, "fov": 30.0, "focal_length": "50mm"})
