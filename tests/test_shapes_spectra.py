"""Cone/instance/serialized shapes + spectral upsampling tests."""

import struct
import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.core.types import Variant
from eradiate_kernel_tpu.scene import load_dict


def cam(w=8, spp=16, depth=3, origin=(0, 0, -4), target=(0, 0, 0)):
    return {"type": "perspective",
            "to_world": {"type": "look_at", "origin": list(origin),
                         "target": list(target), "up": [0, 1, 0]},
            "film": {"width": w, "height": w, "rfilter": {"type": "box"}},
            "sampler": {"sample_count": spp}}


def test_cone_depth():
    """Cone apex/base depths via the depth integrator."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "depth"},
        "sensor": cam(w=9, origin=(0, 0.5, -4), target=(0, 0.5, 0)),
        # base radius 1 at z(local)=0, apex at z(local)=1; rotate so the
        # axis points toward +y in world space
        "cone": {"type": "cone", "radius": 1.0, "length": 1.0,
                 "to_world": {"type": "rotate", "axis": [1, 0, 0],
                              "angle": -90.0}},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    center = img[4, 4, 0]
    assert center == pytest.approx(3.2, abs=0.4), center  # slanted surface
    assert img[0, 0, 0] == 0.0  # miss


def test_instance_flattening():
    """Two instances of a shapegroup = two spheres at different spots."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "depth"},
        "sensor": cam(w=16, spp=8),
        "grp": {"type": "shapegroup",
                "s": {"type": "sphere", "radius": 0.5,
                      "bsdf": {"type": "diffuse"}}},
        "i1": {"type": "instance",
               "to_world": {"type": "translate", "value": [-0.8, 0, 0]},
               "shapegroup": {"type": "ref", "id": "grp"}},
        "i2": {"type": "instance",
               "to_world": {"type": "translate", "value": [0.8, 0, 0]},
               "shapegroup": {"type": "ref", "id": "grp"}},
    })
    assert scene.geo.n_shapes == 2
    img = np.asarray(integrators.render(scene, seed=1))
    assert img[8, 3, 0] > 0 and img[8, 12, 0] > 0  # both spheres visible
    assert img[8, 8, 0] == 0.0                      # gap between them


def test_serialized_roundtrip(tmp_path):
    """Write a .serialized file (format of serialized.cpp) and load it."""
    verts = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                     np.float32)
    normals = np.tile([0, 0, -1], (4, 1)).astype(np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    flags = 0x0001 | 0x0002 | 0x1000  # normals | uvs | single precision
    payload = (struct.pack("<I", flags) + b"quad\x00"
               + struct.pack("<QQ", 4, 2)
               + verts.tobytes() + normals.tobytes() + uvs.tobytes()
               + faces.tobytes())
    blob = struct.pack("<HH", 0x041C, 4) + zlib.compress(payload)
    blob += struct.pack("<Q", 0) + struct.pack("<I", 1)
    path = tmp_path / "quad.serialized"
    path.write_bytes(blob)

    from eradiate_kernel_tpu.utils.meshio import load_serialized
    v, f, n, uv = load_serialized(str(path))
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert np.allclose(n[0], [0, 0, -1]) and np.allclose(uv[2], [1, 1])

    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "depth"},
        "sensor": cam(w=8, spp=4),
        "mesh": {"type": "serialized", "filename": str(path)},
    })
    img = np.asarray(integrators.render(scene, seed=0))
    assert img[4, 4, 0] == pytest.approx(4.0, abs=0.05)


def test_rgb2spec_fit_roundtrip():
    """Fitted sigmoid spectra reproduce the requested sRGB under D65."""
    from eradiate_kernel_tpu.utils.rgb2spec import (_LAM, _model, _projection,
                                                    fit_srgb_coeff)
    for rgb in [(0.7, 0.3, 0.1), (0.2, 0.5, 0.8), (0.5, 0.5, 0.5),
                (0.9, 0.9, 0.1)]:
        c = np.asarray(fit_srgb_coeff(*rgb))
        got = _projection() @ _model(c)
        assert np.allclose(got, rgb, atol=0.015), (rgb, got)


def test_spectral_render_preserves_color():
    """A colored diffuse rectangle lit by D65-ish env renders to ~the same
    rgb in spectral mode as in rgb mode (the point of spectral upsampling)."""
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "distant", "direction": [0, 0, 1],
                   "target": [0.0, 0.0, 0.0],
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 1024}},
        "floor": {"type": "rectangle",
                  "to_world": {"type": "scale", "value": 50.0},
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [0.6, 0.3, 0.1]}}},
        "env": {"type": "constant", "radiance": 1.0},
    }
    rgb_img = np.asarray(integrators.render(load_dict(d, Variant("rgb")),
                                            seed=1))[0, 0]
    spec_img = np.asarray(integrators.render(load_dict(d, Variant("spectral")),
                                             seed=1))[0, 0]
    # spectral mode uses a flat-1.0 env (uniform) rather than D65; compare
    # CHROMATICITY (ratios), which the upsampling must preserve
    assert np.allclose(spec_img / spec_img.sum(), rgb_img / rgb_img.sum(),
                       atol=0.06), (rgb_img, spec_img)


def test_discrete_srf_lines():
    """Discrete srf: hero wavelengths are exactly the requested lines."""
    from eradiate_kernel_tpu import sensors
    from eradiate_kernel_tpu.core.rng import Sampler

    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective",
                   "film": {"width": 2, "height": 2,
                            "rfilter": {"type": "box"}},
                   "srf": {"type": "discrete",
                           "wavelengths": [440.0, 550.0, 660.0],
                           "values": [1.0, 2.0, 1.0]}},
        "env": {"type": "constant", "radiance": 1.0},
    }, Variant("spectral"))
    n = 4096
    smp = Sampler.seed(0, jnp.arange(n, dtype=jnp.uint32))
    ray, w, _ = sensors.sample_ray(scene, smp, jnp.full((n, 2), 0.5),
                                   jnp.zeros(n))
    wl = np.asarray(ray.wavelengths).ravel()
    assert set(np.unique(wl).tolist()) <= {440.0, 550.0, 660.0}
    # pmf respected: the 550 line has twice the weight
    frac = (wl == 550.0).mean()
    assert frac == pytest.approx(0.5, abs=0.03)
    assert np.allclose(np.asarray(w), 4.0)  # sum of line weights


def test_mesh_attribute_texture():
    """Per-vertex color attribute interpolated across a triangle
    (mesh_attribute.cpp analog)."""
    verts = [[-2, -1, 0], [2, -1, 0], [0, 2, 0]]
    faces = [[0, 2, 1]]  # wound toward the camera at -z
    colors = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": cam(w=16, spp=32),
        "tri": {"type": "mesh", "vertices": verts, "faces": faces,
                "attributes": {"vertex_color": colors},
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "mesh_attribute",
                                         "name": "vertex_color"}}},
        "env": {"type": "constant", "radiance": 1.0},
    })
    img = np.asarray(integrators.render(scene, seed=1))
    # corners of the triangle are dominated by their vertex color; the
    # reference sample mapping (sensor.h:196-230) puts world +x on the
    # image's LEFT for a camera at -z, so the red vertex at x=-2 lands in
    # the image's bottom-RIGHT
    bottom_right = img[12, 11]
    top_center = img[3, 8]
    assert bottom_right[0] > bottom_right[2] * 2, bottom_right  # red-ish
    assert top_center[2] > top_center[0] * 2, top_center        # blue-ish


def test_spectral_envmap_upsampling_roundtrip():
    """Spectral variants upsample envmap texels to smooth spectra
    (envmap.cpp:69-89 rgb2spec scheme); projecting the evaluated spectrum
    back through the CIE/D65 matrix reproduces the texel rgb."""
    import math

    import jax.numpy as jnp

    from eradiate_kernel_tpu import emitters
    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.utils.rgb2spec import _LAM, _projection

    rng = np.random.default_rng(0)
    env = (0.1 + 0.8 * rng.random((8, 16, 3))).astype(np.float32)
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "sky": {"type": "envmap", "data": env},
    }, Variant("spectral"))
    texels = [(2, 3), (2, 10), (5, 3), (5, 10)]
    # reference y-up lat-long: d = (sin t sin p, cos t, -sin t cos p)
    d = jnp.asarray([[math.sin(y / 7 * math.pi) * math.sin(x / 16 * 2 * math.pi),
                      math.cos(y / 7 * math.pi),
                      -math.sin(y / 7 * math.pi) * math.cos(x / 16 * 2 * math.pi)]
                     for y, x in texels], jnp.float32)
    n = len(_LAM)
    wl = jnp.broadcast_to(jnp.asarray(_LAM, jnp.float32), (4, n))
    spec = np.asarray(emitters.envmap_eval(
        scene, scene.emitters["envmap"], jnp.zeros(4, jnp.int32), d, wl,
        jnp.ones(4, bool)))
    back = spec @ _projection().T
    expect = np.stack([env[y, x] for y, x in texels])
    assert np.abs(back - expect).max() < 1e-3


def test_spectral_bitmap_upsampling_roundtrip():
    """bitmap textures in spectral mode evaluate per-texel fitted spectra
    whose CIE/D65 projection reproduces the texel rgb (grid3d.cpp:69-89
    conversion applied to 2D textures)."""
    import jax.numpy as jnp

    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.render.texture import texture_eval
    from eradiate_kernel_tpu.utils.rgb2spec import _LAM, _projection

    rng = np.random.default_rng(1)
    img = (0.05 + 0.9 * rng.random((6, 6, 3))).astype(np.float32)
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "r": {"type": "rectangle",
              "bsdf": {"type": "diffuse",
                       "reflectance": {"type": "bitmap", "data": img}}},
    }, Variant("spectral"))
    tk = np.asarray(scene.tex_kind)
    kinds = scene.config.texture_kinds
    bi = [i for i, k in enumerate(tk) if kinds[k] == "bitmap"][0]
    n = len(_LAM)
    uv = jnp.asarray([[3 / 5, 2 / 5]], jnp.float32)  # texel (2, 3) center
    val = np.asarray(texture_eval(
        scene, jnp.full(1, bi, jnp.int32), uv,
        jnp.broadcast_to(jnp.asarray(_LAM, jnp.float32), (1, n))))
    back = val @ _projection().T
    assert np.abs(back[0] - img[2, 3]).max() < 1e-3
