"""True two-level instancing (shapegroup.h:6-62, instance.cpp:53-77):
group mesh geometry stored once, instances as transform records."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.core.transform import Transform


def _tri_bump(nx=6):
    """A little pyramid-field mesh, local frame centered at origin."""
    xs = np.linspace(-0.5, 0.5, nx)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = 0.25 * np.cos(np.pi * X) * np.cos(np.pi * Y)
    V = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(nx * nx).reshape(nx, nx)
    a, b, c, d = idx[:-1, :-1], idx[1:, :-1], idx[:-1, 1:], idx[1:, 1:]
    F = np.concatenate([np.stack([a, b, c], -1).reshape(-1, 3),
                        np.stack([b, d, c], -1).reshape(-1, 3)]).astype(
        np.int32)
    return V, F


def _instanced_scene(transforms, spp=16, bsdf=None):
    V, F = _tri_bump()
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 55.0,
                   "to_world": Transform.look_at([0, -2.2, 2.2], [0, 0, 0],
                                                 [0, 0, 1]).m,
                   "film": {"type": "hdrfilm", "width": 24, "height": 24,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "grp": {"type": "shapegroup",
                "bump": {"type": "mesh", "vertices": V, "faces": F,
                         "bsdf": bsdf or {"type": "diffuse",
                                          "reflectance": 0.6}}},
        "env": {"type": "constant", "radiance": 1.0},
    }
    for i, tw in enumerate(transforms):
        d[f"inst{i}"] = {"type": "instance",
                         "shapegroup": {"type": "ref", "id": "grp"},
                         "to_world": tw}
    return d


def _flattened_scene(transforms, spp=16, bsdf=None):
    V, F = _tri_bump()
    d = _instanced_scene([], spp=spp)
    del d["grp"]
    for i, tw in enumerate(transforms):
        m = np.asarray(Transform.from_any(tw).m) \
            if hasattr(Transform, "from_any") else None
        d[f"mesh{i}"] = {"type": "mesh", "vertices": V, "faces": F,
                         "to_world": tw,
                         "bsdf": bsdf or {"type": "diffuse",
                                          "reflectance": 0.6}}
    return d


TRANSFORMS = [
    [{"type": "translate", "value": [-0.7, 0.0, 0.0]}],
    [{"type": "translate", "value": [0.7, 0.3, 0.1]},
     {"type": "rotate", "axis": [0, 0, 1], "angle": 40.0}],
    [{"type": "translate", "value": [0.0, -0.6, 0.3]},
     {"type": "rotate", "axis": [1, 0, 0], "angle": 25.0},
     {"type": "scale", "value": 0.7}],
]


def test_instanced_matches_flattened_render():
    """N instances must render identically to N pre-transformed mesh
    copies (the flatten path is the oracle)."""
    img_i = np.asarray(integrators.render(
        load_dict(_instanced_scene(TRANSFORMS)), seed=5))
    img_f = np.asarray(integrators.render(
        load_dict(_flattened_scene(TRANSFORMS)), seed=5))
    assert img_i.shape == img_f.shape
    assert np.allclose(img_i, img_f, atol=2e-3), np.abs(img_i - img_f).max()


def test_instancing_shares_geometry():
    """Geometry memory must NOT scale with the instance count — that is the
    point of two-level instancing (VERDICT missing #7)."""
    s1 = load_dict(_instanced_scene(TRANSFORMS[:1]))
    s3 = load_dict(_instanced_scene(TRANSFORMS))
    assert s3.geo.ig_vertices.shape == s1.geo.ig_vertices.shape
    assert s3.geo.ig_faces.shape == s1.geo.ig_faces.shape
    assert s3.geo.n_instances == 3 and s1.geo.n_instances == 1
    # the flat (top-level) mesh pool stays empty
    assert s3.geo.faces.shape[0] == 0


def test_instanced_shadows():
    """An instance must occlude: a rotated instanced slab between a point
    light and the ground darkens the shadowed region."""
    V, F = _tri_bump()
    base = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 50.0,
                   "to_world": Transform.look_at([0, 0, 3], [0, 0, 0],
                                                 [0, 1, 0]).m,
                   "film": {"type": "hdrfilm", "width": 16, "height": 16,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 64}},
        "floor": {"type": "rectangle",
                  "to_world": {"type": "scale", "value": 3.0},
                  "bsdf": {"type": "diffuse", "reflectance": 0.8}},
        "lamp": {"type": "point", "position": [0, 0, 2.0],
                 "intensity": 20.0},
    }
    lit = np.asarray(integrators.render(load_dict(base), seed=3))
    occ = dict(base)
    occ["grp"] = {"type": "shapegroup",
                  "blk": {"type": "cube",
                          "to_world": {"type": "scale",
                                       "value": [0.4, 0.4, 0.02]},
                          "bsdf": {"type": "diffuse", "reflectance": 0.0}}}
    occ["blocker"] = {"type": "instance",
                      "shapegroup": {"type": "ref", "id": "grp"},
                      "to_world": {"type": "translate",
                                   "value": [0.0, 0.0, 1.0]}}
    dark = np.asarray(integrators.render(load_dict(occ), seed=3))
    c = lit.shape[0] // 2
    assert dark[c, c].mean() < 0.35 * lit[c, c].mean(), \
        (lit[c, c].mean(), dark[c, c].mean())
    # corners outside the shadow stay lit
    assert dark[0, 0].mean() > 0.6 * lit[0, 0].mean()


def test_instanced_normals_rotation():
    """Shading normals must rotate with the instance: the same face seen
    through a 180-degree-rotated instance of a tilted slab reflects the
    directional light differently, matching the flattened equivalent."""
    tfs = [[{"type": "rotate", "axis": [0, 1, 0], "angle": 30.0}]]
    img_i = np.asarray(integrators.render(
        load_dict(_instanced_scene(tfs, spp=32)), seed=7))
    img_f = np.asarray(integrators.render(
        load_dict(_flattened_scene(tfs, spp=32)), seed=7))
    assert np.allclose(img_i, img_f, atol=2e-3), np.abs(img_i - img_f).max()


def test_instanced_bvh_kernel_matches_naive():
    """The Pallas BVH path (interpret mode) with instanced leaves — ray
    transform at the leaf, shape-base offset — must reproduce the naive
    scan-over-instances render exactly."""
    import os

    d = _instanced_scene(TRANSFORMS)
    scene = load_dict(d)
    os.environ["ERT_ACCEL"] = "naive"
    try:
        ref = np.asarray(integrators.render(scene, seed=9))
    finally:
        os.environ.pop("ERT_ACCEL", None)
    os.environ["ERT_ACCEL"] = "bvh"
    os.environ["ERT_ACCEL_INTERPRET"] = "1"
    try:
        img = np.asarray(integrators.render(scene, seed=9))
    finally:
        os.environ.pop("ERT_ACCEL", None)
        os.environ.pop("ERT_ACCEL_INTERPRET", None)
    assert np.allclose(img, ref, atol=1e-4), np.abs(img - ref).max()


def test_instanced_bvh_kernel_mixed_scene():
    """Instances + a regular top-level mesh in one BVH: identity leaves and
    instanced leaves coexist."""
    import os

    d = _instanced_scene(TRANSFORMS[:2])
    V, F = _tri_bump()
    d["plain"] = {"type": "mesh", "vertices": V + [0.0, 1.2, 0.0],
                  "faces": F,
                  "bsdf": {"type": "diffuse", "reflectance": 0.3}}
    scene = load_dict(d)
    os.environ["ERT_ACCEL"] = "naive"
    try:
        ref = np.asarray(integrators.render(scene, seed=11))
    finally:
        os.environ.pop("ERT_ACCEL", None)
    os.environ["ERT_ACCEL"] = "bvh"
    os.environ["ERT_ACCEL_INTERPRET"] = "1"
    try:
        img = np.asarray(integrators.render(scene, seed=11))
    finally:
        os.environ.pop("ERT_ACCEL", None)
        os.environ.pop("ERT_ACCEL_INTERPRET", None)
    assert np.allclose(img, ref, atol=1e-4), np.abs(img - ref).max()


def test_instance_pose_gradient_matches_fd():
    """Instance transforms are differentiable scene parameters: the
    gradient of image brightness w.r.t. an instance rotation angle matches
    finite differences (the two-phase hit re-derives the interaction
    through the instance transform, so pose gradients flow — canopy pose
    optimization, the differentiable-rendering counterpart of
    instance.cpp's to_world parameter)."""
    import dataclasses

    import jax

    V = np.array([[-3, -3, 0], [3, -3, 0], [3, 3, 0], [-3, 3, 0]],
                 np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 30.0,
                   "to_world": Transform.look_at([0, 0, 4], [0, 0, 0],
                                                 [0, 1, 0]).m,
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 16}},
        "grp": {"type": "shapegroup",
                "quad": {"type": "mesh", "vertices": V, "faces": F,
                         "bsdf": {"type": "diffuse", "reflectance": 0.7}}},
        "inst": {"type": "instance",
                 "shapegroup": {"type": "ref", "id": "grp"}},
        "sun": {"type": "directional", "direction": [0.3, 0.2, -0.93],
                "irradiance": 2.0},
    })

    def render_at(angle):
        c, s = jnp.cos(angle), jnp.sin(angle)
        R = jnp.eye(4)
        R = R.at[1, 1].set(c).at[1, 2].set(-s) \
             .at[2, 1].set(s).at[2, 2].set(c)
        l2w = Transform(m=R[None], inv_t=R.T.T[None])
        w2l = Transform(m=R.T[None], inv_t=R.T[None])
        geo2 = dataclasses.replace(
            scene.geo, inst_l2w=l2w, inst_w2l=w2l,
            inst_lo=jnp.full((1, 3), -10.0),
            inst_hi=jnp.full((1, 3), 10.0))
        sc = dataclasses.replace(scene, geo=geo2)
        return jnp.mean(integrators.render(sc, seed=4))

    g = float(jax.grad(render_at)(jnp.float32(0.25)))
    h = 1e-2
    fd = float((render_at(jnp.float32(0.25 + h))
                - render_at(jnp.float32(0.25 - h))) / (2 * h))
    assert abs(fd) > 1e-3  # the pose actually matters
    assert abs(g - fd) < 0.02 * abs(fd), (g, fd)
