"""Shape intersection tests (analog of shape plugin tests + test_kdtrees)."""

import numpy as np
import jax
import jax.numpy as jnp

from eradiate_kernel_tpu.core.ray import Ray
from eradiate_kernel_tpu.core.transform import Transform
from eradiate_kernel_tpu.render.geometry import (
    compute_surface_interaction, ray_intersect, ray_intersect_preliminary)
from eradiate_kernel_tpu.scene import load_dict


def _single_shape_scene(shape_dict):
    return load_dict({
        "type": "scene",
        "shape": shape_dict,
        "sensor": {"type": "perspective",
                   "film": {"type": "hdrfilm", "width": 4, "height": 4}},
    })


def test_sphere_hit():
    scene = _single_shape_scene({"type": "sphere", "center": [0, 0, 0],
                                 "radius": 1.0})
    ray = Ray.make(jnp.asarray([[0.0, 0.0, -3.0], [0.0, 2.0, -3.0]]),
                   jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]))
    si = ray_intersect(scene.geo, ray)
    assert np.asarray(si.is_valid).tolist() == [True, False]
    assert abs(float(si.t[0]) - 2.0) < 1e-5
    assert np.allclose(np.asarray(si.n[0]), [0, 0, -1], atol=1e-5)
    assert np.allclose(np.asarray(si.p[0]), [0, 0, -1], atol=1e-5)


def test_rectangle_hit_uv():
    scene = _single_shape_scene({"type": "rectangle"})
    ray = Ray.make(jnp.asarray([[0.5, -0.5, -2.0]]),
                   jnp.asarray([[0.0, 0.0, 1.0]]))
    si = ray_intersect(scene.geo, ray)
    assert bool(si.is_valid[0])
    assert abs(float(si.t[0]) - 2.0) < 1e-5
    assert np.allclose(np.asarray(si.uv[0]), [0.75, 0.25], atol=1e-5)
    assert np.allclose(np.asarray(si.n[0]), [0, 0, 1], atol=1e-5)


def test_disk_hit():
    scene = _single_shape_scene({"type": "disk"})
    ray = Ray.make(jnp.asarray([[0.3, 0.0, -1.0], [0.0, 1.5, -1.0]]),
                   jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]))
    si = ray_intersect(scene.geo, ray)
    assert np.asarray(si.is_valid).tolist() == [True, False]


def test_mesh_hit_barycentric():
    scene = _single_shape_scene({
        "type": "mesh",
        "vertices": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        "faces": [[0, 1, 2]]})
    ray = Ray.make(jnp.asarray([[0.25, 0.25, -1.0]]),
                   jnp.asarray([[0.0, 0.0, 1.0]]))
    si = ray_intersect(scene.geo, ray)
    assert bool(si.is_valid[0])
    assert abs(float(si.t[0]) - 1.0) < 1e-5
    assert np.allclose(np.asarray(si.n[0]), [0, 0, 1], atol=1e-5) or \
        np.allclose(np.asarray(si.n[0]), [0, 0, -1], atol=1e-5)


def test_cube_closest_hit():
    scene = _single_shape_scene({"type": "cube"})
    ray = Ray.make(jnp.asarray([[0.0, 0.0, -5.0]]),
                   jnp.asarray([[0.0, 0.0, 1.0]]))
    si = ray_intersect(scene.geo, ray)
    assert bool(si.is_valid[0])
    assert abs(float(si.t[0]) - 4.0) < 1e-4


def test_cylinder_hit():
    scene = _single_shape_scene({
        "type": "cylinder",
        "to_world": Transform.rotate([1, 0, 0], -90).m,
        "radius": 0.5, "length": 2.0})
    # cylinder along +y after rotation, z in local = y world
    ray = Ray.make(jnp.asarray([[0.0, 1.0, -3.0]]),
                   jnp.asarray([[0.0, 0.0, 1.0]]))
    si = ray_intersect(scene.geo, ray)
    assert bool(si.is_valid[0])
    assert abs(float(si.t[0]) - 2.5) < 1e-4


def test_differentiable_hit_distance():
    """Gradient of hit distance w.r.t. ray origin — two-phase hit check."""
    scene = _single_shape_scene({"type": "rectangle"})

    def f(oz):
        ray = Ray.make(jnp.asarray([0.0, 0.0, oz]), jnp.asarray([0.0, 0.0, 1.0]))
        ray = jax.tree_util.tree_map(lambda a: a[None], ray)
        si = ray_intersect(scene.geo, ray)
        return si.t[0]

    g = jax.grad(f)(jnp.asarray(-2.0))
    assert abs(float(g) + 1.0) < 1e-4  # dt/d(oz) = -1


def test_mesh_vertex_gradient():
    """Gradients flow to vertex positions through the differentiable hit."""
    verts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

    def f(vz):
        scene = _single_shape_scene({
            "type": "mesh",
            "vertices": np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            "faces": [[0, 1, 2]]})
        geo = scene.geo
        import dataclasses
        v = geo.vertices.at[:, 2].add(vz)
        geo = dataclasses.replace(geo, vertices=v)
        ray = Ray.make(jnp.asarray([[0.25, 0.25, -1.0]]),
                       jnp.asarray([[0.0, 0.0, 1.0]]))
        si = ray_intersect(geo, ray)
        return si.t[0]

    g = jax.grad(f)(jnp.asarray(0.0))
    assert abs(float(g) - 1.0) < 1e-4  # moving tri +z by dz moves hit by dz
