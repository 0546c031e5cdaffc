"""Chi^2 coverage for scene-level sampling routines: shape area sampling,
area-emitter direction sampling, envmap importance sampling (the reference's
emitter/shape test pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu import emitters
from eradiate_kernel_tpu.core.rng import Sampler
from eradiate_kernel_tpu.render import shape_sampling
from eradiate_kernel_tpu.render.geometry import ray_intersect
from eradiate_kernel_tpu.render.records import SurfaceInteraction
from eradiate_kernel_tpu.core.frame import Frame
from eradiate_kernel_tpu.core.ray import Ray
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.utils.chi2 import (ChiSquareTest, PlanarDomain,
                                            SphericalDomain)

N = 150_000


def test_sphere_position_sampling_uniform():
    """sample_position on a sphere is uniform over the surface: positions
    mapped to directions from the center are uniform on S^2."""
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "s": {"type": "sphere", "center": [1.0, 2.0, 3.0], "radius": 2.0,
              "bsdf": {"type": "diffuse"}},
    })

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        ps = shape_sampling.sample_position(scene, jnp.zeros(n, jnp.int32),
                                            s1, s2)
        d = (ps.p - jnp.asarray([1.0, 2.0, 3.0])) / 2.0
        return np.asarray(d)

    def pdf_func(pts):
        return jnp.full(pts.shape[0], 1.0 / (4 * np.pi))

    t = ChiSquareTest(SphericalDomain(),
                      sample_func, pdf_func, sample_count=N, res=32, ires=9)
    assert t.run(0.01), "\n".join(t.messages)


def test_rect_position_sampling_uniform():
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "r": {"type": "rectangle", "bsdf": {"type": "diffuse"}},
    })

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        ps = shape_sampling.sample_position(scene, jnp.zeros(n, jnp.int32),
                                            s1, s2)
        return np.asarray(ps.p[:, :2])

    def pdf_func(pts):
        return jnp.full(pts.shape[0], 0.25)  # area 4

    t = ChiSquareTest(PlanarDomain(np.array([[-1, 1], [-1, 1]])),
                      sample_func, pdf_func, sample_count=N, res=24, ires=9)
    assert t.run(0.01), "\n".join(t.messages)


def _ref_si(scene, n, p):
    z = jnp.zeros(n)
    up = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    return SurfaceInteraction(
        t=jnp.ones(n), p=jnp.broadcast_to(jnp.asarray(p), (n, 3)),
        n=up, sh_frame=Frame.from_normal(up), uv=jnp.zeros((n, 2)),
        prim_uv=jnp.zeros((n, 2)), dp_du=up, dp_dv=up, wi=up,
        wavelengths=jnp.zeros((n, 0)), time=z,
        prim_index=jnp.zeros(n, jnp.int32),
        shape_index=jnp.zeros(n, jnp.int32))


def test_area_emitter_direction_chi2():
    """sample_emitter_direction vs pdf_emitter_direction for an area
    emitter seen from a fixed point (solid-angle measure consistency —
    the MIS correctness precondition)."""
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "light": {"type": "rectangle",
                  # rotate so the emissive front (+z local) faces the ref
                  "to_world": [{"type": "rotate", "axis": [1, 0, 0],
                                "angle": 180.0},
                               {"type": "translate", "value": [0, 0, 2]}],
                  "emitter": {"type": "area", "radiance": 1.0},
                  "bsdf": {"type": "diffuse"}},
    })
    ref_p = [0.2, -0.3, 0.0]

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        si = _ref_si(scene, n, ref_p)
        sampler, sp = sampler.next_1d()
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        ds, w = emitters.sample_emitter_direction(scene, si, sp, s1, s2,
                                                  jnp.ones(n, bool),
                                                  test_visibility=False)
        ok = (ds.pdf > 0).astype(jnp.float32)
        return np.asarray(ds.d), np.asarray(ok)

    def pdf_func(pts):
        n = pts.shape[0]
        o = jnp.broadcast_to(jnp.asarray(ref_p), (n, 3))
        ray = Ray.make(o, jnp.asarray(pts, jnp.float32),
                       wavelengths=jnp.zeros((n, 0)))
        si = ray_intersect(scene.geo, ray)
        return emitters.pdf_emitter_direction(scene, o, si, ~si.is_valid,
                                              jnp.ones(n, bool), d=ray.d)

    # restrict to the emitting cap: directions toward the rect from ref_p
    t = ChiSquareTest(SphericalDomain(cos_bounds=(0.5, 1.0)), sample_func,
                      pdf_func, sample_count=N, res=32, ires=9)
    assert t.run(0.01), "\n".join(t.messages)


def test_envmap_direction_chi2():
    """envmap importance sampling vs its pdf over the full sphere."""
    rng = np.random.default_rng(3)
    env = (0.1 + rng.random((16, 32, 3)) ** 3).astype(np.float32)
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "sky": {"type": "envmap", "data": env},
    })

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        si = _ref_si(scene, n, [0, 0, 0])
        sampler, sp = sampler.next_1d()
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        ds, w = emitters.sample_emitter_direction(scene, si, sp, s1, s2,
                                                  jnp.ones(n, bool),
                                                  test_visibility=False)
        return np.asarray(ds.d), np.asarray((ds.pdf > 0).astype(jnp.float32))

    def pdf_func(pts):
        n = pts.shape[0]
        slot = jnp.zeros(n, jnp.int32)
        return emitters.envmap_pdf_direction(
            scene, scene.emitters["envmap"], slot,
            jnp.asarray(pts, jnp.float32), jnp.ones(n, bool))

    # exclude the poles: per-solid-angle texel density ~1/sin(theta) is
    # integrable but breaks fixed-grid Simpson tabulation at cos = +/-1
    # ires=33: the pdf is piecewise-constant per texel with rows uniform
    # in theta, so discontinuities cross the cos-theta cell grid; fine
    # Simpson subdivision keeps the tabulation error below the chi2 noise
    t = ChiSquareTest(SphericalDomain(cos_bounds=(-0.97, 0.97)),
                      sample_func, pdf_func, sample_count=N, res=16, ires=33)
    assert t.run(0.01), "\n".join(t.messages)
