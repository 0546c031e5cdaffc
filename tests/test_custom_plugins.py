"""User-defined plugin registration (the trampoline analog: the reference
lets Python subclasses register as plugins, integrator_v.cpp:167 /
phase/tests/test_trampoline.py). Here custom kinds are plain modules of pure
functions plugged into the dispatch registries."""

import types

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.core.transform import Transform


def _volpath_scene(phase=None, emitter=None, spp=64):
    med = {"type": "homogeneous", "sigma_t": 1.0, "albedo": 1.0}
    if phase:
        med["phase"] = phase
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 64, "rr_depth": 1000},
        "sensor": {"type": "perspective", "fov": 30.0,
                   "to_world": Transform.look_at([0, 0, -4], [0, 0, 0],
                                                 [0, 1, 0]).m,
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": spp}},
        "bound": {"type": "sphere", "radius": 1.0, "interior": med},
        "env": {"type": "constant", "radiance": 1.0},
    }
    if emitter:
        d["extra_emitter"] = emitter
    return d


def _register_hg_variant():
    """A user HG-variant phase with its own parameter name, implemented
    exactly like the built-in hg — so the rendered images must agree."""
    from eradiate_kernel_tpu import phase as ph

    mod = types.SimpleNamespace()

    def build(props, builder):
        return {"aniso": np.float32(props.get("anisotropy", 0.0))}

    def eval_cos(params, slot, ct):
        g = params["g" if "g" in params else "aniso"][slot]
        temp = 1.0 + g * g + 2.0 * g * ct
        return (1.0 / (4.0 * jnp.pi)) * (1.0 - g * g) \
            / jnp.maximum(temp * jnp.sqrt(jnp.maximum(temp, 0.0)), 1e-12)

    def sample_cos(params, slot, s1):
        g = params["aniso"][slot]
        safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
        sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * s1)
        ct = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * safe_g)
        return jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * s1, ct)

    mod.build = build
    mod.eval_cos = eval_cos
    mod.sample_cos = sample_cos
    ph.register_phasefunction("my_hg", mod)
    return mod


def test_custom_phase_renders_through_volpath():
    """register_phasefunction: the custom HG clone must render the same
    image as the built-in hg (same RNG consumption, same math)."""
    _register_hg_variant()
    g = 0.4
    ref = np.asarray(integrators.render(
        load_dict(_volpath_scene({"type": "hg", "g": g})), seed=9))
    img = np.asarray(integrators.render(
        load_dict(_volpath_scene({"type": "my_hg", "anisotropy": g})),
        seed=9))
    assert np.allclose(img, ref, atol=1e-5), np.abs(img - ref).max()


def test_custom_phase_furnace():
    """Energy conservation of the custom kind inside the volumetric
    furnace (albedo 1, constant env): L = 1."""
    _register_hg_variant()
    img = np.asarray(integrators.render(
        load_dict(_volpath_scene({"type": "my_hg", "anisotropy": -0.3})),
        seed=5))
    assert abs(img.mean() - 1.0) < 0.05, img.mean()


def test_custom_phase_chi2():
    """sample/pdf consistency of a registered kind via the chi2 harness."""
    from eradiate_kernel_tpu import phase as ph
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu.utils.chi2 import ChiSquareTest, SphericalDomain

    _register_hg_variant()
    scene = load_dict(_volpath_scene({"type": "my_hg", "anisotropy": 0.6}))
    idx = jnp.zeros((), jnp.int32)
    ray_d = jnp.asarray([0.0, 0.0, 1.0])

    def sample_func(smp):
        n = smp.k0.shape[0]
        smp, s1 = smp.next_1d()
        smp, s2 = smp.next_2d()
        wo, _ = ph.phase_sample(scene, jnp.zeros(n, jnp.int32),
                                jnp.broadcast_to(ray_d, (n, 3)), s1, s2)
        return np.asarray(wo)

    def pdf_func(pts):
        n = pts.shape[0]
        return np.asarray(ph.phase_eval(
            scene, jnp.zeros(n, jnp.int32),
            jnp.broadcast_to(-ray_d, (n, 3)), jnp.asarray(pts, jnp.float32)))

    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_count=120_000, res=32, ires=9)
    assert test.run(), test.messages


def test_custom_emitter_registers_and_renders():
    """register_emitter: a user point-emitter clone with a 'power' parameter
    (intensity = power / 4pi) must match the built-in point emitter."""
    from eradiate_kernel_tpu import emitters as em
    from eradiate_kernel_tpu.render.records import DirectionSample

    mod = types.SimpleNamespace()

    def build(props, builder):
        power = float(props.get("power", 1.0))
        return {"position": np.asarray(props.get("position", [0, 0, 0]),
                                       np.float32),
                "intensity": np.int32(builder.texture(
                    power / (4.0 * np.pi), emitter=True))}

    def sample_direction(scene, params, slot, ref_p, wavelengths, s1, s2,
                         active):
        return em.point_sample_direction(scene, params, slot, ref_p,
                                         wavelengths, s1, s2, active)

    mod.build = build
    mod.sample_direction = sample_direction
    em.register_emitter("my_lamp", mod)

    pos = [0.0, 0.0, 2.5]  # same side as the rectangle's +z normal
    base = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 30.0,
                   "to_world": Transform.look_at([0, 0, 4], [0, 0, 0],
                                                 [0, 1, 0]).m,
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 32}},
        "surf": {"type": "rectangle", "bsdf": {"type": "diffuse",
                                               "reflectance": 0.5}},
    }
    power = 4.0 * np.pi * 0.8
    ref_d = dict(base)
    ref_d["lamp"] = {"type": "point", "position": pos, "intensity": 0.8}
    cus_d = dict(base)
    cus_d["lamp"] = {"type": "my_lamp", "position": pos, "power": power}
    ref = np.asarray(integrators.render(load_dict(ref_d), seed=11))
    img = np.asarray(integrators.render(load_dict(cus_d), seed=11))
    assert ref.mean() > 1e-3  # the lamp actually lights the plane
    assert np.allclose(img, ref, atol=1e-5), np.abs(img - ref).max()
