"""End-to-end render tests: analytic furnace gates + smoke renders
(analog of librender/tests/test_integrator.py + test_renders.py z-tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.utils.scenes import cornell_box, furnace
from eradiate_kernel_tpu import integrators


def test_furnace_env_only():
    """Escaped rays see the constant environment exactly."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective",
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 4}},
        "env": {"type": "constant", "radiance": 0.7},
    })
    img = np.asarray(integrators.render(scene))
    assert np.allclose(img, 0.7, atol=1e-3), img.mean()


def test_furnace_sphere_single_bounce():
    """Diffuse convex sphere in constant env: L = albedo * L_env (no
    self-visibility) — checks BSDF sampling + NEE + MIS add up correctly."""
    scene = load_dict(furnace(albedo=0.6, radiance=1.0, width=16, height=16,
                              spp=128, max_depth=16))
    img = np.asarray(integrators.render(scene, seed=3))
    center = img[6:10, 6:10].mean(axis=(0, 1))
    assert np.allclose(center, 0.6, atol=0.02), center
    corner = img[0, 0]
    assert np.allclose(corner, 1.0, atol=0.02), corner


def test_depth_integrator():
    scene = load_dict(furnace(width=8, height=8, spp=4, integrator="depth"))
    img = np.asarray(integrators.render(scene))
    # center pixels hit the sphere at ~3 units, corners miss (depth 0)
    assert img[4, 4, 0] == pytest.approx(3.0, abs=0.1)
    assert img[0, 0, 0] == 0.0


def test_direct_matches_path_depth2():
    """direct integrator == path with max_depth=2 in expectation."""
    sc_p = load_dict(cornell_box(width=16, height=16, spp=196, max_depth=2))
    sc_d = load_dict(cornell_box(width=16, height=16, spp=196,
                                 integrator="direct"))
    img_p = np.asarray(integrators.render(sc_p, seed=1))
    img_d = np.asarray(integrators.render(sc_d, seed=2))
    assert abs(img_p.mean() - img_d.mean()) < 0.03 * max(img_p.mean(), 1e-3)


def test_cornell_box_sanity():
    scene = load_dict(cornell_box(width=32, height=32, spp=32, max_depth=4))
    img = np.asarray(integrators.render(scene, seed=0))
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01  # light transport happening
    # left wall red-ish, right wall green-ish
    left = img[16, 2]
    right = img[16, 29]
    assert left[0] > left[1] and left[0] > left[2], left
    assert right[1] > right[0] and right[1] > right[2], right
    # light is the brightest region
    assert img[2:5, 12:20, :].mean() > img.mean()


def test_render_deterministic():
    scene = load_dict(cornell_box(width=8, height=8, spp=8, max_depth=3))
    a = np.asarray(integrators.render(scene, seed=5))
    b = np.asarray(integrators.render(scene, seed=5))
    assert np.array_equal(a, b)


def test_pass_splitting_invariance():
    """samples_per_pass must not change the result (integrator.cpp:59-65)."""
    scene = load_dict(cornell_box(width=8, height=8, spp=8, max_depth=3))
    a = np.asarray(integrators.render(scene, seed=7))
    b = np.asarray(integrators.render(scene, seed=7, samples_per_pass=128))
    assert np.allclose(a, b, atol=1e-5)


def test_sharded_matches_single():
    """Multi-device sharded render equals the single-device render
    (SURVEY §2.7: deterministic seeding independent of sharding)."""
    import jax
    from eradiate_kernel_tpu.parallel import make_mesh, render_sharded

    scene = load_dict(cornell_box(width=8, height=8, spp=8, max_depth=3))
    single = np.asarray(integrators.render(scene, seed=9))
    mesh = make_mesh(jax.devices())
    multi = np.asarray(render_sharded(scene, mesh, seed=9))
    assert np.allclose(single, multi, atol=2e-5), np.abs(single - multi).max()


def test_sharded_regen_matches_standard():
    """Per-shard regenerating lane pools (render_sharded(regen=True)) must
    reproduce the standard render exactly: each shard streams a contiguous
    sample range with the same per-sample RNG streams; only film accumulation
    order differs."""
    import jax
    from eradiate_kernel_tpu.parallel import make_mesh, render_sharded
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    sc = load_dict(atmosphere(width=8, height=8, spp=4, max_depth=6))
    img_std = np.asarray(integrators.render(sc, seed=3))
    img_sh = np.asarray(render_sharded(sc, make_mesh(jax.devices()), seed=3,
                                       regen=True, regen_lanes=16))
    from conftest import assert_driver_equivalent
    assert_driver_equivalent(img_std, img_sh, max_flips=4)
