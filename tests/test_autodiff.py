"""Differentiable-rendering tests (BASELINE configs[4] analog): gradients vs
finite differences on surface albedo and medium extinction, optimizer
convergence, unbiased mode, torch bridge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.utils import autodiff as ad


def furnace_scene(albedo=0.5):
    return load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at", "origin": [0, 0, -4],
                                "target": [0, 0, 0], "up": [0, 1, 0]},
                   "film": {"width": 4, "height": 4,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 32}},
        "sphere": {"type": "sphere", "radius": 1.0,
                   "bsdf": {"type": "diffuse", "reflectance": albedo}},
        "env": {"type": "constant", "radiance": 1.0},
    })


def _albedo_key(pm):
    keys = [k for k in pm._values if "baked" in k and "value" in k]
    assert keys, list(pm._values)[:10]
    return keys[0]


def _albedo_row(pm, key, near):
    """Row index of the baked spectrum whose value is closest to ``near``
    (the baked array stacks all scene spectra: albedo + env radiance)."""
    vals = np.asarray(pm[key]).mean(axis=-1)
    return int(np.argmin(np.abs(vals - near)))


def test_grad_matches_finite_differences_albedo():
    scene = furnace_scene(0.5)
    pm = ad.traverse(scene)
    key = _albedo_key(pm)
    pm.keep([key])

    def loss(tr):
        img = ad.render(pm, tr, seed=7)
        return jnp.mean(img)

    tr0 = pm.trainable()
    g = jax.grad(loss)(tr0)[key]

    eps = 1e-2
    def at(delta):
        tr = dict(tr0)
        tr[key] = tr0[key] + delta
        return float(loss(tr))
    # perturb all channels of the albedo row together via scalar offset
    fd = (at(eps) - at(-eps)) / (2 * eps)
    g_total = float(jnp.sum(g))
    assert g_total == pytest.approx(fd, rel=0.05), (g_total, fd)
    # physical sanity: more albedo -> brighter furnace
    assert g_total > 0


def test_grad_sigma_t_grid_matches_analytic():
    """d(transmittance)/d(sigma_t grid) through volpath null-collision
    tracking (BASELINE configs[4]: extinction-grid gradients).

    The majorant is detached from the grid (a separate baked leaf), so
    extinction gradients flow through the sigma_n null-collision weights —
    the mechanism heterogeneous-atmosphere inversion relies on. The grid
    medium occupies the unit cube (default gridvolume frame), so the path
    length is 1: L = exp(-sigma) => dL/dsigma = -L, summed over the 8
    jointly-perturbed voxels."""
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 64,
                       "max_iterations": 64},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at", "origin": [0.5, 0.5, -3],
                                "target": [0.5, 0.5, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 2048}},
        "slab": {"type": "cube",
                 "bsdf": {"type": "null"},
                 "interior": {"type": "heterogeneous",
                              "sigma_t": {"type": "gridvolume",
                                          "data": np.full((2, 2, 2), 0.3,
                                                          np.float32)},
                              "albedo": 0.0}},
        "env": {"type": "constant", "radiance": 1.0},
    })
    pm = ad.traverse(scene)
    # detach the majorant from the grid: bump it so null collisions occur
    pm["media.heterogeneous.majorant"] = jnp.asarray([0.6])
    gkey = [k for k in pm._values if "gridvolume" in k and "grid" in k][0]
    pm.keep([gkey])

    def loss(tr):
        return jnp.mean(ad.render(pm, tr, seed=3))

    g = float(jnp.sum(jax.grad(loss)(pm.trainable())[gkey]))
    expect = -1.0 * np.exp(-0.3)
    assert g == pytest.approx(expect, rel=0.1), (g, expect)


def test_adam_inverts_albedo():
    """Recover the sphere albedo from a target render (invert_cbox analog)."""
    target_scene = furnace_scene(0.7)
    target = integrators.render(target_scene, seed=11, spp=64)

    scene = furnace_scene(0.2)
    pm = ad.traverse(scene)
    key = _albedo_key(pm)
    pm.keep([key])
    opt = ad.Adam(pm.trainable(), lr=0.05)

    @jax.jit
    def step(tr, seed):
        def loss(tr):
            img = ad.render(pm, tr, seed=seed, spp=16)
            return jnp.mean((img - target) ** 2)
        return jax.value_and_grad(loss)(tr)

    row = _albedo_row(pm, key, 0.2)
    for i in range(60):
        l, g = step(opt.params, jnp.uint32(100 + i))
        opt.step(g)
        opt.params[key] = jnp.clip(opt.params[key], 0.0, 1.0)
    got = float(jnp.mean(opt.params[key][row]))
    assert got == pytest.approx(0.7, abs=0.05), got


def test_unbiased_grad_agrees_with_biased():
    scene = furnace_scene(0.5)
    pm = ad.traverse(scene)
    key = _albedo_key(pm)
    pm.keep([key])
    tr0 = pm.trainable()

    def g(unbiased, seed):
        def loss(tr):
            return jnp.mean(ad.render(pm, tr, seed=seed, unbiased=unbiased))
        return float(jnp.sum(jax.grad(loss)(tr0)[key]))

    gb = np.mean([g(False, s) for s in range(4)])
    gu = np.mean([g(True, s) for s in range(4)])
    assert gu == pytest.approx(gb, rel=0.1), (gu, gb)


def test_render_torch_bridge():
    torch = pytest.importorskip("torch")
    scene = furnace_scene(0.5)
    pm = ad.traverse(scene)
    key = _albedo_key(pm)
    pm.keep([key])
    p = torch.tensor(np.asarray(pm[key]), requires_grad=True)
    img = ad.render_torch(pm, {key: p}, seed=1, unbiased=False)
    loss = img.mean()
    loss.backward()
    assert p.grad is not None and float(p.grad.abs().sum()) > 0


def test_remat_policy_gradient_invariance():
    """The auto/forced rematerialization policy changes memory scheduling
    only: gradients with remat forced on and off must match exactly."""
    import dataclasses

    scene = furnace_scene(0.5)

    def grad_with(remat):
        cfg = scene.config
        integ = dataclasses.replace(cfg.integrator,
                                    extra=cfg.integrator.extra
                                    + (("remat", remat),))
        sc = dataclasses.replace(scene,
                                 config=dataclasses.replace(cfg,
                                                            integrator=integ))
        pm = ad.traverse(sc)
        key = _albedo_key(pm)
        pm.keep([key])

        def loss(tr):
            return jnp.mean(ad.render(pm, tr, seed=3))

        return jax.grad(loss)(pm.trainable())[key]

    g_on = np.asarray(grad_with(True))
    g_off = np.asarray(grad_with(False))
    assert np.allclose(g_on, g_off, rtol=1e-6, atol=1e-9), \
        np.abs(g_on - g_off).max()


# =============================================================================
# Path-replay backward for the regenerating driver (integrators/replay.py)
# =============================================================================

def _het_slab_scene(width=4, spp=48, rfilter="box"):
    rng = np.random.default_rng(3)
    grid = (0.2 + 0.6 * rng.random((2, 2, 2))).astype(np.float32)
    alb = (0.3 + 0.5 * rng.random((2, 2, 2))).astype(np.float32)
    return load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 12,
                       "max_iterations": 24},
        "sensor": {"type": "perspective",
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, -3],
                                "target": [0.5, 0.5, 1], "up": [0, 1, 0]},
                   "film": {"width": width, "height": width,
                            "rfilter": {"type": rfilter}},
                   "sampler": {"sample_count": spp}},
        "slab": {"type": "cube",
                 "bsdf": {"type": "null"},
                 "interior": {"type": "heterogeneous",
                              "sigma_t": {"type": "gridvolume",
                                          "data": grid},
                              "albedo": {"type": "gridvolume",
                                         "data": alb}}},
        "light": {"type": "constant", "radiance": 1.0},
    })


def _value_class_keys(pm):
    """Trainable keys whose replay gradient is exact: grids + baked
    spectra (value-class parameters — they never move sampled
    trajectories)."""
    return [k for k in pm._values
            if k.endswith("gridvolume.grid") or ("baked" in k and "value" in k)]


@pytest.mark.parametrize("rfilter", ["box", "gaussian"])
def test_replay_grad_matches_scan_driver(rfilter):
    """The regen driver's path-replay backward produces the SAME gradients
    as jax.grad through the scan driver for value-class parameters (sigma_t
    grid, albedo grid, emitter radiance spectra) — the round-5 headline
    (VERDICT item 1; SURVEY §7 'Autodiff = custom_vjp ... path-replay
    backward'). gaussian exercises the wide-filter film_put path of the
    sample log / refill-vjp footprint gather."""
    scene = _het_slab_scene(rfilter=rfilter)
    pm = ad.traverse(scene)
    keys = _value_class_keys(pm)
    assert any("grid" in k for k in keys)
    pm.keep(keys)
    tr0 = pm.trainable()

    def loss(tr, regen):
        return jnp.mean(ad.render(pm, tr, seed=11, regen=regen))

    g_fast = jax.grad(lambda t: loss(t, True))(tr0)
    g_scan = jax.grad(lambda t: loss(t, False))(tr0)
    for k in keys:
        a, b = np.asarray(g_fast[k]), np.asarray(g_scan[k])
        assert np.allclose(a, b, rtol=5e-3, atol=1e-7), \
            (k, np.abs(a - b).max(), np.abs(b).max())
    # and they are not trivially zero
    assert sum(float(np.abs(np.asarray(g_fast[k])).sum()) for k in keys) > 0


def test_replay_grad_matches_finite_differences():
    """Replay gradient of the albedo grid against central finite
    differences (BASELINE configs[4] acceptance: albedo + sigma_t grid;
    the sigma_t half is covered by the exact scan-equivalence test above —
    an FD probe of sigma_t itself is ill-posed because perturbing it flips
    discrete null/real classifications within a fixed seed, so the
    same-seed difference quotient measures decision flips, not the
    derivative)."""
    rng = np.random.default_rng(3)
    alb = (0.3 + 0.5 * rng.random((2, 2, 2))).astype(np.float32)
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 12,
                       "max_iterations": 24},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, -3],
                                "target": [0.5, 0.5, 1], "up": [0, 1, 0]},
                   "film": {"width": 1, "height": 1,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 512}},
        "slab": {"type": "cube",
                 "bsdf": {"type": "null"},
                 "interior": {"type": "heterogeneous",
                              "sigma_t": 0.8,
                              "albedo": {"type": "gridvolume",
                                         "data": alb}}},
        "light": {"type": "constant", "radiance": 1.0},
    })
    pm = ad.traverse(scene)
    key = [k for k in pm._values if k.endswith("gridvolume.grid")][0]
    pm.keep([key])
    tr0 = pm.trainable()

    def loss(tr):
        return jnp.mean(ad.render(pm, tr, seed=5, regen=True))

    g = float(jnp.sum(jax.grad(loss)(tr0)[key]))
    eps = 2e-2

    def at(d):
        tr = dict(tr0)
        tr[key] = tr0[key] + d
        return float(loss(tr))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    assert g == pytest.approx(fd, rel=0.08), (g, fd)


def test_replay_primal_film_matches_fast_driver():
    """value_and_grad's primal output through the custom_vjp equals the
    plain (non-differentiated) regen render bit-for-bit: the fwd rule runs
    the identical while-loop driver, only adding the sample log."""
    scene = _het_slab_scene()
    from eradiate_kernel_tpu import integrators

    img_plain = integrators.render(scene, seed=4, regen=True)
    val, _ = jax.value_and_grad(
        lambda sc: jnp.mean(integrators.render(sc, seed=4, regen=True)),
        allow_int=True)(scene)
    assert float(val) == float(jnp.mean(img_plain))


def test_replay_grad_path_integrator():
    """Replay backward drives the `path` integrator too (its state also
    carries result/throughput): surface albedo gradient matches the scan
    driver."""
    scene = furnace_scene(0.5)
    pm = ad.traverse(scene)
    key = _albedo_key(pm)
    pm.keep([key])
    tr0 = pm.trainable()

    def loss(tr, regen):
        return jnp.mean(ad.render(pm, tr, seed=7, regen=regen))

    g_fast = np.asarray(jax.grad(lambda t: loss(t, True))(tr0)[key])
    g_scan = np.asarray(jax.grad(lambda t: loss(t, False))(tr0)[key])
    assert np.allclose(g_fast, g_scan, rtol=5e-3, atol=1e-7), \
        (np.abs(g_fast - g_scan).max(), np.abs(g_scan).max())


def test_replay_grad_spectral_variant():
    """Replay backward under the spectral variant (4 hero wavelengths):
    per-channel radiance-to-go cotangents flow through the per-lane
    spectral->XYZ conversion; grid gradients must match the scan driver."""
    from eradiate_kernel_tpu.core.types import Variant

    rng = np.random.default_rng(5)
    grid = (0.3 + 0.5 * rng.random((2, 2, 2))).astype(np.float32)
    d = {
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 8,
                       "max_iterations": 16},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, -3],
                                "target": [0.5, 0.5, 1], "up": [0, 1, 0]},
                   "film": {"width": 2, "height": 2,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 32}},
        "slab": {"type": "cube",
                 "bsdf": {"type": "null"},
                 "interior": {"type": "heterogeneous",
                              "sigma_t": {"type": "gridvolume",
                                          "data": grid},
                              "albedo": 0.6}},
        "light": {"type": "constant", "radiance": 1.0},
    }
    scene = load_dict(d, Variant("spectral"))
    pm = ad.traverse(scene)
    keys = [k for k in pm._values if k.endswith("gridvolume.grid")]
    pm.keep(keys)
    tr0 = pm.trainable()

    def loss(tr, regen):
        return jnp.mean(ad.render(pm, tr, seed=9, regen=regen))

    g_fast = np.asarray(jax.grad(lambda t: loss(t, True))(tr0)[keys[0]])
    g_scan = np.asarray(jax.grad(lambda t: loss(t, False))(tr0)[keys[0]])
    assert np.allclose(g_fast, g_scan, rtol=5e-3, atol=1e-7), \
        (np.abs(g_fast - g_scan).max(), np.abs(g_scan).max())
    assert np.abs(g_fast).sum() > 0


def test_replay_prb_walk_grad_matches_scan(monkeypatch):
    """The PRB walk-level custom_vjp (volpath._run_walk_prb: while-loop
    walks in both adjoint passes, multiplicative-chain cotangents,
    closure_convert for scene captures) produces the same value-class
    gradients as the scan transpose."""
    monkeypatch.setenv("ERT_REPLAY_KW", '{"prb_walks": true}')
    rng = np.random.default_rng(3)
    grid = (0.2 + 0.6 * rng.random((2, 2, 2))).astype(np.float32)
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "volpath", "max_depth": 4,
                       "max_iterations": 8},
        "sensor": {"type": "radiancemeter",
                   "to_world": {"type": "look_at",
                                "origin": [0.5, 0.5, -3],
                                "target": [0.5, 0.5, 1], "up": [0, 1, 0]},
                   "film": {"width": 2, "height": 2,
                            "rfilter": {"type": "box"}},
                   "sampler": {"sample_count": 16}},
        "slab": {"type": "cube", "bsdf": {"type": "null"},
                 "interior": {"type": "heterogeneous",
                              "sigma_t": {"type": "gridvolume",
                                          "data": grid},
                              "albedo": 0.6}},
        "light": {"type": "constant", "radiance": 1.0},
    })
    pm = ad.traverse(scene)
    keys = [k for k in pm._values if k.endswith("gridvolume.grid")]
    pm.keep(keys)
    tr0 = pm.trainable()

    def loss(tr, regen):
        return jnp.mean(ad.render(pm, tr, seed=11, regen=regen))

    g_prb = np.asarray(jax.grad(lambda t: loss(t, True))(tr0)[keys[0]])
    monkeypatch.delenv("ERT_REPLAY_KW")
    g_scan = np.asarray(jax.grad(lambda t: loss(t, False))(tr0)[keys[0]])
    assert np.allclose(g_prb, g_scan, rtol=5e-3, atol=1e-7), \
        (np.abs(g_prb - g_scan).max(), np.abs(g_scan).max())
    assert np.abs(g_prb).sum() > 0
