"""Unit tests for core math / rng / distributions / transforms / spectrum."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.core import math as m
from eradiate_kernel_tpu.core.bbox import ray_intersect_aabb
from eradiate_kernel_tpu.core.distr import (
    ContinuousDistribution, DiscreteDistribution, IrregularContinuousDistribution)
from eradiate_kernel_tpu.core.frame import Frame
from eradiate_kernel_tpu.core.rng import Sampler, threefry2x32
from eradiate_kernel_tpu.core.transform import Transform
from eradiate_kernel_tpu.core import spectrum as sp


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(1000, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    s, t = m.coordinate_system(jnp.asarray(n, jnp.float32))
    s, t = np.asarray(s), np.asarray(t)
    assert np.allclose((s * n).sum(-1), 0, atol=1e-5)
    assert np.allclose((t * n).sum(-1), 0, atol=1e-5)
    assert np.allclose((s * t).sum(-1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(s, axis=-1), 1, atol=1e-5)
    assert np.allclose(np.cross(s, t), n, atol=1e-5)


def test_frame_roundtrip():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(100, 3)); n /= np.linalg.norm(n, axis=-1, keepdims=True)
    v = rng.normal(size=(100, 3)); v /= np.linalg.norm(v, axis=-1, keepdims=True)
    f = Frame.from_normal(jnp.asarray(n, jnp.float32))
    v2 = np.asarray(f.to_world(f.to_local(jnp.asarray(v, jnp.float32))))
    assert np.allclose(v2, v, atol=1e-5)


def test_solve_quadratic():
    valid, x0, x1 = m.solve_quadratic(jnp.asarray([1.0, 1.0, 0.0, 1.0]),
                                      jnp.asarray([0.0, -3.0, 2.0, 0.0]),
                                      jnp.asarray([-4.0, 2.0, -4.0, 4.0]))
    assert np.array_equal(np.asarray(valid), [True, True, True, False])
    assert np.allclose(np.asarray(x0)[:3], [-2.0, 1.0, 2.0], atol=1e-6)
    assert np.allclose(np.asarray(x1)[:3], [2.0, 2.0, 2.0], atol=1e-6)


def test_threefry_matches_jax():
    """Our threefry2x32 must match JAX's (same algorithm, 20 rounds)."""
    key = jax.random.key_data(jax.random.PRNGKey(42))
    x = jnp.arange(64, dtype=jnp.uint32)
    ours0, ours1 = threefry2x32(key[0], key[1], x, jnp.zeros_like(x))
    from jax._src.prng import threefry_2x32 as jax_tf

    theirs = jax_tf(jnp.asarray([key[0], key[1]], jnp.uint32),
                    jnp.concatenate([x, jnp.zeros_like(x)]))
    assert np.array_equal(np.asarray(ours0), np.asarray(theirs[:64]))
    assert np.array_equal(np.asarray(ours1), np.asarray(theirs[64:]))


def test_sampler_uniformity_and_decorrelation():
    s = Sampler.seed(7, jnp.arange(100_000, dtype=jnp.uint32))
    s, a = s.next_1d()
    s, b = s.next_1d()
    a, b = np.asarray(a), np.asarray(b)
    assert 0.0 <= a.min() and a.max() < 1.0
    assert abs(a.mean() - 0.5) < 5e-3
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01
    # determinism: same seed/lane -> same values regardless of batch layout
    s2 = Sampler.seed(7, jnp.asarray([5], jnp.uint32))
    _, a2 = s2.next_1d()
    assert np.asarray(a2)[0] == a[5]


def test_discrete_distribution():
    d = DiscreteDistribution.from_pmf(jnp.asarray([1.0, 3.0, 2.0, 4.0]))
    xi = jnp.asarray(np.random.default_rng(0).random(200_000), jnp.float32)
    idx = np.asarray(d.sample(xi))
    freq = np.bincount(idx, minlength=4) / len(idx)
    assert np.allclose(freq, [0.1, 0.3, 0.2, 0.4], atol=5e-3)
    i, pmf = d.sample_pmf(jnp.asarray([0.05]))
    assert np.asarray(i)[0] == 0 and abs(np.asarray(pmf)[0] - 0.1) < 1e-6


def test_continuous_distribution_linear_pdf():
    # pdf proportional to x on [0, 1]
    n = 64
    vals = np.linspace(0, 1, n)
    d = ContinuousDistribution.from_pdf(vals, 0.0, 1.0)
    xi = jnp.asarray(np.random.default_rng(1).random(500_000), jnp.float32)
    x = np.asarray(d.sample(xi))
    # inverse CDF of pdf=2x is sqrt(u)
    q = np.quantile(x, [0.25, 0.5, 0.75])
    assert np.allclose(q, np.sqrt([0.25, 0.5, 0.75]), atol=3e-3)
    assert abs(float(d.integral) - 0.5) < 1e-6
    assert abs(float(d.eval_pdf_normalized(jnp.asarray(0.5))) - 1.0) < 1e-2


def test_irregular_distribution_matches_regular():
    nodes = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    vals = np.array([1.0, 2.0, 0.5, 3.0, 1.0])
    d = IrregularContinuousDistribution.from_pdf(nodes, vals)
    dr = ContinuousDistribution.from_pdf(
        np.interp(np.linspace(0, 1, 257), nodes, vals), 0.0, 1.0)
    xi = jnp.asarray(np.linspace(0.001, 0.999, 1001), jnp.float32)
    x1 = np.asarray(d.sample(xi))
    x2 = np.asarray(dr.sample(xi))
    assert np.allclose(x1, x2, atol=2e-3)


def test_transform_point_vector_normal():
    t = Transform.translate([1, 2, 3]) @ Transform.scale([2, 2, 2])
    p = np.asarray(t.transform_affine_point(jnp.asarray([1.0, 0.0, 0.0])))
    assert np.allclose(p, [3, 2, 3])
    v = np.asarray(t.transform_vector(jnp.asarray([1.0, 0.0, 0.0])))
    assert np.allclose(v, [2, 0, 0])
    # normals under non-uniform scale
    t2 = Transform.scale([1, 2, 1])
    nrm = np.asarray(m.normalize(t2.transform_normal(
        jnp.asarray(m.normalize(jnp.asarray([1.0, 1.0, 0.0]))))))
    expect = np.array([1.0, 0.5, 0.0]); expect /= np.linalg.norm(expect)
    assert np.allclose(nrm, expect, atol=1e-6)


def test_look_at():
    t = Transform.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0])
    d = np.asarray(t.transform_vector(jnp.asarray([0.0, 0.0, 1.0])))
    assert np.allclose(d, [0, 0, 1], atol=1e-6)
    up = np.asarray(t.transform_vector(jnp.asarray([0.0, 1.0, 0.0])))
    assert np.allclose(up, [0, 1, 0], atol=1e-6)


def test_aabb_intersect():
    hit, near, far = ray_intersect_aabb(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray([[-1.0, 0.5, 0.5], [2.0, 2.0, 2.0]]),
        1.0 / jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]),
        jnp.asarray([0.0, 0.0]), jnp.asarray([jnp.inf, jnp.inf]))
    assert np.asarray(hit)[0] and not np.asarray(hit)[1]
    assert np.allclose(np.asarray(near)[0], 1.0)
    assert np.allclose(np.asarray(far)[0], 2.0)


def test_cie_luminance_normalization():
    """A unit-radiance spectrum sampled uniformly must give Y ~= 1."""
    lam = jnp.linspace(sp.CIE_MIN, sp.CIE_MAX, 10001)
    w = jnp.full_like(lam, sp.CIE_MAX - sp.CIE_MIN)
    xyz = sp.spectrum_to_xyz(w[:, None], lam[:, None])
    assert abs(float(jnp.mean(xyz[:, 1])) - 1.0) < 1e-3


def test_cie1931_exact_table():
    """cie1931_xyz must reproduce the published CIE 1931 2-degree standard
    observer values exactly (pre-normalization) at the 5 nm table nodes —
    the reference's cie1931_tbl (spectrum.h:127-133) is the same data."""
    lam = jnp.asarray([450.0, 555.0, 600.0])
    xyz = np.asarray(sp.cie1931_xyz(lam)) * sp._CIE_Y_INTEGRAL
    # Published CIE 15:2004 values at 450/555/600 nm:
    expected = np.array([
        [0.3362, 0.0380, 1.77211],
        [0.5120501, 1.0, 0.005749999],  # ybar peaks at exactly 1.0 @ 555 nm
        [1.0622, 0.6310, 0.0008],
    ])
    assert np.allclose(xyz, expected, rtol=1e-5, atol=1e-7)
    # Out-of-range wavelengths contribute zero response.
    assert np.all(np.asarray(sp.cie1931_xyz(jnp.asarray([300.0, 900.0]))) == 0)
    # Linear interpolation between nodes (matches spectrum.h:148-200 scheme).
    mid = np.asarray(sp.cie1931_xyz(jnp.asarray([557.5]))) * sp._CIE_Y_INTEGRAL
    assert np.allclose(mid[0, 1], 0.5 * (1.0 + 0.995), rtol=1e-5)


def test_srgb_xyz_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(0).random((100, 3)), jnp.float32)
    back = sp.xyz_to_srgb(sp.srgb_to_xyz(rgb))
    assert np.allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def test_sample_shifted():
    v = np.asarray(sp.sample_shifted(jnp.asarray([0.9])))
    assert np.allclose(sorted(v[0]), [0.15, 0.4, 0.65, 0.9], atol=1e-6)


def test_render_checkpoint_resume(tmp_path):
    """Crash-resumable rendering: interrupting after pass 1 and re-invoking
    with the same checkpoint path completes to the exact uninterrupted
    film; a completed render removes its checkpoint."""
    import os
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils import runtime
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    sc = load_dict(cornell_box(width=8, height=8, spp=4, max_depth=3))
    ckpt = str(tmp_path / "render.ckpt")
    full = np.asarray(runtime.render(sc, seed=11, samples_per_pass=64,
                                     develop_film=False))

    class OnePass(runtime.RenderController):
        def __init__(self):
            super().__init__()
            self.n = 0

        def should_stop(self):
            self.n += 1
            return self.n > 1  # allow exactly one pass

    runtime.render(sc, seed=11, samples_per_pass=64, develop_film=False,
                   controller=OnePass(), checkpoint_path=ckpt)
    assert os.path.exists(ckpt)  # interrupted: checkpoint kept
    resumed = np.asarray(runtime.render(sc, seed=11, samples_per_pass=64,
                                        develop_film=False,
                                        checkpoint_path=ckpt))
    assert np.allclose(resumed, full, atol=1e-6)
    assert not os.path.exists(ckpt)  # completed: checkpoint removed


def test_logger_appender_fanout():
    """Logger: leveled filtering, appender fan-out, ERROR raises
    (logger.h/appender.h semantics)."""
    import io
    import pytest
    from eradiate_kernel_tpu.utils import runtime

    log = runtime.Logger(log_level=runtime.INFO)
    s1, s2 = io.StringIO(), io.StringIO()
    log.add_appender(runtime.StreamAppender(s1))
    log.add_appender(runtime.StreamAppender(s2))
    log.debug("hidden")
    log.info("hello", cls="Scene")
    assert "hello" in s1.getvalue() and "hello" in s2.getvalue()
    assert "Scene" in s1.getvalue()
    assert "hidden" not in s1.getvalue()
    log.remove_appender(log.appenders[1])
    log.warn("only-first")
    assert "only-first" in s1.getvalue()
    assert "only-first" not in s2.getvalue()
    with pytest.raises(RuntimeError):
        log.error("boom")
    assert "boom" in s1.getvalue()


def test_bitmap_pfm_ppm_rgbe_roundtrip(tmp_path):
    """PFM (float), PPM (8-bit sRGB), RGBE (.hdr shared-exponent) codecs
    (bitmap.cpp FileFormat coverage beyond EXR/PNG)."""
    from eradiate_kernel_tpu.utils import bitmap as bm

    img = np.random.RandomState(0).rand(7, 5, 3).astype(np.float32) * 3.0
    p = str(tmp_path / "t.pfm")
    bm.write_pfm(p, img)
    assert np.allclose(bm.read_pfm(p), img)
    assert np.allclose(bm.read_image(p), img)

    p2 = str(tmp_path / "t.ppm")
    bm.write_ppm(p2, img / 3.0)
    assert np.abs(bm.read_ppm(p2) - np.clip(img / 3.0, 0, 1)).max() < 0.01

    p3 = str(tmp_path / "t.hdr")
    bm.write_rgbe(p3, img)
    rel = np.abs(bm.read_rgbe(p3) - img) \
        / np.maximum(img.max(-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01

    # gray PFM
    p4 = str(tmp_path / "g.pfm")
    bm.write_pfm(p4, img[..., 0])
    assert np.allclose(bm.read_pfm(p4)[..., 0], img[..., 0])
