"""Measured-BSDF stack tests: tensor-file IO roundtrip, Marginal2D continuous
warp correctness (sample/invert/eval mutual consistency + chi2), and the
measured plugin's sample/pdf/eval consistency on a synthetic material
(analog of src/bsdfs/tests/test_measured-ish coverage; the reference ships no
data files either, so correctness rests on self-consistency + the chi2 gate,
like src/libcore/tests/test_distr_2d.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.core import marginal2d as m2d
from eradiate_kernel_tpu.utils.tensorfile import (read_tensor_file,
                                                  write_tensor_file)


# --- tensor file IO ---------------------------------------------------------------

def test_tensorfile_roundtrip(tmp_path):
    fields = {
        "theta_i": np.linspace(0, 1.5, 7).astype(np.float32),
        "counts": np.arange(24, dtype=np.uint32).reshape(2, 3, 4),
        "description": "synthetic material",
        "flag": np.asarray([1], np.uint8),
    }
    path = tmp_path / "synth.bsdf"
    write_tensor_file(path, fields)
    out = read_tensor_file(path)
    assert np.allclose(out["theta_i"], fields["theta_i"])
    assert out["counts"].shape == (2, 3, 4)
    assert (out["counts"] == fields["counts"]).all()
    assert bytes(out["description"]).decode() == "synthetic material"
    assert out["flag"][0] == 1


# --- Marginal2D continuous --------------------------------------------------------

def _rand_table(rng, h, w):
    # smooth positive: random low-frequency cosine mix
    y, x = np.mgrid[0:h, 0:w] / np.array([[[h - 1]]], float)[0], None
    ys = np.linspace(0, 1, h)[:, None]
    xs = np.linspace(0, 1, w)[None, :]
    a, b, c = rng.uniform(0.5, 2, 3)
    return (0.2 + a * np.cos(2 * np.pi * xs) ** 2 +
            b * np.sin(np.pi * ys) + c * xs * ys).astype(np.float32)


def test_marginal2d_sample_invert_roundtrip():
    rng = np.random.RandomState(0)
    tabs = {k: jnp.asarray(v)
            for k, v in m2d.build_continuous(_rand_table(rng, 9, 13)).items()}
    u = jnp.asarray(rng.uniform(0.01, 0.99, (4096, 2)), jnp.float32)
    pos, pdf = m2d.sample(tabs, u)
    u_back, pdf2 = m2d.invert(tabs, pos)
    assert np.allclose(np.asarray(u_back), np.asarray(u), atol=2e-5)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=2e-4)
    # eval at the warped position returns the same density
    pdf3 = m2d.eval(tabs, pos)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf3), rtol=2e-4)


def test_marginal2d_pdf_normalized():
    """Normalized tables integrate to ~1 over the unit square."""
    rng = np.random.RandomState(1)
    tabs = {k: jnp.asarray(v)
            for k, v in m2d.build_continuous(_rand_table(rng, 8, 8)).items()}
    g = np.linspace(0, 1, 201)
    xx, yy = np.meshgrid(g, g)
    pos = jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1), jnp.float32)
    vals = np.asarray(m2d.eval(tabs, pos)).reshape(201, 201)
    integral = np.trapezoid(np.trapezoid(vals, g, axis=1), g)
    assert abs(integral - 1.0) < 1e-3, integral


def test_marginal2d_histogram_matches_pdf():
    """Warped uniform samples histogram to the eval density (mini chi2)."""
    rng = np.random.RandomState(2)
    tabs = {k: jnp.asarray(v)
            for k, v in m2d.build_continuous(_rand_table(rng, 10, 6)).items()}
    n = 400_000
    u = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    pos, _ = m2d.sample(tabs, u)
    pos = np.asarray(pos)
    res = 8
    hist = np.histogram2d(pos[:, 1], pos[:, 0], bins=res,
                          range=[[0, 1], [0, 1]])[0] / n
    # expected mass per cell from a fine eval grid
    g = np.linspace(0, 1, res * 16 + 1)
    xx, yy = np.meshgrid(g, g)
    vals = np.asarray(m2d.eval(
        tabs, jnp.asarray(np.stack([xx.ravel(), yy.ravel()], -1),
                          jnp.float32))).reshape(len(g), len(g))
    cell = np.add.reduceat(np.add.reduceat(
        0.25 * (vals[:-1, :-1] + vals[1:, :-1] + vals[:-1, 1:] + vals[1:, 1:]),
        np.arange(0, res * 16, 16), axis=0),
        np.arange(0, res * 16, 16), axis=1) * (g[1] - g[0]) ** 2
    assert np.abs(hist - cell).max() < 0.004, np.abs(hist - cell).max()


def test_marginal2d_param_interpolation():
    """With conditioning params, lookups blend adjacent slices linearly."""
    rng = np.random.RandomState(3)
    data = np.stack([_rand_table(rng, 6, 7) for _ in range(3)])  # (3, 6, 7)
    built = m2d.build_continuous(data)
    tabs = {k: jnp.asarray(v) for k, v in built.items()}
    pv = (jnp.asarray([0.0, 1.0, 2.0]),)
    pos = jnp.asarray(rng.uniform(0, 1, (64, 2)), jnp.float32)

    v_mid = np.asarray(m2d.eval(tabs, pos, pv, (jnp.full(64, 0.5),)))
    t0 = {k: jnp.asarray(v[0]) for k, v in built.items()}
    t1 = {k: jnp.asarray(v[1]) for k, v in built.items()}
    v0 = np.asarray(m2d.eval(t0, pos))
    v1 = np.asarray(m2d.eval(t1, pos))
    assert np.allclose(v_mid, 0.5 * (v0 + v1), rtol=1e-4)
    # clamping below/above the parameter range
    v_lo = np.asarray(m2d.eval(tabs, pos, pv, (jnp.full(64, -5.0),)))
    assert np.allclose(v_lo, v0, rtol=1e-5)


# --- synthetic measured material --------------------------------------------------

def synth_fields(T=6, L=4, res=16, jacobian=True, seed=0):
    """A self-consistent isotropic synthetic .bsdf field set: any smooth
    positive tables exercise the full warp chain (chi2 only requires
    sample/pdf mutual consistency, not physical data).

    The VNDF table is forced to zero on the first two theta_m columns: the
    u^2 half-vector parameterization (measured.cpp:398-412) makes the
    solid-angle pdf ~ f(u)/u^3 near the exact specular direction, so any
    f(0) > 0 yields an integrable pdf singularity there — correct for MC but
    impossible for the chi2 harness's Simpson integration to resolve. Real
    RGL data has the same singularity; zeroing the first cells keeps the
    test's pdf bounded without touching the code under test."""
    rng = np.random.RandomState(seed)
    theta_i = np.linspace(0, np.pi / 2 * 0.95, T).astype(np.float32)
    phi_i = np.asarray([0.0], np.float32)
    wav = np.linspace(400, 700, L).astype(np.float32)

    u = np.linspace(0, 1, res)
    theta_m = u ** 2 * (np.pi / 2)        # x axis of the warp grids
    window = np.ones(res)
    window[:2] = 0.0                      # bound the pdf near theta_m = 0
    # vndf-ish: forward lobe that tightens with theta_i, vanishing at grazing
    vndf = np.zeros((1, T, res, res), np.float32)
    lum = np.zeros((1, T, res, res), np.float32)
    for t in range(T):
        alpha = 0.2 + 0.5 * t / max(T - 1, 1)
        d = (np.exp(-(theta_m / alpha) ** 2) * np.cos(theta_m)
             + 1e-3) * window
        phi_row = 1.0 + 0.3 * np.cos(2 * np.pi * u)[:, None]
        vndf[0, t] = (phi_row * d[None, :]).astype(np.float32)
        lum[0, t] = (phi_row * ((d + 1e-6) ** 0.8)[None, :]
                     * window).astype(np.float32)
    ndf = (np.exp(-(theta_m / 0.35) ** 2)[None, :].repeat(res, 0)
           + 1e-3).astype(np.float32)
    sigma = (0.25 + 0.5 * np.cos(theta_m)[None, :].repeat(res, 0)
             ).astype(np.float32)
    spectra = np.zeros((1, T, L, res, res), np.float32)
    for lam in range(L):
        spectra[0, :, lam] = vndf[0] * (0.3 + 0.7 * lam / max(L - 1, 1))
    return {
        "theta_i": theta_i, "phi_i": phi_i, "wavelengths": wav,
        "ndf": ndf, "sigma": sigma, "vndf": vndf, "luminance": lum,
        "spectra": spectra,
        "jacobian": np.asarray([1 if jacobian else 0], np.uint8),
        "description": "synthetic isotropic test material",
    }


def test_measured_chi2():
    from tests.test_bsdfs import run_bsdf_chi2
    run_bsdf_chi2({"type": "measured", "fields": synth_fields()},
                  wi=(0.2, -0.1, 0.97), cos_bounds=(0.0, 1.0), ires=17)


def test_measured_chi2_oblique():
    from tests.test_bsdfs import run_bsdf_chi2
    run_bsdf_chi2({"type": "measured", "fields": synth_fields(seed=5)},
                  wi=(0.6, 0.3, 0.55), cos_bounds=(0.0, 1.0), ires=17)


def _measured_scene_si(fields, wi):
    from eradiate_kernel_tpu.core.frame import Frame
    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.render.records import SurfaceInteraction
    from eradiate_kernel_tpu.scene import load_dict
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle",
                 "bsdf": {"type": "measured", "fields": fields}},
    }, Variant("spectral"))
    wi = jnp.asarray(wi, jnp.float32)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    n = wi.shape[0]
    z = jnp.zeros(n)
    si = SurfaceInteraction(
        t=jnp.ones(n), p=jnp.zeros((n, 3)),
        n=jnp.zeros((n, 3)).at[:, 2].set(1.0),
        sh_frame=Frame.from_normal(jnp.zeros((n, 3)).at[:, 2].set(1.0)),
        uv=jnp.full((n, 2), 0.5), prim_uv=jnp.zeros((n, 2)),
        dp_du=jnp.zeros((n, 3)).at[:, 0].set(1.0),
        dp_dv=jnp.zeros((n, 3)).at[:, 1].set(1.0),
        wi=wi, wavelengths=jnp.full((n, 4), 550.0),
        time=z, prim_index=jnp.zeros(n, jnp.int32),
        shape_index=jnp.zeros(n, jnp.int32))
    return scene, si


def test_measured_sample_weight_consistency():
    """sample() weight == eval/pdf at the sampled direction
    (measured.cpp:269 returns spec/bs.pdf)."""
    from eradiate_kernel_tpu import bsdfs

    fields = synth_fields(seed=7)
    n = 256
    rng = np.random.RandomState(11)
    wi = np.tile([0.3, -0.2, 0.93], (n, 1))
    scene, si = _measured_scene_si(fields, wi)
    idx = jnp.zeros(n, jnp.int32)
    act = jnp.ones(n, bool)
    s1 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    s2 = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    bs, w = bsdfs.bsdf_sample(scene, idx, si, s1, s2, act)
    val, pdf = bsdfs.bsdf_eval_pdf(scene, idx, si, bs.wo, act)
    ok = np.asarray(bs.pdf) > 1e-4
    assert ok.mean() > 0.7
    w_ref = np.asarray(val)[ok] / np.asarray(pdf)[ok, None]
    assert np.allclose(np.asarray(w)[ok], w_ref, rtol=2e-2, atol=1e-4)
    # pdf from sample() matches pdf from eval_pdf()
    assert np.allclose(np.asarray(bs.pdf)[ok], np.asarray(pdf)[ok], rtol=2e-2)


def test_measured_spectra_wavelength_interp():
    """eval at wavelengths between grid nodes interpolates the spectra axis
    (our synthetic spectra scale linearly with lambda)."""
    from eradiate_kernel_tpu import bsdfs

    fields = synth_fields(seed=3)
    wi = np.tile([0.1, 0.2, 0.97], (3, 1))
    scene, si = _measured_scene_si(fields, wi)
    wav = jnp.asarray([[400.0] * 4, [550.0] * 4, [700.0] * 4], jnp.float32)
    si = si.replace(wavelengths=wav)
    wo = jnp.asarray(np.tile([-0.1, 0.1, 0.98], (3, 1)), jnp.float32)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    val, _ = bsdfs.bsdf_eval_pdf(scene, jnp.zeros(3, jnp.int32), si, wo,
                                 jnp.ones(3, bool))
    v = np.asarray(val)[:, 0]
    assert v[0] > 0
    # linear in lambda: midpoint == average of endpoints
    assert np.allclose(v[1], 0.5 * (v[0] + v[2]), rtol=1e-3)
    # 700nm scales 0.3 -> 1.0 vs 400nm
    assert np.allclose(v[2] / v[0], 1.0 / 0.3, rtol=1e-3)


def test_measured_from_file(tmp_path):
    """Full path through the tensor-file reader."""
    from eradiate_kernel_tpu import bsdfs

    fields = synth_fields(seed=9)
    path = str(tmp_path / "synth.bsdf")
    write_tensor_file(path, fields)
    wi = np.tile([0.0, 0.0, 1.0], (2, 1))
    scene, si = _measured_scene_si({"filename": path, **{}}
                                   if False else fields, wi)
    # build via filename
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.core.types import Variant
    scene2 = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle",
                 "bsdf": {"type": "measured", "filename": path}},
    }, Variant("spectral"))
    wo = jnp.asarray(np.tile([0.1, 0.0, 0.99], (2, 1)), jnp.float32)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    v1, p1 = bsdfs.bsdf_eval_pdf(scene, jnp.zeros(2, jnp.int32), si, wo,
                                 jnp.ones(2, bool))
    v2, p2 = bsdfs.bsdf_eval_pdf(scene2, jnp.zeros(2, jnp.int32), si, wo,
                                 jnp.ones(2, bool))
    assert np.allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    assert np.allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5)


# --- measured_polarized (measured_polarized.cpp) -----------------------------------

def synth_pbsdf(P=8, T=6, H=7, nan_slice=False):
    """Synthetic KAIST-format pBRDF: M00 = (0.2 + 0.5 cos(theta_h)) *
    (wvl/650), off-diagonals small and proportional to M00."""
    phi_d = np.linspace(0, np.pi, P).astype(np.float32)[None, :]
    theta_d = np.linspace(0, np.pi / 2, T).astype(np.float32)[None, :]
    theta_h = np.linspace(0, np.pi / 2, H).astype(np.float32)[None, :]
    wvls = np.asarray([450, 500, 550, 600, 650], np.uint16)
    L = len(wvls)
    m = np.zeros((P, T, H, L, 4, 4), np.float32)
    m00 = (0.2 + 0.5 * np.cos(theta_h[0]))[None, None, :, None] \
        * (wvls.astype(np.float32) / 650.0)[None, None, None, :]
    m[..., 0, 0] = m00
    m[..., 1, 1] = 0.3 * m00
    m[..., 2, 2] = -0.2 * m00
    m[..., 3, 3] = 0.1 * m00
    m[..., 0, 1] = 0.05 * m00
    m[..., 1, 0] = 0.05 * m00
    if nan_slice:
        m[:, :, H - 1, :, 0, 0] = np.nan
    return {"theta_h": theta_h, "theta_d": theta_d, "phi_d": phi_d,
            "wvls": wvls, "M": m}


def test_measured_polarized_chi2():
    from tests.test_bsdfs import run_bsdf_chi2
    run_bsdf_chi2({"type": "measured_polarized", "fields": synth_pbsdf(),
                   "alpha_sample": 0.35},
                  wi=(0.3, -0.1, 0.95), cos_bounds=(0.0, 1.0), ires=17)


def _mpol_scene_si(fields, wi, **kw):
    from eradiate_kernel_tpu.core.frame import Frame
    from eradiate_kernel_tpu.core.types import Variant
    from eradiate_kernel_tpu.render.records import SurfaceInteraction
    from eradiate_kernel_tpu.scene import load_dict
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle",
                 "bsdf": {"type": "measured_polarized", "fields": fields,
                          **kw}},
    }, Variant("spectral"))
    wi = jnp.asarray(wi, jnp.float32)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    n = wi.shape[0]
    z = jnp.zeros(n)
    si = SurfaceInteraction(
        t=jnp.ones(n), p=jnp.zeros((n, 3)),
        n=jnp.zeros((n, 3)).at[:, 2].set(1.0),
        sh_frame=Frame.from_normal(jnp.zeros((n, 3)).at[:, 2].set(1.0)),
        uv=jnp.full((n, 2), 0.5), prim_uv=jnp.zeros((n, 2)),
        dp_du=jnp.zeros((n, 3)).at[:, 0].set(1.0),
        dp_dv=jnp.zeros((n, 3)).at[:, 1].set(1.0),
        wi=wi, wavelengths=jnp.full((n, 4), 550.0),
        time=z, prim_index=jnp.zeros(n, jnp.int32),
        shape_index=jnp.zeros(n, jnp.int32))
    return scene, si


def test_measured_polarized_eval_closed_form():
    """eval = M00(theta_h, lambda) * cos_o for the synthetic separable data
    (measured_polarized.cpp:312)."""
    from eradiate_kernel_tpu import bsdfs

    scene, si = _mpol_scene_si(synth_pbsdf(),
                               np.tile([0.0, 0.0, 1.0], (2, 1)))
    wo = jnp.asarray([[0.0, 0.0, 1.0], [0.3, 0.0, 0.954]], jnp.float32)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    val, pdf = bsdfs.bsdf_eval_pdf(scene, jnp.zeros(2, jnp.int32), si, wo,
                                   jnp.ones(2, bool))
    v = np.asarray(val)
    cos_o = np.asarray(wo)[:, 2]
    th = 0.5 * np.arccos(np.clip(
        (np.asarray(si.wi) * np.asarray(wo)).sum(-1), -1, 1))
    expect = (0.2 + 0.5 * np.cos(th)) * (550.0 / 650.0) * cos_o
    assert np.allclose(v[:, 0], expect, rtol=2e-2), (v[:, 0], expect)
    assert (np.asarray(pdf) > 0).all()


def test_measured_polarized_mueller_m00_matches_eval():
    from eradiate_kernel_tpu import bsdfs
    from eradiate_kernel_tpu.bsdfs import measured_polarized as mpol

    wi = np.tile([0.2, -0.3, 0.93], (3, 1))
    scene, si = _mpol_scene_si(synth_pbsdf(), wi)
    rng = np.random.RandomState(4)
    wo = rng.uniform(-0.5, 0.5, (3, 3)).astype(np.float32)
    wo[:, 2] = rng.uniform(0.6, 1.0, 3)
    wo = jnp.asarray(wo / np.linalg.norm(wo, axis=-1, keepdims=True))
    act = jnp.ones(3, bool)
    val, _ = bsdfs.bsdf_eval_pdf(scene, jnp.zeros(3, jnp.int32), si, wo, act)
    m = mpol.eval_mueller(scene, scene.bsdfs["measured_polarized"],
                          jnp.zeros(3, jnp.int32), si, wo, act)
    assert np.allclose(np.asarray(m[..., 0, 0]), np.asarray(val),
                       rtol=1e-3, atol=1e-6)
    assert np.isfinite(np.asarray(m)).all()


def test_measured_polarized_nan_scrub():
    """NaN-encoded invalid entries zero the whole Mueller matrix
    (measured_polarized.cpp:274-276) instead of leaking into transport."""
    from eradiate_kernel_tpu import bsdfs
    from eradiate_kernel_tpu.bsdfs import measured_polarized as mpol

    wi = np.tile([0.0, 0.0, 1.0], (2, 1))
    scene, si = _mpol_scene_si(synth_pbsdf(nan_slice=True), wi)
    # wo far from wi -> theta_h near the NaN slice at pi/2... use grazing wo
    wo = jnp.asarray([[0.85, 0.0, 0.527], [0.05, 0.0, 0.9987]], jnp.float32)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    act = jnp.ones(2, bool)
    val, _ = bsdfs.bsdf_eval_pdf(scene, jnp.zeros(2, jnp.int32), si, wo, act)
    m = mpol.eval_mueller(scene, scene.bsdfs["measured_polarized"],
                          jnp.zeros(2, jnp.int32), si, wo, act)
    assert np.isfinite(np.asarray(val)).all()
    assert np.isfinite(np.asarray(m)).all()
    # near-normal lane is far from the NaN slice: stays positive
    assert np.asarray(val)[1, 0] > 0


def test_measured_polarized_fixed_wavelength():
    """wavelength=550 pins every channel to the 550nm band
    (measured_polarized.cpp:262-272)."""
    from eradiate_kernel_tpu import bsdfs

    wi = np.tile([0.1, 0.0, 0.995], (1, 1))
    scene, si = _mpol_scene_si(synth_pbsdf(), wi, wavelength=550.0)
    si = si.replace(wavelengths=jnp.asarray([[450.0, 500.0, 600.0, 650.0]]))
    wo = jnp.asarray([[0.0, 0.1, 0.995]], jnp.float32)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    val, _ = bsdfs.bsdf_eval_pdf(scene, jnp.zeros(1, jnp.int32), si, wo,
                                 jnp.ones(1, bool))
    v = np.asarray(val)[0]
    assert np.allclose(v, v[0], rtol=1e-5)  # all channels identical
