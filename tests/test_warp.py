"""Chi^2 tests for all sampling warps (analog of src/libcore/tests/test_warp.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.core import warp
from eradiate_kernel_tpu.utils.chi2 import (
    ChiSquareTest, LineDomain, PlanarDomain, SphericalDomain, WarpAdapter,
    SpectrumAdapter,
)

N = 200_000


def run_warp_chi2(domain, warp_fn, pdf_fn, res=31, **kw):
    sample_func, pdf_func = WarpAdapter(warp_fn, pdf_fn)
    test = ChiSquareTest(domain, sample_func, pdf_func, sample_count=N,
                         res=res, ires=9, **kw)
    ok = test.run(significance_level=0.01)
    assert ok, "\n".join(test.messages)


def test_uniform_disk():
    run_warp_chi2(PlanarDomain(), warp.square_to_uniform_disk,
                  warp.square_to_uniform_disk_pdf)


def test_uniform_disk_concentric():
    run_warp_chi2(PlanarDomain(), warp.square_to_uniform_disk_concentric,
                  warp.square_to_uniform_disk_pdf)


def test_uniform_triangle():
    # res=101: the pdf discontinuity along the diagonal straddles cells, so
    # keep per-cell mass low enough that Simpson integration error of the
    # step stays well under the sampling noise (matches reference defaults)
    run_warp_chi2(PlanarDomain(np.array([[0, 1], [0, 1]])),
                  warp.square_to_uniform_triangle,
                  warp.square_to_uniform_triangle_pdf, res=101)


def test_uniform_sphere():
    run_warp_chi2(SphericalDomain(), warp.square_to_uniform_sphere,
                  warp.square_to_uniform_sphere_pdf)


def test_uniform_hemisphere():
    # restrict to the support: the equator discontinuity otherwise bisects a
    # cos-theta cell row and systematically inflates chi^2 (same pattern as
    # the cone tests below)
    run_warp_chi2(SphericalDomain(cos_bounds=(0.0, 1.0)),
                  warp.square_to_uniform_hemisphere,
                  warp.square_to_uniform_hemisphere_pdf)


def test_cosine_hemisphere():
    run_warp_chi2(SphericalDomain(), warp.square_to_cosine_hemisphere,
                  warp.square_to_cosine_hemisphere_pdf)


@pytest.mark.parametrize("cutoff", [0.95, 0.5, -0.3])
def test_uniform_cone(cutoff):
    # restrict the domain to the cone's support so histogram cells don't
    # straddle the pdf discontinuity at cos_theta = cutoff
    run_warp_chi2(SphericalDomain(cos_bounds=(cutoff, 1.0)),
                  lambda s: warp.square_to_uniform_cone(s, cutoff),
                  lambda d: warp.square_to_uniform_cone_pdf(d, cutoff),
                  res=(16, 48))


def test_tent():
    run_warp_chi2(PlanarDomain(), warp.square_to_tent, warp.square_to_tent_pdf)


def test_std_normal():
    run_warp_chi2(PlanarDomain(np.array([[-4, 4], [-4, 4]])),
                  warp.square_to_std_normal, warp.square_to_std_normal_pdf)


@pytest.mark.parametrize("alpha", [0.1, 0.5, 1.0])
def test_beckmann(alpha):
    # adapt the zone to where the mass is (tail beyond ~5 alphas is < 1e-7)
    lo = max(-1.0, np.cos(np.arctan(5.0 * alpha)) - 0.02)
    run_warp_chi2(SphericalDomain(cos_bounds=(lo, 1.0)),
                  lambda s: warp.square_to_beckmann(s, alpha),
                  lambda d: warp.square_to_beckmann_pdf(d, alpha),
                  res=(16, 64))


@pytest.mark.parametrize("kappa", [0.5, 10.0, 100.0])
def test_von_mises_fisher(kappa):
    lo = max(-1.0, 1.0 - 12.0 / kappa)
    run_warp_chi2(SphericalDomain(cos_bounds=(lo, 1.0)),
                  lambda s: warp.square_to_von_mises_fisher(s, kappa),
                  lambda d: warp.square_to_von_mises_fisher_pdf(d, kappa),
                  res=(16, 64))


def test_wavelength_sampling_chi2():
    from eradiate_kernel_tpu.core import spectrum as sp

    sample_func, pdf_func = SpectrumAdapter(sp.sample_uniform_spectrum,
                                            sp.pdf_uniform_spectrum_cie)
    test = ChiSquareTest(LineDomain((sp.CIE_MIN, sp.CIE_MAX)), sample_func,
                         pdf_func, sample_count=N, res=31, ires=9)
    assert test.run(0.01), "\n".join(test.messages)
