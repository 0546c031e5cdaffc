"""Chi^2 goodness-of-fit harness for sampling routines.

Counterpart of mitsuba.python.chi2 (src/python/python/chi2.py:6-357): histogram
the outputs of a ``sample`` routine over a domain grid and compare against the
numerically integrated ``pdf`` with a Pearson chi^2 test (cells pooled below a
minimum expected count, Numerical-Recipes style dof adjustment).

Adapters at the bottom wrap BSDFs, phase functions, spectra and raw warps into
the (sample_func, pdf_func) pair the test consumes — mirroring
BSDFAdapter/PhaseFunctionAdapter/SpectrumAdapter (chi2.py:442-558).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.rng import Sampler
from .special import chi2_p_value


class LineDomain:
    """1D interval domain."""

    def __init__(self, bounds=(0.0, 1.0)):
        self.bounds = (float(bounds[0]), float(bounds[1]))

    @property
    def dimension(self):
        return 1

    def aspect(self):
        return None

    def map_forward(self, p):
        return p[..., :1]

    def map_backward(self, p):
        return p

    def bounds_array(self):
        return np.array([self.bounds])


class PlanarDomain:
    def __init__(self, bounds=None):
        if bounds is None:
            bounds = np.array([[-1.0, 1.0], [-1.0, 1.0]])
        self.bounds = np.asarray(bounds, np.float64)

    @property
    def dimension(self):
        return 2

    def aspect(self):
        e = self.bounds[:, 1] - self.bounds[:, 0]
        return e[0] / e[1]

    def map_forward(self, p):
        return p

    def map_backward(self, p):
        return p

    def bounds_array(self):
        return self.bounds


class SphericalDomain:
    """Directions on S^2 mapped to (phi, cos_theta) — area-preserving
    (chi2.py:359-388). ``cos_bounds`` restricts the domain to a spherical
    zone, useful for sharply peaked distributions (cones, low-roughness
    microfacets) where full-sphere cells would straddle the support."""

    def __init__(self, cos_bounds=(-1.0, 1.0)):
        self.cos_bounds = (float(cos_bounds[0]), float(cos_bounds[1]))

    @property
    def dimension(self):
        return 2

    def aspect(self):
        return 2.0

    def map_forward(self, p):
        """(phi, cos_theta) -> direction"""
        phi, ct = p[..., 0], p[..., 1]
        st = np.sqrt(np.maximum(0.0, 1.0 - ct * ct))
        return np.stack([st * np.cos(phi), st * np.sin(phi), ct], axis=-1)

    def map_backward(self, d):
        """direction -> (phi, cos_theta)"""
        return np.stack([np.arctan2(d[..., 1], d[..., 0]),
                         np.clip(d[..., 2], -1.0, 1.0)], axis=-1)

    def bounds_array(self):
        return np.array([[-np.pi, np.pi], list(self.cos_bounds)])


class ChiSquareTest:
    """
    Parameters mirror the reference harness: ``sample_func(sampler) ->
    points`` draws from the routine under test; ``pdf_func(points) -> density``
    must be the density w.r.t. the natural measure of the domain
    (solid angle for SphericalDomain).
    """

    def __init__(self, domain, sample_func, pdf_func, sample_dim=2,
                 sample_count=1_000_000, res=101, ires=8, seed=0):
        self.domain = domain
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_dim = sample_dim
        self.sample_count = int(sample_count)
        if isinstance(res, (tuple, list)):
            self.res = np.array([res[0], res[1]])
        elif domain.aspect() is None:
            self.res = np.array([res, 1])
        else:
            self.res = np.array([res, max(1, int(res / domain.aspect()))])
        self.ires = ires
        self.seed = seed
        self.messages = []
        self.fail = False

    # -- histogram of observed samples ---------------------------------------
    def tabulate_histogram(self):
        sampler = Sampler.seed(self.seed, jnp.arange(self.sample_count, dtype=jnp.uint32))
        out = self.sample_func(sampler)
        if isinstance(out, tuple):
            pts, weights = out
        else:
            pts, weights = out, None
        pts = np.asarray(pts)
        p = self.domain.map_backward(pts)
        b = self.domain.bounds_array()
        eps = 1e-6 * (b[:, 1] - b[:, 0])
        valid = np.ones(p.shape[0], bool)
        if weights is not None:
            weights = np.asarray(weights)
            valid &= weights > 0
        for d in range(self.domain.dimension):
            valid &= np.isfinite(p[:, d])
        p = p[valid]
        w = None if weights is None else weights[valid]
        self.histogram_n_valid = int(valid.sum())
        if self.domain.dimension == 1:
            hist, _ = np.histogram(p[:, 0], bins=self.res[0],
                                   range=(b[0, 0] - eps[0], b[0, 1] + eps[0]), weights=w)
            hist = hist[None, :]
        else:
            hist, _, _ = np.histogram2d(
                p[:, 1], p[:, 0], bins=[self.res[1], self.res[0]],
                range=[(b[1, 0] - eps[1], b[1, 1] + eps[1]),
                       (b[0, 0] - eps[0], b[0, 1] + eps[0])], weights=w)
        self.histogram = hist.astype(np.float64)
        return self.histogram

    # -- numerically integrated pdf -------------------------------------------
    def tabulate_pdf(self):
        b = self.domain.bounds_array()
        nx, ny = int(self.res[0]), int(self.res[1])
        ir = self.ires
        # composite Simpson needs odd number of nodes per cell
        k = ir if ir % 2 == 1 else ir + 1

        def cell_nodes(lo, hi, n_cells):
            edges = np.linspace(lo, hi, n_cells + 1)
            cells = []
            for i in range(n_cells):
                cells.append(np.linspace(edges[i], edges[i + 1], k))
            return np.array(cells)  # (n_cells, k)

        xs = cell_nodes(b[0, 0], b[0, 1], nx)
        if self.domain.dimension == 1:
            pts = xs.reshape(-1, 1)
            vals = np.asarray(self.pdf_func(jnp.asarray(pts, jnp.float32))).reshape(nx, k)
            wsimp = _simpson_weights(k) * (xs[0, -1] - xs[0, 0])
            pdf = (vals * wsimp).sum(-1)[None, :]
        else:
            ys = cell_nodes(b[1, 0], b[1, 1], ny)
            # build the full grid of evaluation points: (ny, nx, k, k, dim)
            gx = np.broadcast_to(xs[None, :, None, :], (ny, nx, k, k))
            gy = np.broadcast_to(ys[:, None, :, None], (ny, nx, k, k))
            grid = np.stack([gx, gy], axis=-1).reshape(-1, 2)
            pts3 = self.domain.map_forward(grid)
            vals = np.asarray(
                self.pdf_func(jnp.asarray(pts3, jnp.float32))
            ).reshape(ny, nx, k, k)
            wx = _simpson_weights(k) * (xs[0, -1] - xs[0, 0])
            wy = _simpson_weights(k) * (ys[0, -1] - ys[0, 0])
            pdf = np.einsum("yxij,i,j->yx", vals, wy, wx)
        self.pdf = pdf * self.sample_count
        return self.pdf

    # -- the test --------------------------------------------------------------
    def run(self, significance_level=0.01, test_count=1, min_expected=5.0):
        """Pearson chi^2 with cell pooling; Sidak-corrected significance when
        this is one of ``test_count`` parametrized runs (chi2.py:222)."""
        self.tabulate_histogram()
        self.tabulate_pdf()
        obs = self.histogram.ravel()
        exp = self.pdf.ravel()

        if abs(exp.sum() - obs.sum()) > max(exp.sum(), obs.sum()) * 0.05 + 100:
            self._log(f"sum mismatch: expected {exp.sum():.1f}, observed {obs.sum():.1f}")

        order = np.argsort(exp)
        obs, exp = obs[order], exp[order]
        # pool cells with low expected count
        pooled_obs = pooled_exp = 0.0
        chi2 = 0.0
        dof = 0
        n_pooled_in = 0
        for o, e in zip(obs, exp):
            if e == 0:
                if o > self.sample_count * 1e-5:
                    self._log(f"expected 0 but observed {o}")
                    self.fail = True
                continue
            if e < min_expected or pooled_exp > 0 and pooled_exp < min_expected:
                pooled_obs += o
                pooled_exp += e
                n_pooled_in += 1
                if pooled_exp >= min_expected:
                    chi2 += (pooled_obs - pooled_exp) ** 2 / pooled_exp
                    dof += 1
                    pooled_obs = pooled_exp = 0.0
            else:
                chi2 += (o - e) ** 2 / e
                dof += 1
        dof -= 1
        if dof <= 0:
            self._log("degrees of freedom <= 0")
            self.fail = True
            return not self.fail

        self.p_value = chi2_p_value(chi2, dof)
        alpha = 1.0 - (1.0 - significance_level) ** (1.0 / test_count)
        if self.p_value < alpha:
            self._log(
                f"rejected the null hypothesis (p-value = {self.p_value:.5g}, "
                f"significance = {alpha:.5g}, chi2 = {chi2:.4g}, dof = {dof})")
            self.fail = True
        return not self.fail

    def _log(self, msg):
        self.messages.append(msg)


def _simpson_weights(k):
    """Composite Simpson weights over k (odd) equally spaced nodes on [0,1]."""
    assert k % 2 == 1
    w = np.ones(k)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return w / (3.0 * (k - 1))


# --- adapters -----------------------------------------------------------------

def WarpAdapter(warp_fn, pdf_fn, sample_dim=2):
    """Wrap a square_to_X warp + pdf pair (test_warp style)."""

    def sample_func(sampler):
        sampler, s = sampler.next_2d()
        return np.asarray(warp_fn(s))

    def pdf_func(pts):
        return pdf_fn(pts)

    return sample_func, pdf_func


def BSDFAdapter(bsdf_dict, wi=(0.3, -0.2, 0.9), variant=None):
    """chi2 adapter for a BSDF kind (reference: chi2.py:478 BSDFAdapter).

    Builds a one-rectangle scene around ``bsdf_dict``, fabricates a fixed-wi
    SurfaceInteraction wavefront, and exposes (sample_func, pdf_func) in the
    local shading frame (= world frame of the canonical rectangle). Delta
    lobes are excluded from the histogram via their sampled_type flags (the
    chi2 compares the smooth component only, like the reference which relies
    on the pdf covering the sampled measure)."""
    import numpy as np

    from .. import bsdfs
    from ..core.types import Variant
    from ..render.records import SurfaceInteraction
    from ..core.frame import Frame
    from ..scene import load_dict

    variant = variant or Variant("rgb")
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle", "bsdf": bsdf_dict},
    }, variant)
    wi = np.asarray(wi, np.float64)
    wi = wi / np.linalg.norm(wi)

    def make_si(n):
        z = jnp.zeros(n)
        return SurfaceInteraction(
            t=jnp.ones(n), p=jnp.zeros((n, 3)),
            n=jnp.zeros((n, 3)).at[:, 2].set(1.0),
            sh_frame=Frame.from_normal(jnp.zeros((n, 3)).at[:, 2].set(1.0)),
            uv=jnp.full((n, 2), 0.5),
            prim_uv=jnp.zeros((n, 2)),
            dp_du=jnp.zeros((n, 3)).at[:, 0].set(1.0),
            dp_dv=jnp.zeros((n, 3)).at[:, 1].set(1.0),
            wi=jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3)),
            wavelengths=(jnp.full((n, 4), 550.0) if variant.is_spectral
                         else jnp.zeros((n, 0))),
            time=z, prim_index=jnp.zeros(n, jnp.int32),
            shape_index=jnp.zeros(n, jnp.int32))

    bsdf_idx_of = lambda n: scene.shape_bsdf[jnp.zeros(n, jnp.int32)]

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        si = make_si(n)
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        bs, w = bsdfs.bsdf_sample(scene, bsdf_idx_of(n), si, s1, s2,
                                  jnp.ones(n, bool))
        from ..bsdfs import common as bc
        smooth = (bs.sampled_type & bc.Delta) == 0
        ok = (bs.pdf > 0) & smooth & jnp.any(w > 0, -1)
        return np.asarray(bs.wo), np.asarray(ok.astype(jnp.float32))

    def pdf_func(pts):
        n = pts.shape[0]
        si = make_si(n)
        _, pdf = bsdfs.bsdf_eval_pdf(scene, bsdf_idx_of(n), si,
                                     jnp.asarray(pts, jnp.float32),
                                     jnp.ones(n, bool))
        return pdf

    return sample_func, pdf_func


def PhaseFunctionAdapter(phase_dict, wi=(0.0, 0.0, 1.0), variant=None):
    """chi2 adapter for a phase-function kind (chi2.py:558)."""
    import numpy as np

    from ..core.types import Variant
    from ..phase import phase_eval, phase_sample
    from ..scene import load_dict

    variant = variant or Variant("rgb")
    scene = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
        "rect": {"type": "rectangle",
                 "interior": {"type": "homogeneous", "sigma_t": 1.0,
                              "phase": phase_dict}},
    }, variant)
    ray_d = np.asarray(wi, np.float64)
    ray_d = ray_d / np.linalg.norm(ray_d)

    def sample_func(sampler):
        n = sampler.k0.shape[0]
        sampler, s1 = sampler.next_1d()
        sampler, s2 = sampler.next_2d()
        d = jnp.broadcast_to(jnp.asarray(ray_d, jnp.float32), (n, 3))
        wo, _pdf = phase_sample(scene, jnp.zeros(n, jnp.int32), d, s1, s2)
        return np.asarray(wo)

    def pdf_func(pts):
        n = pts.shape[0]
        d = jnp.broadcast_to(jnp.asarray(ray_d, jnp.float32), (n, 3))
        return phase_eval(scene, jnp.zeros(n, jnp.int32), -d,
                          jnp.asarray(pts, jnp.float32))

    return sample_func, pdf_func


def SpectrumAdapter(sample_fn, pdf_fn):
    """1D wavelength-sampling adapter (chi2.py:442)."""

    def sample_func(sampler):
        sampler, s = sampler.next_1d()
        lam, _w = sample_fn(s)
        return np.asarray(lam)[..., None]

    def pdf_func(pts):
        return pdf_fn(pts[..., 0])

    return sample_func, pdf_func
