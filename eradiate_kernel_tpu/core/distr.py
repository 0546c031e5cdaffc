"""1D distributions (counterpart of include/mitsuba/core/distr_1d.h).

Construction happens host-side (numpy ok) — CDFs are precomputed device
arrays; ``sample``/``pdf`` are jittable and vectorize over the wavefront.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .types import pytree_dataclass


@pytree_dataclass
class DiscreteDistribution:
    """Discrete pmf over {0..n-1} (distr_1d.h:19)."""

    pmf: jnp.ndarray  # (n,)
    cdf: jnp.ndarray  # (n,) inclusive cumsum, unnormalized
    total: jnp.ndarray  # ()

    @staticmethod
    def from_pmf(pmf):
        pmf = jnp.asarray(pmf, jnp.float32)
        cdf = jnp.cumsum(pmf)
        return DiscreteDistribution(pmf=pmf, cdf=cdf, total=cdf[-1])

    @property
    def n(self):
        return self.pmf.shape[0]

    def eval_pmf_normalized(self, index):
        return self.pmf[index] / self.total

    def sample(self, xi):
        """xi in [0,1) -> index."""
        u = xi * self.total
        idx = jnp.searchsorted(self.cdf, u, side="right")
        return jnp.clip(idx, 0, self.n - 1)

    def sample_pmf(self, xi):
        idx = self.sample(xi)
        return idx, self.pmf[idx] / self.total

    def sample_reuse(self, xi):
        """Sample an index and rescale xi for reuse (distr_1d.h sample_reuse)."""
        idx = self.sample(xi)
        cdf_lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        pmf = self.pmf[idx]
        rescaled = (xi * self.total - cdf_lo) / jnp.maximum(pmf, 1e-30)
        return idx, jnp.clip(rescaled, 0.0, 1.0 - 1e-7)


@pytree_dataclass(static_fields=("range_min", "range_max"))
class ContinuousDistribution:
    """Piecewise-linear pdf on a regular grid over [range_min, range_max]
    (distr_1d.h:258)."""

    pdf_vals: jnp.ndarray   # (n,) unnormalized node values
    cdf: jnp.ndarray        # (n-1,) integral up to node i+1, unnormalized
    integral: jnp.ndarray   # ()
    range_min: float
    range_max: float

    @staticmethod
    def from_pdf(values, range_min, range_max):
        v = np.asarray(values, np.float64)
        n = v.shape[0]
        dx = (range_max - range_min) / (n - 1)
        seg = 0.5 * (v[1:] + v[:-1]) * dx
        cdf = np.cumsum(seg)
        return ContinuousDistribution(
            pdf_vals=jnp.asarray(v, jnp.float32),
            cdf=jnp.asarray(cdf, jnp.float32),
            integral=jnp.asarray(cdf[-1], jnp.float32),
            range_min=float(range_min),
            range_max=float(range_max),
        )

    @property
    def n(self):
        return self.pdf_vals.shape[0]

    def _dx(self):
        return (self.range_max - self.range_min) / (self.n - 1)

    def eval_pdf(self, x):
        """Unnormalized linear interpolation of pdf values."""
        t = (x - self.range_min) / self._dx()
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, self.n - 2)
        f = t - i
        val = self.pdf_vals[i] * (1 - f) + self.pdf_vals[i + 1] * f
        inside = (x >= self.range_min) & (x <= self.range_max)
        return jnp.where(inside, val, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) / self.integral

    def sample(self, xi):
        """Inverse-CDF sample; returns x."""
        u = xi * self.integral
        seg = jnp.clip(jnp.searchsorted(self.cdf, u, side="right"), 0, self.n - 2)
        cdf_lo = jnp.where(seg > 0, self.cdf[jnp.maximum(seg - 1, 0)], 0.0)
        u_loc = u - cdf_lo
        dx = self._dx()
        v0 = self.pdf_vals[seg]
        v1 = self.pdf_vals[seg + 1]
        slope = (v1 - v0) / dx
        # solve v0 * t + slope/2 t^2 = u_loc  for t in [0, dx]
        a = 0.5 * slope
        lin = jnp.abs(slope) < 1e-12 * jnp.maximum(v0, 1.0)
        t_lin = u_loc / jnp.maximum(v0, 1e-30)
        disc = jnp.maximum(v0 * v0 + 4.0 * a * u_loc, 0.0)
        t_quad = 2.0 * u_loc / jnp.maximum(v0 + jnp.sqrt(disc), 1e-30)
        t = jnp.where(lin, t_lin, t_quad)
        x = self.range_min + seg * dx + jnp.clip(t, 0.0, dx)
        return x

    def sample_pdf(self, xi):
        x = self.sample(xi)
        return x, self.eval_pdf_normalized(x)


@pytree_dataclass
class IrregularContinuousDistribution:
    """Piecewise-linear pdf on an irregular node grid (distr_1d.h:525)."""

    nodes: jnp.ndarray     # (n,)
    pdf_vals: jnp.ndarray  # (n,)
    cdf: jnp.ndarray       # (n-1,)
    integral: jnp.ndarray  # ()

    @staticmethod
    def from_pdf(nodes, values):
        x = np.asarray(nodes, np.float64)
        v = np.asarray(values, np.float64)
        seg = 0.5 * (v[1:] + v[:-1]) * np.diff(x)
        cdf = np.cumsum(seg)
        return IrregularContinuousDistribution(
            nodes=jnp.asarray(x, jnp.float32),
            pdf_vals=jnp.asarray(v, jnp.float32),
            cdf=jnp.asarray(cdf, jnp.float32),
            integral=jnp.asarray(cdf[-1], jnp.float32),
        )

    @property
    def n(self):
        return self.nodes.shape[0]

    def eval_pdf(self, x):
        i = jnp.clip(jnp.searchsorted(self.nodes, x, side="right") - 1, 0, self.n - 2)
        x0, x1 = self.nodes[i], self.nodes[i + 1]
        f = (x - x0) / jnp.maximum(x1 - x0, 1e-30)
        val = self.pdf_vals[i] * (1 - f) + self.pdf_vals[i + 1] * f
        inside = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(inside, val, 0.0)

    def eval_pdf_normalized(self, x):
        return self.eval_pdf(x) / self.integral

    def sample(self, xi):
        u = xi * self.integral
        seg = jnp.clip(jnp.searchsorted(self.cdf, u, side="right"), 0, self.n - 2)
        cdf_lo = jnp.where(seg > 0, self.cdf[jnp.maximum(seg - 1, 0)], 0.0)
        u_loc = u - cdf_lo
        x0, x1 = self.nodes[seg], self.nodes[seg + 1]
        dx = x1 - x0
        v0, v1 = self.pdf_vals[seg], self.pdf_vals[seg + 1]
        slope = (v1 - v0) / jnp.maximum(dx, 1e-30)
        a = 0.5 * slope
        lin = jnp.abs(slope) * dx < 1e-9 * jnp.maximum(v0, 1e-9)
        t_lin = u_loc / jnp.maximum(v0, 1e-30)
        disc = jnp.maximum(v0 * v0 + 4.0 * a * u_loc, 0.0)
        t_quad = 2.0 * u_loc / jnp.maximum(v0 + jnp.sqrt(disc), 1e-30)
        t = jnp.where(lin, t_lin, t_quad)
        return x0 + jnp.clip(t, 0.0, dx)

    def sample_pdf(self, xi):
        x = self.sample(xi)
        return x, self.eval_pdf_normalized(x)
