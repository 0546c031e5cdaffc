"""Quadrature rules (counterpart of include/mitsuba/core/quad.h).

All rules return ``(nodes, weights)`` on the canonical interval [-1, 1] as
device arrays; node computation runs on host in float64 at trace time (these
are tiny, build-once tables — the reference computes them with enoki
dynamic arrays on the host too, quad.h:20-180).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gauss_legendre(n):
    """Gauss-Legendre rule with n points: exact for polynomials of degree
    2n - 1 (quad.h gauss_legendre)."""
    if n < 1:
        raise ValueError("gauss_legendre: n must be >= 1")
    x, w = np.polynomial.legendre.leggauss(int(n))
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def gauss_lobatto(n):
    """Gauss-Lobatto rule with n points (includes both endpoints): exact for
    polynomials of degree 2n - 3 (quad.h gauss_lobatto)."""
    n = int(n)
    if n < 2:
        raise ValueError("gauss_lobatto: n must be >= 2")
    # interior nodes: roots of P'_{n-1}; get them as eigenvalues of the
    # Jacobi matrix of the (1,1)-Jacobi polynomials, or simply via the
    # derivative's companion roots in float64
    leg = np.polynomial.legendre.Legendre.basis(n - 1)
    dleg = leg.deriv()
    interior = dleg.roots().real
    x = np.concatenate([[-1.0], np.sort(interior), [1.0]])
    pn = np.polynomial.legendre.legval(x, [0.0] * (n - 1) + [1.0])
    w = 2.0 / (n * (n - 1) * pn ** 2)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def composite_simpson(n):
    """Composite Simpson rule over n (odd >= 3) equally spaced points
    (quad.h composite_simpson)."""
    n = int(n)
    if n < 3 or n % 2 == 0:
        raise ValueError("composite_simpson: n must be odd and >= 3")
    h = 2.0 / (n - 1)
    x = -1.0 + h * np.arange(n)
    w = np.full(n, 2.0)
    w[1::2] = 4.0
    w[0] = w[-1] = 1.0
    w *= h / 3.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def composite_simpson_38(n):
    """Composite Simpson 3/8 rule over n points with n - 1 divisible by 3
    (quad.h composite_simpson_38)."""
    n = int(n)
    if n < 4 or (n - 1) % 3 != 0:
        raise ValueError("composite_simpson_38: need (n - 1) % 3 == 0, n >= 4")
    h = 2.0 / (n - 1)
    x = -1.0 + h * np.arange(n)
    w = np.full(n, 3.0)
    w[3::3] = 2.0
    w[0] = w[-1] = 1.0
    w *= 3.0 * h / 8.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)
