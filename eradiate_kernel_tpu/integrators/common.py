"""Shared integrator utilities."""

from __future__ import annotations

import jax.numpy as jnp


def mis_weight(pdf_a, pdf_b):
    """Power heuristic, beta=2 (reference: path.cpp:223-227)."""
    pdf_a = pdf_a * pdf_a
    pdf_b = pdf_b * pdf_b
    return jnp.where(pdf_a > 0, pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-30), 0.0)


def spec_channels(scene, wavelengths):
    if scene.config.variant.is_spectral:
        return wavelengths.shape[-1]
    return scene.config.variant.n_channels


def remat_scan_body(scene, scan_body, batch, max_iterations):
    """Choose whether the bounce scan rematerializes its backward pass.

    jax.checkpoint recomputes each bounce from the counter-based RNG keys
    instead of storing residuals — mandatory for large wavefronts (memory),
    but ~2x slower backward. Measured (cbox 256x256 spp=1, v5e): 30 ms/grad
    without remat vs 58 ms with. The integrator extra ``remat`` forces it
    (True/False); ``"auto"`` (default) remats only when
    lane-bounces > 2^23 (~8M, roughly 1.6 GB of residuals)."""
    import math

    import jax

    extra = dict(scene.config.integrator.extra)
    remat = extra.get("remat", "auto")
    if remat == "auto":
        lanes = math.prod(batch) if batch else 1
        use = lanes * max_iterations > (1 << 23)
    else:
        use = bool(remat)

    # pin the output carry to the input carry's dtypes: under
    # jax_enable_x64, default-dtype intermediates would otherwise promote
    # pieces of an f32 carry to f64 (and the f64 variant needs its
    # f32-seeded pieces promoted back up) — see volpath.match_dtypes
    from .volpath import match_dtypes

    def stable_body(s, x):
        out, y = scan_body(s, x)
        return match_dtypes(out, s), y

    return jax.checkpoint(stable_body) if use else stable_body
