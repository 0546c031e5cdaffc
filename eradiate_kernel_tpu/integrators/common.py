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
