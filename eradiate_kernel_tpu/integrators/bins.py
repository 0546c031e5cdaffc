"""[ERADIATE] Spectral-bin wrapper integrators.

``bins`` (reference: src/integrators/bins.cpp:12-58): accumulates the child
integrator's spectral radiance into named wavelength bins "name:lo:hi" as AOV
channels — the way Eradiate extracts per-band TOA radiances in one render.

``nbins`` (reference: src/integrators/nbins.cpp:50,127): narrow-bin variant
for discrete line spectra — a bin is "name:center" with a tolerance; hero
wavelengths within +-tol of the center contribute.

Spectral variants only (bins.cpp throws otherwise).
"""

from __future__ import annotations

import jax.numpy as jnp


def _parse(cfg, narrow):
    extra = dict(cfg.integrator.extra)
    spec = str(extra.get("bins", ""))
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        fields = part.split(":")
        if narrow:
            name, center = fields[0], float(fields[1])
            tol = float(extra.get("tolerance", 1.0))
            out.append((name, center - tol, center + tol))
        else:
            name, lo, hi = fields[0], float(fields[1]), float(fields[2])
            out.append((name, lo, hi))
    return out


def _child(cfg):
    from . import REGISTRY
    extra = dict(cfg.integrator.extra)
    return REGISTRY[extra.get("child", "path")]


def make(narrow: bool):
    """Build the bins/nbins module namespace."""

    class _Mod:
        @staticmethod
        def aov_names(cfg):
            return [name for name, _, _ in _parse(cfg, narrow)]

        @staticmethod
        def n_aov(cfg):
            return len(_parse(cfg, narrow))

        @staticmethod
        def sample(scene, sampler, ray, active=None):
            cfg = scene.config
            return _child(cfg).sample(scene, sampler, ray, active)

        @staticmethod
        def sample_aov(scene, sampler, ray, ray_weight, active=None):
            cfg = scene.config
            assert cfg.variant.is_spectral, \
                "bins/nbins integrators require the spectral variant"
            spec, valid, sampler = _child(cfg).sample(scene, sampler, ray,
                                                      active)
            weighted = spec * ray_weight  # 1/pdf of the wavelength sampling
            wl = ray.wavelengths
            cols = []
            for _name, lo, hi in _parse(cfg, narrow):
                inside = (wl >= lo) & (wl < hi)
                # hero-mean estimator of the bin integral int_bin L dlambda
                cols.append(jnp.mean(jnp.where(inside, weighted, 0.0),
                                     axis=-1, keepdims=True))
            aovs = (jnp.concatenate(cols, -1) if cols
                    else jnp.zeros(spec.shape[:-1] + (0,)))
            return spec, valid, sampler, aovs

        # --- regen-driver hooks ----------------------------------------
        @staticmethod
        def _regen_module(cfg):
            return _child(cfg)

        @staticmethod
        def _harvest_aov(scene, vp, rw, aov_carry):
            cfg = scene.config
            assert cfg.variant.is_spectral, \
                "bins/nbins integrators require the spectral variant"
            weighted = vp.result * rw
            wl = vp.ray.wavelengths
            cols = [jnp.mean(jnp.where((wl >= lo) & (wl < hi),
                                       weighted, 0.0),
                             axis=-1, keepdims=True)
                    for _name, lo, hi in _parse(cfg, narrow)]
            return (jnp.concatenate(cols, -1) if cols
                    else jnp.zeros(weighted.shape[:-1] + (0,)))

    return _Mod


bins = make(False)
nbins = make(True)
