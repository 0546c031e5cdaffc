"""Core type utilities: pytree dataclasses and the variant configuration.

The reference compiles one C++ codebase into N variants over ``<Float, Spectrum>``
(reference: resources/mitsuba.conf.template, include/mitsuba/core/fwd.h:212).
Here a *variant* is a trace-time static config: everything under ``jax.jit`` is
specialized on it, which plays the role of template instantiation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def pytree_dataclass(cls=None, *, static_fields: tuple = ()):
    """Decorator: a frozen dataclass registered as a JAX pytree.

    Fields listed in ``static_fields`` become aux data (hashable, trace-time
    static); all other fields are child arrays.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in static_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static_fields)
        )

        def replace(self, **kw):
            return dataclasses.replace(self, **kw)

        c.replace = replace
        return c

    if cls is None:
        return wrap
    return wrap(cls)


_MODE_CHANNELS = {"mono": 1, "rgb": 3, "spectral": 4}


@dataclasses.dataclass(frozen=True)
class Variant:
    """Trace-time rendering configuration.

    mode:
      - 'mono'     — 1 radiance channel, no wavelength sampling
      - 'rgb'      — 3 radiance channels (sRGB primaries)
      - 'spectral' — 4 hero wavelengths carried per ray
        (reference: resources/mitsuba.conf.template:139-142)
    """

    mode: str = "rgb"
    dtype: Any = jnp.float32
    polarized: bool = False

    def __post_init__(self):
        # precision suffix (mitsuba.conf.template:57-63 float/double axis):
        # Variant("rgb_double") == Variant("rgb", dtype=jnp.float64)
        if self.mode.endswith("_double"):
            object.__setattr__(self, "mode", self.mode[:-len("_double")])
            object.__setattr__(self, "dtype", jnp.float64)
        if self.mode not in _MODE_CHANNELS:
            raise ValueError(f"unknown mode {self.mode!r}")

    @property
    def n_channels(self) -> int:
        return _MODE_CHANNELS[self.mode]

    @property
    def is_spectral(self) -> bool:
        return self.mode == "spectral"

    @property
    def is_monochromatic(self) -> bool:
        return self.mode == "mono"


DEFAULT_VARIANT = Variant("rgb")
