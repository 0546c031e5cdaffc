"""The Scene: a pytree of SoA registries + hashable static config.

This replaces the reference's object graph (Scene -> Shapes -> BSDFs ... with
virtual dispatch, scene.h:12-224). Everything jit-traceable lives in flat
arrays; everything structural (which kinds exist, film size, integrator
settings) is trace-time static in SceneConfig.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..core.types import Variant, pytree_dataclass
from ..render.geometry import Geometry


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    kind: str = "path"
    max_depth: int = 8
    rr_depth: int = 5
    hide_emitters: bool = False
    # volpath extras
    extra: tuple = ()


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    variant: Variant
    bsdf_kinds: tuple
    emitter_kinds: tuple
    texture_kinds: tuple
    spectrum_kinds: tuple
    medium_kinds: tuple
    phase_kinds: tuple
    volume_kinds: tuple
    sensor_kind: str
    n_emitters: int
    env_emitter: int  # emitter index of the environment emitter, -1 if none
    film_width: int
    film_height: int
    rfilter: str
    rfilter_params: tuple  # hashable ((k, v), ...)
    integrator: IntegratorConfig
    spp: int
    sensor_medium: int = -1  # medium the sensor is embedded in
    sensor_static: tuple = ()  # hashable ((key, value), ...) sensor statics
    sampler_kind: str = "independent"
    # hdrfilm options (hdrfilm.cpp): output pixel format + crop window
    pixel_format: str = "rgb"          # rgb | rgba | xyz | luminance
    crop_offset: tuple = (0, 0)        # (x, y) within the full film
    crop_size: tuple = ()              # () = full film
    # trace-time-static per-slot plugin metadata (kind, (slot0, slot1, ...))
    # — table resolutions etc. that must stay Python values under jit
    # (used by data-driven plugins like the measured BSDF)
    bsdf_static: tuple = ()
    # every heterogeneous medium is a vertical profile sigma(z): optical
    # depth has a closed form (cumulative table) — see media.medium_tau_segment
    het_profile1d: bool = False



@pytree_dataclass(static_fields=("config",))
class Scene:
    geo: Geometry

    # per-shape tables
    shape_bsdf: jnp.ndarray       # (n_shapes,) i32
    shape_emitter: jnp.ndarray    # (n_shapes,) i32 (-1)
    shape_interior: jnp.ndarray   # (n_shapes,) i32 medium (-1)
    shape_exterior: jnp.ndarray   # (n_shapes,) i32 medium (-1)
    shape_prim_slot: jnp.ndarray  # (n_shapes,) i32 index in family pool
    shape_area: jnp.ndarray       # (n_shapes,)
    shape_face_offset: jnp.ndarray  # (n_shapes,) i32
    shape_face_count: jnp.ndarray   # (n_shapes,) i32
    face_area_cumsum: jnp.ndarray   # (F,)

    # registries
    bsdfs: Any        # dict kind -> dict param -> array
    bsdf_kind: jnp.ndarray
    bsdf_slot: jnp.ndarray
    bsdf_flags: jnp.ndarray

    emitters: Any
    emitter_kind: jnp.ndarray
    emitter_slot: jnp.ndarray

    textures: Any
    tex_kind: jnp.ndarray
    tex_slot: jnp.ndarray

    spectra: Any
    spec_kind: jnp.ndarray
    spec_slot: jnp.ndarray

    media: Any
    medium_kind: jnp.ndarray
    medium_slot: jnp.ndarray
    medium_phase: jnp.ndarray  # (n_media,) i32 phase index per medium

    phases: Any
    phase_kind: jnp.ndarray
    phase_slot: jnp.ndarray

    volumes: Any
    vol_kind: jnp.ndarray
    vol_slot: jnp.ndarray

    bitmap_data: jnp.ndarray  # (n_bitmaps, H, W, 3)
    mesh_attr_data: jnp.ndarray  # (n_attrs, V, 3) per-vertex attributes

    sensor: Any  # dict of sensor params

    bsphere_center: jnp.ndarray  # (3,)
    bsphere_radius: jnp.ndarray  # ()

    config: SceneConfig

    # spectral variants: per-texel rgb2spec upsampling of the bitmap pool
    # (sigmoid-poly coeffs + brightness scale, envmap.cpp:69-89 scheme)
    bitmap_coeff: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 1, 1, 3)))
    bitmap_scale: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.ones((1, 1, 1)))
