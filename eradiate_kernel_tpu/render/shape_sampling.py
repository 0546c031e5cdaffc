"""Shape surface sampling (area measure) for area lights.

Counterpart of Shape::sample_position / pdf_position (shape.h:52-109) and the
default direction sampling that converts an area sample to solid angle by
dist^2 / cos (shape.cpp:293-320). Dispatches over shape families like
geometry.py. Mesh face selection uses a global face-area cumsum segmented per
shape (strictly increasing, so one searchsorted serves all shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import warp
from ..core.gather import table_gather as tg
from ..core.math import normalize
from ..core.transform import Transform
from .geometry import (FAMILY_DISK, FAMILY_MESH, FAMILY_RECT, FAMILY_SPHERE,
                       Geometry)
from .records import PositionSample


def sample_position(scene, shape_idx, s1, s2, active=True):
    """shape_idx: (...,) i32; s1: (...,) face-pick sample; s2: (..., 2).
    Returns PositionSample with area-measure pdf = 1/shape_area."""
    geo: Geometry = scene.geo
    family = tg(geo.shape_family, shape_idx)
    batch = shape_idx.shape
    p = jnp.zeros(batch + (3,))
    n = jnp.zeros(batch + (3,)).at[..., 2].set(1.0)
    uv = jnp.zeros(batch + (2,))

    def sel(mask, new, old):
        if new.ndim > mask.ndim:
            mask = mask[..., None]
        return jnp.where(mask, new, old)

    if geo.faces.shape[0] > 0:
        m = family == FAMILY_MESH
        off = tg(scene.shape_face_offset, shape_idx)
        cnt = jnp.maximum(tg(scene.shape_face_count, shape_idx), 1)
        C = scene.face_area_cumsum  # (F,) strictly increasing
        lo = jnp.where(off > 0, C[jnp.maximum(off - 1, 0)], 0.0)
        hi = C[off + cnt - 1]
        target = lo + s1 * (hi - lo)
        face = jnp.clip(jnp.searchsorted(C, target, side="right"), 0,
                        C.shape[0] - 1)
        face = jnp.clip(face, off, off + cnt - 1)
        f = geo.faces[face]
        v0, v1, v2 = geo.vertices[f[..., 0]], geo.vertices[f[..., 1]], geo.vertices[f[..., 2]]
        b = warp.square_to_uniform_triangle(s2)
        w = 1.0 - b[..., 0] - b[..., 1]
        pm = v0 * w[..., None] + v1 * b[..., 0:1] + v2 * b[..., 1:2]
        nm = normalize(jnp.cross(v1 - v0, v2 - v0))
        uv0, uv1, uv2 = geo.uvs[f[..., 0]], geo.uvs[f[..., 1]], geo.uvs[f[..., 2]]
        uvm = uv0 * w[..., None] + uv1 * b[..., 0:1] + uv2 * b[..., 1:2]
        p, n, uv = sel(m, pm, p), sel(m, nm, n), sel(m, uvm, uv)

    if geo.sph_center.shape[0] > 0:
        m = family == FAMILY_SPHERE
        slot = scene.shape_prim_slot[shape_idx]
        c = geo.sph_center[slot]
        r = geo.sph_radius[slot]
        d = warp.square_to_uniform_sphere(s2)
        ps = c + d * r[..., None]
        p, n = sel(m, ps, p), sel(m, d, n)
        uv = sel(m, s2, uv)

    if geo.rect_shape.shape[0] > 0:
        m = family == FAMILY_RECT
        slot = scene.shape_prim_slot[shape_idx]
        tw: Transform = jax.tree_util.tree_map(lambda a: a[slot], geo.rect_to_world)
        pl = jnp.stack([2 * s2[..., 0] - 1, 2 * s2[..., 1] - 1,
                        jnp.zeros_like(s2[..., 0])], -1)
        pr = tw.transform_affine_point(pl)
        nr = normalize(tw.transform_normal(jnp.zeros_like(pl).at[..., 2].set(1.0)))
        p, n, uv = sel(m, pr, p), sel(m, nr, n), sel(m, s2, uv)

    if geo.disk_shape.shape[0] > 0:
        m = family == FAMILY_DISK
        slot = scene.shape_prim_slot[shape_idx]
        tw = jax.tree_util.tree_map(lambda a: a[slot], geo.disk_to_world)
        dl = warp.square_to_uniform_disk_concentric(s2)
        pl = jnp.concatenate([dl, jnp.zeros_like(dl[..., :1])], -1)
        pd = tw.transform_affine_point(pl)
        nd = normalize(tw.transform_normal(jnp.zeros_like(pl).at[..., 2].set(1.0)))
        p, n, uv = sel(m, pd, p), sel(m, nd, n), sel(m, s2, uv)

    pdf = 1.0 / jnp.maximum(tg(scene.shape_area, shape_idx), 1e-20)
    return PositionSample(p=p, n=n, uv=uv, pdf=pdf,
                          delta=jnp.zeros(batch, bool))


def pdf_position(scene, shape_idx):
    return 1.0 / jnp.maximum(tg(scene.shape_area, shape_idx), 1e-20)
