"""Shape geometry pools and ray intersection.

The reference dispatches `ray_intersect` to kd-tree/Embree/OptiX backends over
polymorphic `Shape` objects (scene.cpp:94-134, shape.h:23-496). Here geometry
is struct-of-arrays *pools per shape family* (triangle mesh, sphere, rectangle,
disk, cylinder) — the wavefront intersects each present family in a batched,
masked sweep and reduces to the closest hit. This is the two-phase hit:

  1. ``ray_intersect_preliminary`` — detached, accelerator-style, returns a
     PreliminaryIntersection (like optix_rt.cu's SoA out-buffers);
  2. ``compute_surface_interaction`` — recomputes the hit differentiably from
     primitive data (interaction.h:571-580) so gradients flow to vertices,
     transforms, and ray origins/directions.

The brute-force sweep here is the correctness oracle (`ray_intersect_naive`
analog, scene.h:54); the Pallas tiled/BVH kernel in ops/ plugs in behind the
same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.frame import Frame
from ..core.gather import select_along_axis, table_gather as tg
from ..core.math import INVALID_T, cross, dot, normalize, safe_sqrt, sqr
from ..core.ray import Ray
from ..core.transform import Transform
from ..core.types import pytree_dataclass
from .records import PreliminaryIntersection, SurfaceInteraction

# family ids
FAMILY_MESH = 0
FAMILY_SPHERE = 1
FAMILY_RECT = 2
FAMILY_DISK = 3
FAMILY_CYLINDER = 4
FAMILY_CONE = 5
FAMILY_IMESH = 6  # instanced mesh (two-level: shared group geometry)

import dataclasses as _dc


def _dfield(shape, integer=False):
    return _dc.field(default_factory=lambda: jnp.zeros(
        shape, jnp.int32 if integer else jnp.float32))


def _tfield():
    return _dc.field(default_factory=lambda: Transform(
        m=jnp.zeros((0, 4, 4)), inv_t=jnp.zeros((0, 4, 4))))


@pytree_dataclass
class Geometry:
    """All scene geometry as per-family SoA pools. Any family may be empty
    (leading dim 0) — presence is a trace-time static."""

    # triangle meshes (concatenated)
    vertices: jnp.ndarray     # (V, 3)
    normals: jnp.ndarray      # (V, 3) zero rows -> face normal fallback
    uvs: jnp.ndarray          # (V, 2)
    faces: jnp.ndarray        # (F, 3) i32
    face_shape: jnp.ndarray   # (F,) i32 global shape index

    # spheres
    sph_center: jnp.ndarray   # (S, 3)
    sph_radius: jnp.ndarray   # (S,)
    sph_shape: jnp.ndarray    # (S,) i32
    sph_flip: jnp.ndarray     # (S,) bool flip normals

    # rectangles: canonical [-1,1]^2 in the xy-plane
    rect_to_world: Transform  # (R, 4, 4)
    rect_shape: jnp.ndarray   # (R,) i32

    # disks: canonical unit disk in the xy-plane
    disk_to_world: Transform  # (D, 4, 4)
    disk_shape: jnp.ndarray   # (D,) i32

    # cylinders: canonical along +z, unit radius, z in [0, length] in local
    cyl_to_world: Transform   # (C, 4, 4)
    cyl_length: jnp.ndarray   # (C,)
    cyl_radius: jnp.ndarray   # (C,)
    cyl_shape: jnp.ndarray    # (C,) i32

    # cones: base radius at z=0, apex at z=length in local (cone.cpp)
    cone_to_world: Transform  # (K, 4, 4)
    cone_length: jnp.ndarray  # (K,)
    cone_radius: jnp.ndarray  # (K,)
    cone_shape: jnp.ndarray   # (K,) i32

    # per-shape family table
    shape_family: jnp.ndarray  # (n_shapes,) i32

    # triangle-tile accelerator (ops/accel.py; empty leading dim = absent)
    tiles_v0: jnp.ndarray      # (T, K, 3)
    tiles_e1: jnp.ndarray      # (T, K, 3)
    tiles_e2: jnp.ndarray      # (T, K, 3)
    tiles_prim: jnp.ndarray    # (T, K) i32 face index (-1 pad)
    tiles_shape: jnp.ndarray   # (T, K) i32
    tiles_lo: jnp.ndarray      # (T, 3)
    tiles_hi: jnp.ndarray      # (T, 3)
    bvh_box: jnp.ndarray       # (2T-1, 1, 8) f32 node AABBs (ops/bvh.py)
    bvh_meta: jnp.ndarray      # (2T-1, 4) i32 [left, right, tile, inst]
    bvh8_box: jnp.ndarray = _dfield((0, 8, 8))   # (N8, 8, 8) wide nodes
    bvh8_meta: jnp.ndarray = _dfield((0, 8, 4), True)  # [child, tile, inst, 0]
    tiles_xf: jnp.ndarray = _dc.field(default_factory=lambda: jnp.asarray(
        [[1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]],
        jnp.float32))                             # (I+1, 12) w2l affine rows
    tiles_sbase: jnp.ndarray = _dfield((1,), True)  # (I+1,) shape bases

    # two-level instancing (shapegroup.h:6-62, shapes/instance.cpp:53-77):
    # group mesh geometry is stored ONCE in local space; instances are
    # (transform, group face range) records. N instances of a canopy cost
    # N transform rows, not N geometry copies.
    ig_vertices: jnp.ndarray = _dfield((0, 3))      # (Vg, 3) group-local
    ig_normals: jnp.ndarray = _dfield((0, 3))       # (Vg, 3)
    ig_uvs: jnp.ndarray = _dfield((0, 2))           # (Vg, 2)
    ig_faces: jnp.ndarray = _dfield((0, 3), True)   # (Fg, 3) i32
    ig_face_sub: jnp.ndarray = _dfield((0,), True)  # (Fg,) i32 sub-shape ord
    inst_l2w: Transform = _tfield()                 # (I, 4, 4) stacked
    inst_w2l: Transform = _tfield()                 # (I, 4, 4) stacked
    inst_f_off: jnp.ndarray = _dfield((0,), True)   # (I,) i32
    inst_f_count: jnp.ndarray = _dfield((0,), True)  # (I,) i32
    inst_shape_base: jnp.ndarray = _dfield((0,), True)  # (I,) i32
    inst_lo: jnp.ndarray = _dfield((0, 3))          # (I, 3) world AABB
    inst_hi: jnp.ndarray = _dfield((0, 3))          # (I, 3)
    shape_inst: jnp.ndarray = _dfield((0,), True)   # (n_shapes,) i32 or -1

    @property
    def n_shapes(self):
        return self.shape_family.shape[0]

    @property
    def has_tiles(self):
        return self.tiles_v0.shape[0] > 0

    @property
    def n_instances(self):
        return self.inst_f_off.shape[0]


def empty_geometry(n_shapes=0):
    z = lambda *s: jnp.zeros(s, jnp.float32)
    zi = lambda *s: jnp.zeros(s, jnp.int32)
    ident = Transform(m=jnp.zeros((0, 4, 4)), inv_t=jnp.zeros((0, 4, 4)))
    return Geometry(
        vertices=z(0, 3), normals=z(0, 3), uvs=z(0, 2), faces=zi(0, 3),
        face_shape=zi(0), sph_center=z(0, 3), sph_radius=z(0),
        sph_shape=zi(0), sph_flip=jnp.zeros((0,), bool),
        rect_to_world=ident, rect_shape=zi(0),
        disk_to_world=ident, disk_shape=zi(0),
        cyl_to_world=ident, cyl_length=z(0), cyl_radius=z(0), cyl_shape=zi(0),
        cone_to_world=ident, cone_length=z(0), cone_radius=z(0),
        cone_shape=zi(0),
        shape_family=zi(n_shapes),
        tiles_v0=z(0, 128, 3), tiles_e1=z(0, 128, 3), tiles_e2=z(0, 128, 3),
        tiles_prim=zi(0, 128), tiles_shape=zi(0, 128),
        tiles_lo=z(0, 3), tiles_hi=z(0, 3),
        bvh_box=z(0, 1, 8), bvh_meta=zi(0, 4))


# =============================================================================
# Per-family intersection tests (batched over rays x prims)
# =============================================================================

def moller_trumbore(o, d, v0, v1, v2):
    """Differentiable Möller–Trumbore (reference: mesh.h:180-226).

    All inputs broadcastable to (..., 3). Returns (t, u, v, valid) where
    (u, v) are barycentric coords of v1/v2 and valid excludes parallel rays
    and out-of-triangle hits (t bounds NOT checked here).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    valid = (jnp.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
    return t, u, v, valid


def _intersect_meshes(geo: Geometry, ray: Ray):
    """Brute-force all triangles: (N rays) x (F faces).

    TPU path: Möller–Trumbore is multilinear in (o, d, o x d), so the whole
    rays-x-faces sweep collapses to ONE MXU matmul. With n = e1 x e2 and
    w = o x d, the scaled barycentrics/distance are exact triple products:

        det   = -d . n
        t*det =  o . n - v0 . n
        u*det =  w . e2 + d . (v0 x e2)
        v*det = -w . e1 - d . (v0 x e1)

    so [det, t*det, u*det, v*det] = [o, d, w, 1] @ M with M a per-face
    constant (10, 4F) matrix built from the vertex buffer (XLA hoists it out
    of render loops as loop-invariant). This replaces ~20 (N, F, 3)
    elementwise temporaries with a (N,10)@(10,4F) systolic-array pass — the
    mesh.h:180-226 math restated for the MXU instead of translated. The
    classic per-lane form (moller_trumbore above) remains the differentiable
    second phase (compute_surface_interaction) and the oracle the tests
    compare against."""
    v = geo.vertices
    f = geo.faces
    v0 = v[f[:, 0]]  # (F, 3)
    v1 = v[f[:, 1]]
    v2 = v[f[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n = cross(e1, e2)                       # (F, 3) unnormalized
    F = f.shape[0]
    zero = jnp.zeros((F, 3), v.dtype)
    # lhs feature rows: [o (3), d (3), w = o x d (3), 1]
    col_det = jnp.concatenate([zero, -n, zero, jnp.zeros((F, 1))], -1)
    col_T = jnp.concatenate([n, zero, zero, -dot(v0, n, keepdims=True)], -1)
    col_U = jnp.concatenate([zero, cross(v0, e2), e2, jnp.zeros((F, 1))], -1)
    col_V = jnp.concatenate([zero, -cross(v0, e1), -e1,
                             jnp.zeros((F, 1))], -1)
    M = jnp.stack([col_det, col_T, col_U, col_V], 0)  # (4, F, 10)
    w = cross(ray.o, ray.d)
    ones = jnp.ones(ray.o.shape[:-1] + (1,), ray.o.dtype)
    lhs = jnp.concatenate([ray.o, ray.d, w, ones], -1)  # (N, 10)
    out = jnp.einsum("...k,qfk->...qf", lhs, M,
                     precision=jax.lax.Precision.HIGHEST)  # (N, 4, F)
    det, T, U, V = (out[..., q, :] for q in range(4))
    eps = 1e-12
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    t = T * inv_det
    s = jnp.sign(det)
    sU = s * U
    sV = s * V
    adet = jnp.abs(det)
    valid = (adet >= eps) & (sU >= 0) & (sV >= 0) & (sU + sV <= adet) \
        & (t >= ray.mint[..., None]) & (t <= ray.maxt[..., None])
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, axis=-1)
    tb = jnp.min(t, axis=-1)
    ub = select_along_axis(U * inv_det, best)
    vb = select_along_axis(V * inv_det, best)
    return tb, jnp.stack([ub, vb], -1), best.astype(jnp.int32), \
        tg(geo.face_shape, best)


def _intersect_instanced(geo: Geometry, ray: Ray):
    """Two-level instanced meshes (shapegroup.h:6-62 / instance.cpp:53-77).

    Group geometry lives ONCE in local space (ig_* pools); a lax.scan walks
    the instances: per step the ray is transformed into instance space
    (affine, so the t parameterization is preserved) and tested against the
    instance's group face range, gated by a per-lane world-AABB slab test
    (a whole step collapses to the reduction when no lane touches the
    instance — the scalar-cond analog of the reference's top-level accel)."""
    batch = ray.o.shape[:-1]
    Fg = geo.ig_faces.shape[0]
    v0g = geo.ig_vertices[geo.ig_faces[:, 0]]  # (Fg, 3) local space
    v1g = geo.ig_vertices[geo.ig_faces[:, 1]]
    v2g = geo.ig_vertices[geo.ig_faces[:, 2]]

    inv_d =1.0 / jnp.where(jnp.abs(ray.d) < 1e-20,
                            jnp.where(ray.d < 0, -1e-20, 1e-20), ray.d)

    init = (jnp.full(batch, jnp.inf), jnp.zeros(batch + (2,)),
            jnp.zeros(batch, jnp.int32), jnp.full(batch, -1, jnp.int32))

    def body(carry, i):
        t_b, uv_b, prim_b, shape_b = carry
        lo = geo.inst_lo[i]
        hi = geo.inst_hi[i]
        t0 = (lo - ray.o) * inv_d
        t1 = (hi - ray.o) * inv_d
        near = jnp.max(jnp.minimum(t0, t1), -1)
        farr = jnp.min(jnp.maximum(t0, t1), -1)
        touch = (jnp.maximum(near, ray.mint)
                 <= jnp.minimum(farr, jnp.minimum(ray.maxt, t_b)))

        def hit_inst():
            w2l = Transform(m=geo.inst_w2l.m[i],
                            inv_t=geo.inst_w2l.inv_t[i])
            o_l = w2l.transform_affine_point(ray.o)[..., None, :]
            d_l = w2l.transform_vector(ray.d)[..., None, :]
            t, u, vv, ok = moller_trumbore(o_l, d_l, v0g, v1g, v2g)
            fidx = jnp.arange(Fg)
            in_rng = (fidx >= geo.inst_f_off[i]) \
                & (fidx < geo.inst_f_off[i] + geo.inst_f_count[i])
            ok = ok & in_rng & touch[..., None] \
                & (t >= ray.mint[..., None]) \
                & (t < jnp.minimum(ray.maxt, t_b)[..., None])
            t = jnp.where(ok, t, jnp.inf)
            best = jnp.argmin(t, axis=-1)
            tb = jnp.min(t, axis=-1)
            closer = tb < t_b
            ub = select_along_axis(u, best)
            vb = select_along_axis(vv, best)
            sub = tg(geo.ig_face_sub, best)
            return (jnp.where(closer, tb, t_b),
                    jnp.where(closer[..., None],
                              jnp.stack([ub, vb], -1), uv_b),
                    jnp.where(closer, best.astype(jnp.int32), prim_b),
                    jnp.where(closer, geo.inst_shape_base[i] + sub,
                              shape_b))

        out = jax.lax.cond(jnp.any(touch), hit_inst, lambda: carry)
        return out, None

    (t_b, uv_b, prim_b, shape_b), _ = jax.lax.scan(
        body, init, jnp.arange(geo.n_instances))
    return t_b, uv_b, prim_b, shape_b


def _sphere_roots(center, radius, o, d):
    """Stable quadratic for the sphere (reference: sphere.cpp:272-349)."""
    L = o - center
    a = dot(d, d)
    b = 2.0 * dot(d, L)
    c = dot(L, L) - sqr(radius)
    disc = sqr(b) - 4.0 * a * c
    valid = disc >= 0.0
    sqrt_d = safe_sqrt(disc)
    q = -0.5 * (b + jnp.where(b >= 0, sqrt_d, -sqrt_d))
    t0 = q / a
    t1 = c / jnp.where(jnp.abs(q) < 1e-20, 1e-20, q)
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    return valid, near, far


def _intersect_spheres(geo: Geometry, ray: Ray):
    o = ray.o[..., None, :]
    d = ray.d[..., None, :]
    valid, near, far = _sphere_roots(geo.sph_center, geo.sph_radius, o, d)  # (N, S)
    mint = ray.mint[..., None]
    maxt = ray.maxt[..., None]
    t = jnp.where((near >= mint) & (near <= maxt), near,
                  jnp.where((far >= mint) & (far <= maxt), far, jnp.inf))
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, axis=-1)
    tb = jnp.min(t, axis=-1)
    return tb, jnp.zeros(tb.shape + (2,), tb.dtype), best.astype(jnp.int32), \
        tg(geo.sph_shape, best)


def _plane_hit_local(to_world: Transform, ray: Ray):
    """Transform rays into each prim's local frame, hit the z=0 plane.
    Returns (t, p_local) with shapes (N, P) / (N, P, 3)."""
    inv = to_world.inverse()
    o = inv.transform_affine_point(ray.o[..., None, :])
    d = inv.transform_vector(ray.d[..., None, :])
    dz = jnp.where(jnp.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    t = -o[..., 2] / dz
    p = o + d * t[..., None]
    return t, p, jnp.abs(d[..., 2]) >= 1e-12


def _intersect_rects(geo: Geometry, ray: Ray):
    t, p, ok = _plane_hit_local(geo.rect_to_world, ray)  # (N, R)
    inside = (jnp.abs(p[..., 0]) <= 1.0) & (jnp.abs(p[..., 1]) <= 1.0)
    valid = ok & inside & (t >= ray.mint[..., None]) & (t <= ray.maxt[..., None])
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, axis=-1)
    tb = jnp.min(t, axis=-1)
    pb = jnp.stack([select_along_axis(p[..., 0], best),
                    select_along_axis(p[..., 1], best)], -1)
    uv = 0.5 * (pb + 1.0)
    return tb, uv, best.astype(jnp.int32), tg(geo.rect_shape, best)


def _intersect_disks(geo: Geometry, ray: Ray):
    t, p, ok = _plane_hit_local(geo.disk_to_world, ray)
    r2 = sqr(p[..., 0]) + sqr(p[..., 1])
    valid = ok & (r2 <= 1.0) & (t >= ray.mint[..., None]) & (t <= ray.maxt[..., None])
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, axis=-1)
    tb = jnp.min(t, axis=-1)
    pb = jnp.stack([select_along_axis(p[..., 0], best),
                    select_along_axis(p[..., 1], best)], -1)
    r = safe_sqrt(sqr(pb[..., 0]) + sqr(pb[..., 1]))
    phi = jnp.arctan2(pb[..., 1], pb[..., 0])
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    uv = jnp.stack([r, phi / (2 * jnp.pi)], -1)
    return tb, uv, best.astype(jnp.int32), geo.disk_shape[best]


def _intersect_cylinders(geo: Geometry, ray: Ray):
    inv = geo.cyl_to_world.inverse()
    o = inv.transform_affine_point(ray.o[..., None, :])  # (N, C, 3)
    d = inv.transform_vector(ray.d[..., None, :])
    r = geo.cyl_radius
    a = sqr(d[..., 0]) + sqr(d[..., 1])
    b = 2.0 * (d[..., 0] * o[..., 0] + d[..., 1] * o[..., 1])
    c = sqr(o[..., 0]) + sqr(o[..., 1]) - sqr(r)
    disc = sqr(b) - 4 * a * c
    ok = disc >= 0
    sq = safe_sqrt(disc)
    a_s = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    q = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
    t0 = jnp.minimum(q / a_s, c / jnp.where(jnp.abs(q) < 1e-20, 1e-20, q))
    t1 = jnp.maximum(q / a_s, c / jnp.where(jnp.abs(q) < 1e-20, 1e-20, q))
    z0 = o[..., 2] + d[..., 2] * t0
    z1 = o[..., 2] + d[..., 2] * t1
    L = geo.cyl_length
    mint = ray.mint[..., None]
    maxt = ray.maxt[..., None]
    v0 = ok & (t0 >= mint) & (t0 <= maxt) & (z0 >= 0) & (z0 <= L)
    v1 = ok & (t1 >= mint) & (t1 <= maxt) & (z1 >= 0) & (z1 <= L)
    t = jnp.where(v0, t0, jnp.where(v1, t1, jnp.inf))
    best = jnp.argmin(t, axis=-1)
    tb = jnp.min(t, axis=-1)
    return tb, jnp.zeros(tb.shape + (2,), tb.dtype), best.astype(jnp.int32), \
        tg(geo.cyl_shape, best)


def _cone_coeffs(geo: Geometry, o, d):
    """Quadratic coefficients for the canonical cone x^2+y^2 = (r(1-z/L))^2
    (cone.cpp) given local-frame rays; returns (a, b, c, slope r/L)."""
    r = geo.cone_radius
    L = geo.cone_length
    k = r / jnp.maximum(L, 1e-9)
    c0 = r - k * o[..., 2]
    c1 = -k * d[..., 2]
    a = sqr(d[..., 0]) + sqr(d[..., 1]) - sqr(c1)
    b = 2.0 * (o[..., 0] * d[..., 0] + o[..., 1] * d[..., 1]) - 2.0 * c0 * c1
    c = sqr(o[..., 0]) + sqr(o[..., 1]) - sqr(c0)
    return a, b, c, k


def _intersect_cones(geo: Geometry, ray: Ray):
    inv = geo.cone_to_world.inverse()
    o = inv.transform_affine_point(ray.o[..., None, :])  # (N, K, 3)
    d = inv.transform_vector(ray.d[..., None, :])
    a, b, c, _k = _cone_coeffs(geo, o, d)
    disc = sqr(b) - 4.0 * a * c
    ok = disc >= 0
    sq = safe_sqrt(disc)
    a_s = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
    q = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
    r0 = q / a_s
    r1 = c / jnp.where(jnp.abs(q) < 1e-20, 1e-20, q)
    t0 = jnp.minimum(r0, r1)
    t1 = jnp.maximum(r0, r1)
    z0 = o[..., 2] + d[..., 2] * t0
    z1 = o[..., 2] + d[..., 2] * t1
    L = geo.cone_length
    mint = ray.mint[..., None]
    maxt = ray.maxt[..., None]
    v0 = ok & (t0 >= mint) & (t0 <= maxt) & (z0 >= 0) & (z0 <= L)
    v1 = ok & (t1 >= mint) & (t1 <= maxt) & (z1 >= 0) & (z1 <= L)
    t = jnp.where(v0, t0, jnp.where(v1, t1, jnp.inf))
    best = jnp.argmin(t, axis=-1)
    tb = jnp.min(t, axis=-1)
    return tb, jnp.zeros(tb.shape + (2,), tb.dtype), best.astype(jnp.int32), \
        tg(geo.cone_shape, best)


# =============================================================================
# Combined preliminary intersection (the accelerator oracle)
# =============================================================================

def _accel_mode(geo: Geometry) -> str:
    """Static accel policy -> 'naive' | 'tiles' | 'bvh'.

    The Pallas kernels win on TPU for non-trivial meshes; small scenes and
    CPU runs keep the fused brute-force sweep (the correctness oracle).
    'bvh' = stack traversal of the tile hierarchy (default on TPU, the
    kd-tree/Embree/OptiX analog); 'tiles' = flat tile sweep with the host
    precull (kept as a second oracle / small-scene path). ERT_ACCEL
    overrides (tests force kernels in interpret mode)."""
    import os
    mode = os.environ.get("ERT_ACCEL", "auto")
    if mode == "naive" or not geo.has_tiles:
        return "naive"
    if mode in ("tiles", "bvh", "bvh8"):
        # instanced leaves only exist in the BVHs (meta inst column); the
        # flat sweep would hit group tiles without their transforms
        if geo.n_instances > 0 and mode == "tiles":
            return "bvh"
        if mode == "bvh8" and geo.bvh8_box.shape[0] == 0:
            return "bvh"
        return mode
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    eff_tris = geo.faces.shape[0] \
        + geo.n_instances * max(geo.ig_faces.shape[0], 0)
    if platform == "tpu" and eff_tris >= 1024:
        # measured crossover on v5e (bench_mesh terrain): the precull +
        # dense tile sweep beats the stack traversal up to ~2k tiles
        # (~260k tris) — data-dependent per-node control flow is expensive
        # on this architecture, so the hierarchy only pays once the sweep's
        # O(admitted tiles) loop is long; instanced scenes always need the
        # BVH (the flat sweep has no per-leaf transforms)
        big = geo.tiles_v0.shape[0] > 2048
        if geo.n_instances == 0 and not big:
            return "tiles"
        # BVH8 measured SLOWER than the binary kernel on v5e (2.59 vs
        # 3.22 Mrays/s primary, 130k-tri terrain): its per-node ordering
        # selection re-spends on the scalar core what the (8, B) wide
        # slab test saves on the VPU. Kept opt-in for future hardware.
        if geo.bvh8_box.shape[0] > 0 \
                and os.environ.get("ERT_BVH_WIDE", "0") == "1":
            return "bvh8"
        return "bvh" if geo.bvh_box.shape[0] > 0 else "tiles"
    return "naive"


def ray_intersect_preliminary(geo: Geometry, ray: Ray) -> PreliminaryIntersection:
    """Closest hit over all present families; detached (callers stop_gradient
    it — the differentiable quantities come from compute_surface_interaction)."""
    batch = ray.o.shape[:-1]
    t = jnp.full(batch, jnp.inf)
    uv = jnp.zeros(batch + (2,))
    prim = jnp.zeros(batch, jnp.int32)
    shape = jnp.full(batch, -1, jnp.int32)

    def merge(res):
        nonlocal t, uv, prim, shape
        tf, uvf, primf, shapef = res
        closer = tf < t
        t = jnp.where(closer, tf, t)
        uv = jnp.where(closer[..., None], uvf, uv)
        prim = jnp.where(closer, primf, prim)
        shape = jnp.where(closer, shapef, shape)

    mode = _accel_mode(geo) if geo.has_tiles else "naive"
    if geo.faces.shape[0] > 0 or (geo.n_instances > 0 and mode == "bvh"):
        if mode != "naive":
            import os

            from ..ops.pallas_intersect import (intersect_bvh,
                                                intersect_bvh8,
                                                intersect_tiles)

            tiles = {"v0": geo.tiles_v0, "e1": geo.tiles_e1,
                     "e2": geo.tiles_e2, "prim": geo.tiles_prim,
                     "shape": geo.tiles_shape, "lo": geo.tiles_lo,
                     "hi": geo.tiles_hi, "nbox": geo.bvh_box,
                     "nmeta": geo.bvh_meta, "cbox": geo.bvh8_box,
                     "cmeta": geo.bvh8_meta, "xf": geo.tiles_xf,
                     "sbase": geo.tiles_sbase}
            interp = os.environ.get("ERT_ACCEL_INTERPRET", "") != ""
            flat_shape = batch
            flat_n = int(np.prod(batch)) if batch else 1
            # explicit leading size: reshape(-1) cannot infer through
            # zero-size trailing axes (rgb rays carry (N, 0) wavelengths)
            ray_flat = jax.tree_util.tree_map(
                lambda a: a.reshape((flat_n,) + a.shape[len(batch):]), ray)
            fn = {"bvh": intersect_bvh, "bvh8": intersect_bvh8,
                  "tiles": intersect_tiles}[mode]
            tt, tuv, tprim, tshape = fn(tiles, ray_flat, interpret=interp)
            merge((tt.reshape(flat_shape), tuv.reshape(flat_shape + (2,)),
                   tprim.reshape(flat_shape), tshape.reshape(flat_shape)))
        else:
            merge(_intersect_meshes(geo, ray))
    if geo.n_instances > 0 and mode != "bvh":
        merge(_intersect_instanced(geo, ray))
    if geo.sph_center.shape[0] > 0:
        merge(_intersect_spheres(geo, ray))
    if geo.rect_shape.shape[0] > 0:
        merge(_intersect_rects(geo, ray))
    if geo.disk_shape.shape[0] > 0:
        merge(_intersect_disks(geo, ray))
    if geo.cyl_shape.shape[0] > 0:
        merge(_intersect_cylinders(geo, ray))
    if geo.cone_shape.shape[0] > 0:
        merge(_intersect_cones(geo, ray))

    shape = jnp.where(jnp.isfinite(t), shape, -1)
    # indices stay i32 regardless of jax_enable_x64 (argmin/arange widen
    # to i64 under the double-precision variant otherwise)
    return PreliminaryIntersection(t=t, prim_uv=uv,
                                   prim_index=prim.astype(jnp.int32),
                                   shape_index=shape.astype(jnp.int32))


def ray_test(geo: Geometry, ray: Ray):
    """Occlusion query (scene.cpp ray_test): any hit within (mint, maxt)."""
    pi = ray_intersect_preliminary(geo, ray)
    return pi.is_valid


# =============================================================================
# Differentiable surface interaction (phase 2)
# =============================================================================

def compute_surface_interaction(geo: Geometry, ray: Ray,
                                pi: PreliminaryIntersection) -> SurfaceInteraction:
    """Recompute the hit differentiably, selecting per-family formulas by the
    (detached) family of the hit shape. Matches the reference's per-shape
    ``compute_surface_interaction`` (mesh.cpp, sphere.cpp, rectangle.cpp...)."""
    batch = ray.o.shape[:-1]
    valid = pi.is_valid
    shape_idx = jnp.maximum(pi.shape_index, 0)
    family = tg(geo.shape_family, shape_idx)

    # clamp the detached hit distance before ANY differentiable use: inf on
    # missed lanes would make 0-cotangent chains NaN in reverse mode
    pit = jnp.where(valid, jnp.minimum(jax.lax.stop_gradient(pi.t), INVALID_T), 0.0)
    dt = ray.o.dtype  # variant precision (f32 default, f64 double variant)
    t = jnp.where(valid, pit, INVALID_T).astype(dt)
    p = ray.at(pit)
    n = jnp.zeros(batch + (3,), dt).at[..., 2].set(1.0)
    sh_n = n
    uv = pi.prim_uv.astype(dt)
    dp_du = jnp.zeros(batch + (3,), dt).at[..., 0].set(1.0)
    dp_dv = jnp.zeros(batch + (3,), dt).at[..., 1].set(1.0)

    def sel(mask, new, old):
        if new.ndim > mask.ndim:
            mask = mask[..., None]
        return jnp.where(mask, new, old)

    if geo.faces.shape[0] > 0:
        m = (family == FAMILY_MESH) & valid
        f = tg(geo.faces, pi.prim_index)                   # (..., 3)
        v0 = tg(geo.vertices, f[..., 0])
        v1 = tg(geo.vertices, f[..., 1])
        v2 = tg(geo.vertices, f[..., 2])
        # differentiable re-intersection
        tm, u, v, _ok = moller_trumbore(ray.o, ray.d, v0, v1, v2)
        w = 1.0 - u - v
        pm = v0 * w[..., None] + v1 * u[..., None] + v2 * v[..., None]
        ng = normalize(cross(v1 - v0, v2 - v0))
        vn0 = tg(geo.normals, f[..., 0])
        vn1 = tg(geo.normals, f[..., 1])
        vn2 = tg(geo.normals, f[..., 2])
        has_vn = (jnp.sum(sqr(vn0), -1) > 1e-12)
        # double-where: normalize(0) is NaN and its VJP poisons the ray
        # cotangents even on masked lanes — feed ng where normals are absent
        vn_interp = vn0 * w[..., None] + vn1 * u[..., None] + vn2 * v[..., None]
        ns = normalize(jnp.where(has_vn[..., None], vn_interp, ng))
        ns = sel(has_vn, ns, ng)
        uv0 = tg(geo.uvs, f[..., 0])
        uv1 = tg(geo.uvs, f[..., 1])
        uv2 = tg(geo.uvs, f[..., 2])
        uvm = uv0 * w[..., None] + uv1 * u[..., None] + uv2 * v[..., None]
        t = sel(m, tm, t)
        p = sel(m, pm, p)
        n = sel(m, ng, n)
        sh_n = sel(m, ns, sh_n)
        uv = sel(m, jnp.stack([u, v], -1) * 0 + uvm, uv)
        dp_du = sel(m, v1 - v0, dp_du)
        dp_dv = sel(m, v2 - v0, dp_dv)

    if geo.n_instances > 0:
        m = (family == FAMILY_IMESH) & valid
        inst = jnp.maximum(tg(geo.shape_inst, shape_idx), 0)
        w2l = Transform(m=tg(geo.inst_w2l.m, inst),
                        inv_t=tg(geo.inst_w2l.inv_t, inst))
        l2w = Transform(m=tg(geo.inst_l2w.m, inst),
                        inv_t=tg(geo.inst_l2w.inv_t, inst))
        prim = jnp.clip(pi.prim_index, 0, geo.ig_faces.shape[0] - 1)
        f = tg(geo.ig_faces, prim)
        v0 = tg(geo.ig_vertices, f[..., 0])  # group-local space
        v1 = tg(geo.ig_vertices, f[..., 1])
        v2 = tg(geo.ig_vertices, f[..., 2])
        # differentiable re-intersection in instance space (affine map
        # preserves the ray parameter t, instance.cpp:53-77)
        o_l = w2l.transform_affine_point(ray.o)
        d_l = w2l.transform_vector(ray.d)
        tm, u, v, _ok = moller_trumbore(o_l, d_l, v0, v1, v2)
        w = 1.0 - u - v
        pm_l = v0 * w[..., None] + v1 * u[..., None] + v2 * v[..., None]
        pm = l2w.transform_affine_point(pm_l)
        ng = normalize(l2w.transform_normal(cross(v1 - v0, v2 - v0)))
        vn0 = tg(geo.ig_normals, f[..., 0])
        vn1 = tg(geo.ig_normals, f[..., 1])
        vn2 = tg(geo.ig_normals, f[..., 2])
        has_vn = (jnp.sum(sqr(vn0), -1) > 1e-12)
        vn_interp = vn0 * w[..., None] + vn1 * u[..., None] + vn2 * v[..., None]
        ns_l = jnp.where(has_vn[..., None], vn_interp,
                         cross(v1 - v0, v2 - v0))
        ns = normalize(l2w.transform_normal(
            jnp.where(jnp.sum(sqr(ns_l), -1, keepdims=True) > 1e-20,
                      ns_l, jnp.ones_like(ns_l))))
        ns = sel(has_vn, ns, ng)
        uv0 = tg(geo.ig_uvs, f[..., 0])
        uv1 = tg(geo.ig_uvs, f[..., 1])
        uv2 = tg(geo.ig_uvs, f[..., 2])
        uvm = uv0 * w[..., None] + uv1 * u[..., None] + uv2 * v[..., None]
        t = sel(m, tm, t)
        p = sel(m, pm, p)
        n = sel(m, ng, n)
        sh_n = sel(m, ns, sh_n)
        uv = sel(m, uvm, uv)
        dp_du = sel(m, l2w.transform_vector(v1 - v0), dp_du)
        dp_dv = sel(m, l2w.transform_vector(v2 - v0), dp_dv)

    if geo.sph_center.shape[0] > 0:
        m = (family == FAMILY_SPHERE) & valid
        c = tg(geo.sph_center, pi.prim_index)
        r = tg(geo.sph_radius, pi.prim_index)
        flip = tg(geo.sph_flip, pi.prim_index)
        _v, near, far = _sphere_roots(c, r, ray.o, ray.d)
        use_far = jnp.abs(pit - far) < jnp.abs(pit - near)
        ts = jnp.where(jax.lax.stop_gradient(use_far), far, near)
        ps_raw = ray.at(ts)
        # re-project onto the sphere for numerical robustness (sphere.cpp)
        ns_ = normalize(ps_raw - c)
        ps = c + ns_ * r[..., None]
        nss = jnp.where(flip[..., None], -ns_, ns_)
        theta = jnp.arccos(jnp.clip(ns_[..., 2], -1, 1))
        phi = jnp.arctan2(ns_[..., 1], ns_[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        uvs = jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], -1)
        du = jnp.stack([-ns_[..., 1], ns_[..., 0], jnp.zeros_like(theta)], -1)
        t = sel(m, ts, t)
        p = sel(m, ps, p)
        n = sel(m, nss, n)
        sh_n = sel(m, nss, sh_n)
        uv = sel(m, uvs, uv)
        dp_du = sel(m, du, dp_du)
        dp_dv = sel(m, cross(nss, du), dp_dv)

    if geo.rect_shape.shape[0] > 0:
        m = (family == FAMILY_RECT) & valid
        tw = jax.tree_util.tree_map(lambda a: tg(a, pi.prim_index), geo.rect_to_world)
        inv = tw.inverse()
        o_l = inv.transform_affine_point(ray.o)
        d_l = inv.transform_vector(ray.d)
        dz = jnp.where(jnp.abs(d_l[..., 2]) < 1e-12, 1e-12, d_l[..., 2])
        tr = -o_l[..., 2] / dz
        p_l = o_l + d_l * tr[..., None]
        pr = tw.transform_affine_point(
            jnp.concatenate([p_l[..., :2], jnp.zeros_like(p_l[..., :1])], -1))
        nr = normalize(tw.transform_normal(jnp.zeros_like(p_l).at[..., 2].set(1.0)))
        uvr = 0.5 * (p_l[..., :2] + 1.0)
        du = tw.transform_vector(jnp.zeros_like(p_l).at[..., 0].set(2.0))
        dv = tw.transform_vector(jnp.zeros_like(p_l).at[..., 1].set(2.0))
        t = sel(m, tr, t)
        p = sel(m, pr, p)
        n = sel(m, nr, n)
        sh_n = sel(m, nr, sh_n)
        uv = sel(m, uvr, uv)
        dp_du = sel(m, du, dp_du)
        dp_dv = sel(m, dv, dp_dv)

    if geo.disk_shape.shape[0] > 0:
        m = (family == FAMILY_DISK) & valid
        tw = jax.tree_util.tree_map(lambda a: tg(a, pi.prim_index), geo.disk_to_world)
        inv = tw.inverse()
        o_l = inv.transform_affine_point(ray.o)
        d_l = inv.transform_vector(ray.d)
        dz = jnp.where(jnp.abs(d_l[..., 2]) < 1e-12, 1e-12, d_l[..., 2])
        td = -o_l[..., 2] / dz
        p_l = o_l + d_l * td[..., None]
        pd = tw.transform_affine_point(
            jnp.concatenate([p_l[..., :2], jnp.zeros_like(p_l[..., :1])], -1))
        nd = normalize(tw.transform_normal(jnp.zeros_like(p_l).at[..., 2].set(1.0)))
        du = tw.transform_vector(jnp.zeros_like(p_l).at[..., 0].set(1.0))
        dv = tw.transform_vector(jnp.zeros_like(p_l).at[..., 1].set(1.0))
        t = sel(m, td, t)
        p = sel(m, pd, p)
        n = sel(m, nd, n)
        sh_n = sel(m, nd, sh_n)
        uv = sel(m, pi.prim_uv, uv)
        dp_du = sel(m, du, dp_du)
        dp_dv = sel(m, dv, dp_dv)

    if geo.cyl_shape.shape[0] > 0:
        m = (family == FAMILY_CYLINDER) & valid
        tw = jax.tree_util.tree_map(lambda a: tg(a, pi.prim_index), geo.cyl_to_world)
        inv = tw.inverse()
        tc = pit
        p_l = inv.transform_affine_point(ray.at(tc))
        n_l = jnp.concatenate([p_l[..., :2], jnp.zeros_like(p_l[..., :1])], -1)
        nc = normalize(tw.transform_normal(n_l))
        phi = jnp.arctan2(p_l[..., 1], p_l[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        L = tg(geo.cyl_length, pi.prim_index)
        uvc = jnp.stack([phi / (2 * jnp.pi), p_l[..., 2] / jnp.maximum(L, 1e-9)], -1)
        pc = ray.at(tc)
        t = sel(m, tc, t)
        p = sel(m, pc, p)
        n = sel(m, nc, n)
        sh_n = sel(m, nc, sh_n)
        uv = sel(m, uvc, uv)
        du = tw.transform_vector(jnp.stack([-jnp.sin(phi), jnp.cos(phi),
                                            jnp.zeros_like(phi)], -1))
        dp_du = sel(m, du, dp_du)
        dp_dv = sel(m, cross(nc, du), dp_dv)

    if geo.cone_shape.shape[0] > 0:
        m = (family == FAMILY_CONE) & valid
        tw = jax.tree_util.tree_map(lambda a: tg(a, pi.prim_index),
                                    geo.cone_to_world)
        inv = tw.inverse()
        tc = pit
        p_l = inv.transform_affine_point(ray.at(tc))
        r = tg(geo.cone_radius, pi.prim_index)
        L = tg(geo.cone_length, pi.prim_index)
        k = r / jnp.maximum(L, 1e-9)
        rho = safe_sqrt(sqr(p_l[..., 0]) + sqr(p_l[..., 1]))
        n_l = jnp.stack([p_l[..., 0], p_l[..., 1], k * rho], -1)
        nc_ = normalize(tw.transform_normal(n_l))
        phi = jnp.arctan2(p_l[..., 1], p_l[..., 0])
        phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
        uvk = jnp.stack([phi / (2 * jnp.pi),
                         p_l[..., 2] / jnp.maximum(L, 1e-9)], -1)
        pk = ray.at(tc)
        t = sel(m, tc, t)
        p = sel(m, pk, p)
        n = sel(m, nc_, n)
        sh_n = sel(m, nc_, sh_n)
        uv = sel(m, uvk, uv)
        du = tw.transform_vector(jnp.stack([-jnp.sin(phi), jnp.cos(phi),
                                            jnp.zeros_like(phi)], -1))
        dp_du = sel(m, du, dp_du)
        dp_dv = sel(m, cross(nc_, du), dp_dv)

    # orient the *geometric* normal to the hemisphere of -ray.d? No: the
    # reference keeps geometric normals as authored; BSDF sidedness uses
    # Frame(sh_n).  The shading frame:
    sh_frame = Frame.from_normal(sh_n)
    wi = sh_frame.to_local(-ray.d)
    si = SurfaceInteraction(
        t=t, p=p, n=n, sh_frame=sh_frame, uv=uv, prim_uv=pi.prim_uv,
        dp_du=dp_du, dp_dv=dp_dv,
        wi=wi, wavelengths=ray.wavelengths, time=ray.time,
        prim_index=pi.prim_index, shape_index=pi.shape_index)
    # pin float fields to the ray's precision: under jax_enable_x64 the
    # default-dtype intermediates above would otherwise leak f64 into f32
    # variants (and loop carries would type-mismatch)
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, si)


def ray_intersect(geo: Geometry, ray: Ray) -> SurfaceInteraction:
    pi = ray_intersect_preliminary(geo, jax.lax.stop_gradient(ray))
    pi = jax.lax.stop_gradient(pi)
    return compute_surface_interaction(geo, ray, pi)
