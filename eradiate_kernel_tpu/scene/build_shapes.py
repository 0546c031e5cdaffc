"""Shape construction (meshes, analytics, two-level instancing) — split out of scene/build.py (kept import-compatible via
re-exports there)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import spectrum as sp
from ..core.transform import Transform, as_transform
from ..render.geometry import FAMILY_IMESH
from .build_emitters import _build_bsdf, _build_emitter_for_shape

_SHAPE_TYPES = ("rectangle", "disk", "sphere", "cylinder", "cone", "cube",
                "mesh", "obj", "ply", "serialized", "instance")

_CUBE_V = np.array(
    [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
     [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32)
_CUBE_F = np.array(
    [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],   # -z, +z
     [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],   # -y, +y
     [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int32)  # +x, -x


_GROUP_MESH_TYPES = ("mesh", "cube", "obj", "ply", "serialized")


def _load_mesh_arrays(d):
    """(verts, faces, normals, uvs) for a mesh-typed dict in its own frame
    (the child's to_world applied to the vertices). None for non-meshes."""
    t = d["type"]
    tw = as_transform(d.get("to_world"))
    m = np.asarray(tw.m)

    def xf(verts, normals=None):
        verts = np.asarray(verts, np.float32) @ m[:3, :3].T + m[:3, 3]
        if normals is not None:
            inv_t = np.linalg.inv(m[:3, :3]).T
            normals = np.asarray(normals, np.float32) @ inv_t.T
        return verts.astype(np.float32), normals

    if t == "cube":
        v, _ = xf(_CUBE_V)
        return v, _CUBE_F.copy(), None, None
    if t == "mesh":
        v, n = xf(d["vertices"], d.get("normals"))
        return v, np.asarray(d["faces"], np.int32), n, d.get("uvs")
    if t == "obj":
        from ..utils.meshio import load_obj

        verts, faces, normals, uvs = load_obj(d["filename"])
        v, n = xf(verts, normals)
        return v, faces, n, uvs
    if t == "ply":
        from ..utils.meshio import load_ply

        verts, faces = load_ply(d["filename"])
        v, _ = xf(verts)
        return v, faces, None, None
    if t == "serialized":
        from ..utils.meshio import load_serialized

        verts, faces, normals, uvs = load_serialized(
            d["filename"], int(d.get("shape_index", 0)))
        v, n = xf(verts, normals)
        return v, faces, n, uvs
    return None


def _build_group_geom(builder: SceneBuilder, key, children):
    """Load a shapegroup's mesh children ONCE into the shared group-local
    pools (shapegroup.h:6-62: a sub-accel per group). Non-mesh children are
    returned for per-instance flattening (analytic shapes carry their
    transform in their parameterization, so sharing buys nothing there).
    Emitters/media on group children are rejected like the reference
    (shapegroup.cpp refuses emitter children)."""
    if key in builder.group_records:
        return builder.group_records[key]
    mesh_children = [c for c in children if c["type"] in _GROUP_MESH_TYPES]
    other = [c for c in children if c["type"] not in _GROUP_MESH_TYPES]
    f_off = sum(len(f) for f in builder.ig_faces)
    subs = []
    lo = np.full(3, np.inf, np.float32)
    hi = np.full(3, -np.inf, np.float32)
    for sub_ord, c in enumerate(mesh_children):
        for bad in ("emitter", "interior", "exterior"):
            assert bad not in c, \
                f"shapegroup children cannot carry {bad!r} (shapegroup.cpp)"
        assert "attributes" not in c, \
            "per-vertex attributes on shapegroup children are not " \
            "supported (mesh_attribute textures index the top-level pool)"
        verts, faces, normals, uvs = _load_mesh_arrays(c)
        v_off = sum(len(v) for v in builder.ig_vertices)
        builder.ig_vertices.append(verts)
        builder.ig_normals.append(
            np.zeros_like(verts) if normals is None
            else np.asarray(normals, np.float32))
        builder.ig_uvs.append(
            np.zeros((len(verts), 2), np.float32) if uvs is None
            else np.asarray(uvs, np.float32))
        builder.ig_faces.append(np.asarray(faces, np.int32) + v_off)
        builder.ig_face_sub.append(np.full(len(faces), sub_ord, np.int32))
        e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
        e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
        area = float(0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum())
        subs.append({"bsdf": c.get("bsdf"), "area": area})
        lo = np.minimum(lo, verts.min(0))
        hi = np.maximum(hi, verts.max(0))
    rec = dict(f_off=f_off,
               f_count=sum(len(f) for f in builder.ig_faces) - f_off,
               subs=subs, lo=lo, hi=hi, flatten=other)
    builder.group_records[key] = rec
    return rec


def _build_shape(builder: SceneBuilder, d):
    t = d["type"]
    tw = as_transform(d.get("to_world"))
    if t == "instance":
        # two-level instancing (shapegroup.h:6-62, shapes/instance.cpp:53-77):
        # mesh children live ONCE in group-local pools; the instance is a
        # (transform, face-range, shape-base) record traversed by
        # render/geometry._intersect_instanced. Analytic children are
        # flattened per instance (their transforms compose for free).
        ref = d.get("shapegroup")
        if isinstance(ref, dict) and ref.get("type") == "ref":
            kind, children = builder.named[ref["id"]]
            assert kind == "shapegroup"
            group_key = ref["id"]
        else:
            children = [v for v in d.values()
                        if isinstance(v, dict) and v.get("type") in
                        _SHAPE_TYPES and v.get("type") != "instance"]
            group_key = ("anon", id(d.get("shapegroup")) if ref else
                         tuple(sorted(str(c) for c in children)))
        rec = _build_group_geom(builder, group_key, children)

        idx = -1
        for child in rec["flatten"]:
            child = dict(child)
            child_tw = as_transform(child.get("to_world"))
            child["to_world"] = tw @ child_tw
            idx = _build_shape(builder, child)

        if rec["f_count"] > 0:
            inst_id = len(builder.instances)
            m = np.asarray(tw.m)
            # surface-area scale under the linear map (exact for uniform
            # scale; instanced shapes cannot be emitters, so the area only
            # feeds diagnostics)
            ascale = abs(np.linalg.det(m[:3, :3])) ** (2.0 / 3.0)
            shape_base = None
            for sub in rec["subs"]:
                sidx = builder._new_shape(FAMILY_IMESH, inst_id,
                                          sub["area"] * ascale)
                bsdf_d = sub["bsdf"] or {"type": "diffuse"}
                builder.shape_rows[sidx]["bsdf"] = _build_bsdf(builder,
                                                               bsdf_d)
                if shape_base is None:
                    shape_base = sidx
            # world AABB: transform the 8 local corners
            corners = np.stack(np.meshgrid(*zip(rec["lo"], rec["hi"]),
                                           indexing="ij"), -1).reshape(-1, 3)
            wc = corners @ m[:3, :3].T + m[:3, 3]
            builder.instances.append(dict(
                l2w=tw, w2l=tw.inverse(), f_off=rec["f_off"],
                f_count=rec["f_count"], shape_base=shape_base,
                lo=wc.min(0).astype(np.float32),
                hi=wc.max(0).astype(np.float32)))
            idx = shape_base
        return idx
    if t == "rectangle":
        idx = builder.add_rectangle(tw)
    elif t == "disk":
        idx = builder.add_disk(tw)
    elif t == "sphere":
        # apply to_world to the analytic parameterization (sphere.cpp:88-99:
        # uniform scale extracted from the transform)
        m = np.asarray(tw.m)
        center = m[:3, :3] @ np.asarray(d.get("center", [0, 0, 0]),
                                        np.float32) + m[:3, 3]
        scale = float(np.cbrt(abs(np.linalg.det(m[:3, :3]))))
        idx = builder.add_sphere(center, float(d.get("radius", 1.0)) * scale,
                                 d.get("flip_normals", False))
    elif t == "cylinder":
        idx = builder.add_cylinder(tw, d.get("length", 1.0), d.get("radius", 1.0))
    elif t == "cone":
        idx = builder.add_cone(tw, d.get("length", 1.0), d.get("radius", 1.0))
    elif t == "cube":
        m = np.asarray(tw.m)
        verts = _CUBE_V @ m[:3, :3].T + m[:3, 3]
        idx = builder.add_mesh(verts, _CUBE_F)
    elif t == "mesh":
        verts = np.asarray(d["vertices"], np.float32)
        normals = d.get("normals")
        if "to_world" in d:
            m = np.asarray(tw.m)
            verts = verts @ m[:3, :3].T + m[:3, 3]
            if normals is not None:
                inv_t = np.linalg.inv(m[:3, :3]).T
                normals = np.asarray(normals, np.float32) @ inv_t.T
        idx = builder.add_mesh(verts, d["faces"],
                               normals, d.get("uvs"),
                               d.get("attributes"))
    elif t == "obj":
        from ..utils.meshio import load_obj

        verts, faces, normals, uvs = load_obj(d["filename"])
        m = np.asarray(tw.m)
        verts = verts @ m[:3, :3].T + m[:3, 3]
        if normals is not None:
            inv_t = np.linalg.inv(m[:3, :3]).T
            normals = normals @ inv_t.T
        idx = builder.add_mesh(verts, faces, normals, uvs)
    elif t == "ply":
        from ..utils.meshio import load_ply

        verts, faces = load_ply(d["filename"])
        m = np.asarray(tw.m)
        verts = verts @ m[:3, :3].T + m[:3, 3]
        idx = builder.add_mesh(verts, faces)
    elif t == "serialized":
        from ..utils.meshio import load_serialized

        verts, faces, normals, uvs = load_serialized(
            d["filename"], int(d.get("shape_index", 0)))
        m = np.asarray(tw.m)
        verts = verts @ m[:3, :3].T + m[:3, 3]
        if normals is not None:
            inv_t = np.linalg.inv(m[:3, :3]).T
            normals = normals @ inv_t.T
        idx = builder.add_mesh(verts, faces, normals, uvs)
    else:
        raise ValueError(f"unknown shape type {t!r}")

    row = builder.shape_rows[idx]
    bsdf_d = d.get("bsdf")
    if bsdf_d is None:
        # shapes bounding a medium default to a null (passthrough) BSDF
        bsdf_d = {"type": "null"} if ("interior" in d or "exterior" in d) \
            else {"type": "diffuse"}
    row["bsdf"] = _build_bsdf(builder, bsdf_d)
    if "emitter" in d:
        row["emitter"] = _build_emitter_for_shape(builder, d["emitter"], idx)
    if "interior" in d:
        row["interior"] = builder.medium(d["interior"])
    if "exterior" in d:
        row["exterior"] = builder.medium(d["exterior"])
    return idx


