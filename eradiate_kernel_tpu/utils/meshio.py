"""Mesh file loaders — counterparts of src/shapes/{obj,ply,serialized}.cpp.

Host-side (off the hot path, like the reference's loaders which run once at
scene build). Pure numpy parsing; returns raw arrays for Geometry pools.
"""

from __future__ import annotations

import struct

import numpy as np


def load_obj(filename):
    """Wavefront OBJ: v / vn / vt / f (triangulated by fan). Returns
    (vertices (V,3), faces (F,3), normals (V,3)|None, uvs (V,2)|None)."""
    positions, normals_raw, uvs_raw = [], [], []
    # OBJ indexes positions/uvs/normals separately; re-index to a single
    # vertex stream keyed by the (p, t, n) triple like the reference loader
    vert_map = {}
    out_p, out_n, out_t, faces = [], [], [], []

    def vertex(token):
        if token in vert_map:
            return vert_map[token]
        parts = token.split("/")
        pi = int(parts[0])
        ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
        idx = len(out_p)
        out_p.append(positions[pi - 1 if pi > 0 else pi + len(positions)])
        out_t.append(uvs_raw[ti - 1] if ti else (0.0, 0.0))
        out_n.append(normals_raw[ni - 1] if ni else (0.0, 0.0, 0.0))
        vert_map[token] = idx
        return idx

    with open(filename) as fh:
        for line in fh:
            if line.startswith("v "):
                positions.append(tuple(map(float, line.split()[1:4])))
            elif line.startswith("vn "):
                normals_raw.append(tuple(map(float, line.split()[1:4])))
            elif line.startswith("vt "):
                uvs_raw.append(tuple(map(float, line.split()[1:3])))
            elif line.startswith("f "):
                toks = line.split()[1:]
                idx = [vertex(t) for t in toks]
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))

    verts = np.asarray(out_p, np.float32)
    faces = np.asarray(faces, np.int32)
    normals = np.asarray(out_n, np.float32)
    uvs = np.asarray(out_t, np.float32)
    if not normals_raw:
        normals = None
    if not uvs_raw:
        uvs = None
    return verts, faces, normals, uvs


def load_ply(filename):
    """Minimal PLY loader (ascii + binary_little_endian), vertex xyz + faces."""
    with open(filename, "rb") as fh:
        assert fh.readline().strip() == b"ply"
        fmt = None
        n_vert = n_face = 0
        vert_props = []
        in_vertex = False
        while True:
            line = fh.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1].decode()
            elif line.startswith(b"element vertex"):
                n_vert = int(line.split()[-1])
                in_vertex = True
            elif line.startswith(b"element face"):
                n_face = int(line.split()[-1])
                in_vertex = False
            elif line.startswith(b"property") and in_vertex:
                vert_props.append(line.split()[-1].decode())
            elif line == b"end_header":
                break

        n_props = len(vert_props)
        ix = vert_props.index("x")
        if fmt == "ascii":
            verts = np.zeros((n_vert, 3), np.float32)
            for i in range(n_vert):
                vals = list(map(float, fh.readline().split()))
                verts[i] = vals[ix:ix + 3]
            faces = []
            for _ in range(n_face):
                vals = list(map(int, fh.readline().split()))
                cnt, idx = vals[0], vals[1:]
                for k in range(1, cnt - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
            return verts, np.asarray(faces, np.int32)
        elif fmt == "binary_little_endian":
            data = np.frombuffer(fh.read(n_vert * n_props * 4), "<f4")
            verts = data.reshape(n_vert, n_props)[:, ix:ix + 3].astype(np.float32)
            faces = []
            raw = fh.read()
            off = 0
            for _ in range(n_face):
                cnt = raw[off]
                off += 1
                idx = struct.unpack_from(f"<{cnt}i", raw, off)
                off += 4 * cnt
                for k in range(1, cnt - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
            return verts, np.asarray(faces, np.int32)
        raise ValueError(f"unsupported ply format {fmt}")


def write_ply(filename, vertices, faces):
    with open(filename, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(vertices)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(faces)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for v in vertices:
            fh.write(f"{v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"3 {f[0]} {f[1]} {f[2]}\n")


def load_serialized(path, shape_index=0):
    """Mitsuba .serialized mesh loader (reference: src/shapes/serialized.cpp).

    Format: uint16 magic 0x041C, uint16 version, zlib-compressed stream of
    [uint32 flags, name (v>=3, cstring), uint64 n_verts, uint64 n_faces,
     positions, normals?, texcoords?, colors?, faces]; a footer holds
    uint64 offsets per sub-mesh + uint32 count. Returns
    (verts, faces, normals|None, uvs|None).
    """
    import struct
    import zlib

    import numpy as np

    HAS_NORMALS = 0x0001
    HAS_TEXCOORDS = 0x0002
    HAS_COLORS = 0x0008
    SINGLE_PRECISION = 0x1000
    DOUBLE_PRECISION = 0x2000

    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<HH", data, 0)
    assert magic == 0x041C, f"not a .serialized file: magic {magic:#x}"
    # footer: [uint64 offsets...] uint32 mesh_count
    (count,) = struct.unpack_from("<I", data, len(data) - 4)
    offsets = struct.unpack_from(
        "<" + "Q" * count, data, len(data) - 4 - 8 * count)
    assert 0 <= shape_index < count, (shape_index, count)
    start = offsets[shape_index] + 4  # skip per-mesh magic+version
    raw = zlib.decompress(data[start:])

    pos = 0
    (flags,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    if version >= 3:  # null-terminated utf-8 name
        end = raw.index(b"\x00", pos)
        pos = end + 1
    n_verts, n_faces = struct.unpack_from("<QQ", raw, pos)
    pos += 16
    dt = np.float64 if flags & DOUBLE_PRECISION else np.float32
    isize = np.dtype(dt).itemsize

    def take(n):
        nonlocal pos
        out = np.frombuffer(raw, dt, n, pos)
        pos += n * isize
        return out.astype(np.float32)

    verts = take(3 * n_verts).reshape(-1, 3)
    normals = take(3 * n_verts).reshape(-1, 3) if flags & HAS_NORMALS else None
    uvs = take(2 * n_verts).reshape(-1, 2) if flags & HAS_TEXCOORDS else None
    if flags & HAS_COLORS:
        take(3 * n_verts)
    faces = np.frombuffer(raw, np.uint32, 3 * n_faces, pos) \
        .astype(np.int32).reshape(-1, 3)
    return verts, faces, normals, uvs
