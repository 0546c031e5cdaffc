"""Triangle-tile acceleration structure.

The reference accelerates `ray_intersect` with pointer-tree structures and
divergent per-ray traversal (native kd-tree kdtree.h:2068-2301, Embree BVH,
OptiX). A stack-based divergent walk maps poorly onto the TPU's 8x128 VPU;
the TPU-native design is a *ray-stream tiled sweep*:

  - triangles are Morton-sorted and grouped into tiles of K=128 spatially
    coherent triangles with conservative AABBs (native C++ builder,
    csrc/tile_builder.cpp — the analog of the reference's native builders);
  - the Pallas kernel sweeps all tiles over a block of rays; a whole tile's
    triangle tests are skipped with one scalar `lax.cond` when no ray in the
    block enters the tile AABB (ray blocks follow film Morton order, so
    coherent primary/shadow rays cull most tiles);
  - non-culled tiles are intersected as a dense (B rays x K tris)
    Moller-Trumbore batch — pure VPU work at full utilization.

Build is host-side (off the hot path); the builder .so is compiled from
csrc/ on first use and falls back to a NumPy implementation when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

TILE_K = 128  # triangles per tile = TPU lane width

_lib = None
_lib_tried = False


def _load_builder():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                       "tile_builder.cpp")
    src = os.path.abspath(src)
    if not os.path.exists(src):
        return None
    from ..utils.native_cache import native_cache_dir
    cache_dir = native_cache_dir()
    so_path = os.path.join(cache_dir, "tile_builder.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.build_tri_tiles.restype = ctypes.c_int
        lib.build_tri_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _expand_bits(v):
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def _build_tiles_numpy(vertices, faces, tile_size):
    """NumPy fallback of csrc/tile_builder.cpp (same algorithm)."""
    tri = vertices[faces]                      # (F, 3, 3)
    centroid = tri.mean(axis=1)
    lo = centroid.min(0)
    ext = np.maximum(centroid.max(0) - lo, 1e-20)
    q = np.clip(((centroid - lo) / ext * 1024), 0, 1023).astype(np.uint64)
    code = ((_expand_bits(q[:, 0]) << 2) | (_expand_bits(q[:, 1]) << 1)
            | _expand_bits(q[:, 2]))
    order = np.argsort(code, kind="stable").astype(np.int32)
    F = len(faces)
    T = -(-F // tile_size)
    perm = np.full(T * tile_size, -1, np.int32)
    perm[:F] = order
    tile_lo = np.full((T, 3), 1e30, np.float32)
    tile_hi = np.full((T, 3), -1e30, np.float32)
    for t in range(T):
        ids = perm[t * tile_size:(t + 1) * tile_size]
        ids = ids[ids >= 0]
        pts = tri[ids].reshape(-1, 3)
        tile_lo[t] = pts.min(0)
        tile_hi[t] = pts.max(0)
    return perm, tile_lo, tile_hi


def build_tri_tiles(vertices, faces, tile_size=TILE_K):
    """(perm (T*K,), tile_lo (T,3), tile_hi (T,3)) — native or NumPy."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lib = _load_builder()
    if lib is None:
        return _build_tiles_numpy(vertices, faces, tile_size)
    F = len(faces)
    T = -(-F // tile_size)
    perm = np.empty(T * tile_size, np.int32)
    tile_lo = np.empty((T, 3), np.float32)
    tile_hi = np.empty((T, 3), np.float32)
    lib.build_tri_tiles(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(vertices),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), F,
        tile_size,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tile_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tile_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return perm, tile_lo, tile_hi


def pack_tiles(vertices, normals_unused, faces, face_shape,
               tile_size=TILE_K):
    """Build the device-side tile arrays consumed by the intersector.

    Returns a dict of numpy arrays:
      v0/e1/e2:   (T, K, 3) pre-gathered triangle data (gather-free kernel)
      prim:       (T, K) i32 original face index (-1 = padding)
      shape:      (T, K) i32 shape index of each triangle
      lo/hi:      (T, 3) tile AABBs
    """
    perm, tile_lo, tile_hi = build_tri_tiles(vertices, faces, tile_size)
    T = len(tile_lo)
    safe = np.maximum(perm, 0)
    f = faces[safe]                       # (T*K, 3)
    v0 = vertices[f[:, 0]]
    v1 = vertices[f[:, 1]]
    v2 = vertices[f[:, 2]]
    pad = perm < 0
    # park padding triangles at a far-away degenerate point
    v0[pad] = 1e30
    v1[pad] = 1e30
    v2[pad] = 1e30
    shape = face_shape[safe].astype(np.int32)
    shape[pad] = -1
    return {
        "v0": v0.reshape(T, tile_size, 3).astype(np.float32),
        "e1": (v1 - v0).reshape(T, tile_size, 3).astype(np.float32),
        "e2": (v2 - v0).reshape(T, tile_size, 3).astype(np.float32),
        "prim": perm.reshape(T, tile_size),
        "shape": shape.reshape(T, tile_size),
        "lo": tile_lo,
        "hi": tile_hi,
    }
