"""Binned-SAH BVH over triangle tiles (host-side builder).

The reference accelerates meshes with a 2.4k-LoC SAH kd-tree
(include/mitsuba/render/kdtree.h:676,1027-1039,2068-2301) or Embree/OptiX
BVHs. The TPU-native equivalent keeps the K=128 Morton-ordered triangle
tiles from ops/accel.py as *leaves* (each leaf is one dense (rays x 128)
Moller-Trumbore batch — ideal VPU work) and builds a binary BVH over the
tile AABBs so the Pallas kernel visits O(log T + hit tiles) nodes per ray
block instead of sweeping all T tiles.

Build runs on host at scene-build time (off the hot path, like the
reference's kd-tree build). Binned SAH (16 bins, largest centroid axis,
kdtree.h min-max binning analog) with a median-split fallback; leaf = one
tile. Depth is capped (cf. MTS_KD_MAXDEPTH=48, kdtree.h:21) by forcing
median splits near the cap so the traversal stack is statically bounded.

Flattened layout consumed by ops/pallas_intersect.intersect_bvh:
  nbox  (N, 1, 8) f32 : [lo.x, lo.y, lo.z, hi.x, hi.y, hi.z, 0, 0] (VMEM)
  nmeta (N, 4)   i32 : [left, right, tile, 0]; tile >= 0 marks a leaf,
                       in which case left/right are 0 (safe to read).
Root is node 0. N = 2*T - 1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

MAX_DEPTH = 48      # traversal stack bound (stack size 64 in the kernel)
N_BINS = 16

_lib = None
_lib_tried = False


def _load_builder():
    """Compile + load csrc/bvh_builder.cpp (same on-demand scheme as
    ops/accel.py's tile builder). Returns None when unavailable — the
    NumPy implementation below is the fallback and the equivalence
    oracle (tests assert bit-identical outputs)."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                       "..", "csrc", "bvh_builder.cpp"))
    if not os.path.exists(src) or os.environ.get("ERT_NO_NATIVE"):
        return None
    from ..utils.native_cache import native_cache_dir
    cache_dir = native_cache_dir()
    so_path = os.path.join(cache_dir, "bvh_builder.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.build_tile_bvh.restype = ctypes.c_int
        lib.build_tile_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def build_tile_bvh(tile_lo: np.ndarray, tile_hi: np.ndarray,
                   leaf_tile: np.ndarray | None = None,
                   leaf_inst: np.ndarray | None = None):
    """Build the flattened BVH. tile_lo/hi: (T, 3) leaf AABBs.

    leaf_tile/leaf_inst: optional per-leaf payloads — leaf i stores
    (leaf_tile[i], leaf_inst[i]) in nmeta[:, 2:4] instead of (i, -1).
    Instanced leaves (shapegroup.h two-level accel) reuse one group tile
    under many instances: same tile id, different instance id, AABBs
    already world-transformed by the caller.

    Dispatches to the native builder (csrc/bvh_builder.cpp) when a
    compiler is available; the NumPy path below is the fallback and the
    bit-exactness oracle.

    Returns (nbox (N,1,8) f32, nmeta (N,4) i32, max_depth int).
    """
    T = len(tile_lo)
    assert T >= 1
    lib = _load_builder()
    if lib is not None:
        lo = np.ascontiguousarray(tile_lo, np.float32)
        hi = np.ascontiguousarray(tile_hi, np.float32)
        lt = np.ascontiguousarray(
            leaf_tile if leaf_tile is not None
            else np.arange(T, dtype=np.int32), np.int32)
        li = np.ascontiguousarray(
            leaf_inst if leaf_inst is not None
            else np.full(T, -1, np.int32), np.int32)
        N = 2 * T - 1
        nbox = np.empty((N, 8), np.float32)
        nmeta = np.empty((N, 4), np.int32)
        depth = lib.build_tile_bvh(
            lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            li.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            T,
            nbox.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nmeta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if depth > 0:
            return nbox.reshape(N, 1, 8), nmeta, depth
        # fall through to NumPy on a builder error
    return _build_tile_bvh_numpy(tile_lo, tile_hi, leaf_tile, leaf_inst)


def _build_tile_bvh_numpy(tile_lo, tile_hi, leaf_tile=None, leaf_inst=None):
    """NumPy twin of csrc/bvh_builder.cpp (bit-identical outputs; the
    fallback when no compiler is available and the test oracle)."""
    T = len(tile_lo)
    if leaf_tile is None:
        leaf_tile = np.arange(T, dtype=np.int32)
    if leaf_inst is None:
        leaf_inst = np.full(T, -1, np.int32)
    cent = 0.5 * (tile_lo + tile_hi)
    N = 2 * T - 1
    nbox = np.zeros((N, 8), np.float32)
    nmeta = np.zeros((N, 4), np.int32)
    next_node = [0]
    max_depth_seen = [0]

    # iterative build: work stack of (node_id, tile_index_array, depth)
    root = next_node[0]
    next_node[0] += 1
    work = [(root, np.arange(T), 0)]
    while work:
        node, ids, depth = work.pop()
        max_depth_seen[0] = max(max_depth_seen[0], depth)
        lo = tile_lo[ids].min(0)
        hi = tile_hi[ids].max(0)
        nbox[node, 0:3] = lo
        nbox[node, 3:6] = hi
        if len(ids) == 1:
            nmeta[node] = (0, 0, leaf_tile[ids[0]],
                           leaf_inst[ids[0]])
            continue
        order, split = _choose_split(tile_lo[ids], tile_hi[ids], cent[ids],
                                     force_median=depth >= MAX_DEPTH - 2)
        left_ids = ids[order[:split]]
        right_ids = ids[order[split:]]
        li = next_node[0]
        ri = next_node[0] + 1
        next_node[0] += 2
        nmeta[node] = (li, ri, -1, -1)
        work.append((li, left_ids, depth + 1))
        work.append((ri, right_ids, depth + 1))

    assert next_node[0] == N
    return nbox.reshape(N, 1, 8), nmeta, max_depth_seen[0] + 1


def _choose_split(lo, hi, cent, force_median=False):
    """Pick (ordering, split point) for one node's tiles by binned SAH over
    the largest centroid-extent axis; median fallback when SAH degenerates."""
    n = len(lo)
    c_lo = cent.min(0)
    c_ext = cent.max(0) - c_lo
    axis = int(np.argmax(c_ext))
    order = np.argsort(cent[:, axis], kind="stable")
    if force_median or c_ext[axis] <= 0 or n <= 4:
        return order, n // 2

    # binned SAH on the sorted order: prefix/suffix AABB areas
    slo, shi = lo[order], hi[order]
    pre_lo = np.minimum.accumulate(slo, axis=0)
    pre_hi = np.maximum.accumulate(shi, axis=0)
    suf_lo = np.minimum.accumulate(slo[::-1], axis=0)[::-1]
    suf_hi = np.maximum.accumulate(shi[::-1], axis=0)[::-1]

    def area(l, h):
        d = np.maximum(h - l, 0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

    ks = np.arange(1, n)
    if n > N_BINS:  # evaluate only ~N_BINS candidate splits
        ks = np.unique(np.linspace(1, n - 1, N_BINS).astype(np.int64))
    cost = (ks * area(pre_lo[ks - 1], pre_hi[ks - 1])
            + (n - ks) * area(suf_lo[ks], suf_hi[ks]))
    split = int(ks[np.argmin(cost)])
    return order, split


# =============================================================================
# BVH8: 8-wide nodes for the vectorized traversal kernel (round 5)
# =============================================================================

def collapse_to_bvh8(nbox, nmeta):
    """Collapse the binary tile BVH into 8-wide nodes.

    The binary kernel's per-node cost is dominated by SCALAR work (SMEM
    stack ops, per-field metadata reductions) around a (1, B) slab test
    that uses one sublane of the 8x128 VPU. An 8-wide node tests all 8
    children in the SAME number of vector instructions ((8, B) operands,
    children on the sublane axis) and amortizes the scalar node overhead
    8x (cf. kdtree.h:2068-2301 per-ray traversal; Ylitie et al. 2017
    wide-BVH collapse, re-derived for the block-traversal model).

    Collapse: starting from the binary root, repeatedly expand the
    largest-surface-area inner member of the child set until 8 slots are
    used or only leaves remain; inner members become child BVH8 nodes.

    Returns (cbox (N8, 8, 8) f32, cmeta (N8, 8, 4) i32):
      cbox[n, j] = [lo.xyz, hi.xyz, 0, 0] of child j (empty slots get an
                   inverted box that can never be hit)
      cmeta[n, j] = [child_node, tile, inst, 0]; child_node >= 0 marks an
                    inner child, else tile >= 0 marks a leaf; both -1 =
                    empty slot.
    """
    nbox = np.asarray(nbox).reshape(-1, 8)
    nmeta = np.asarray(nmeta)

    def area(b):
        d = np.maximum(b[3:6] - b[0:3], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    out_box = []
    out_meta = []
    # queue of (bvh8 node id, binary node id)
    out_box.append(np.zeros((8, 8), np.float32))
    out_meta.append(np.full((8, 4), -1, np.int32))
    work = [(0, 0)]
    while work:
        nid, b_root = work.pop()
        # grow the member set: expand largest-area inner node
        members = [b_root]
        while len(members) < 8:
            best, best_a = -1, -1.0
            for i, m in enumerate(members):
                if nmeta[m, 2] < 0:  # inner
                    a = area(nbox[m])
                    if a > best_a:
                        best, best_a = i, a
            if best < 0:
                break
            m = members.pop(best)
            members.append(int(nmeta[m, 0]))
            members.append(int(nmeta[m, 1]))
        box = np.zeros((8, 8), np.float32)
        box[:, 0:3] = 1e30   # inverted: empty slots never hit
        box[:, 3:6] = -1e30
        meta = np.full((8, 4), -1, np.int32)
        for j, m in enumerate(members):
            box[j, 0:6] = nbox[m, 0:6]
            if nmeta[m, 2] >= 0:  # binary leaf
                meta[j, 1] = nmeta[m, 2]
                meta[j, 2] = nmeta[m, 3]
            else:
                child_id = len(out_box)
                out_box.append(np.zeros((8, 8), np.float32))
                out_meta.append(np.full((8, 4), -1, np.int32))
                meta[j, 0] = child_id
                work.append((child_id, m))
        out_box[nid] = box
        out_meta[nid] = meta
    return (np.stack(out_box).astype(np.float32),
            np.stack(out_meta).astype(np.int32))
