"""Acceleration-structure tests: native tile builder properties and the
Pallas tile intersector vs the brute-force oracle (the kd-tree-vs-naive
cross-validation analog, librender/tests/test_kdtrees.py:26-101)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from eradiate_kernel_tpu.ops import accel


def soup(F=500, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (F, 3))
    verts = (centers[:, None, :]
             + rng.uniform(-0.15, 0.15, (F, 3, 3))).reshape(-1, 3)
    faces = np.arange(3 * F, dtype=np.int32).reshape(F, 3)
    return verts.astype(np.float32), faces


def test_builder_partition_and_bounds():
    verts, faces = soup()
    tiles = accel.pack_tiles(verts, None, faces, np.zeros(len(faces), np.int32))
    T, K, _ = tiles["v0"].shape
    prim = tiles["prim"].ravel()
    real = prim[prim >= 0]
    # every face appears exactly once
    assert sorted(real.tolist()) == list(range(len(faces)))
    # tile AABBs contain their triangles
    for t in range(T):
        ids = tiles["prim"][t]
        ok = ids >= 0
        tri = verts[faces[ids[ok]]].reshape(-1, 3)
        assert (tri >= tiles["lo"][t] - 1e-4).all()
        assert (tri <= tiles["hi"][t] + 1e-4).all()


def test_numpy_fallback_agrees_with_native():
    verts, faces = soup(300, seed=3)
    a = accel._build_tiles_numpy(verts, faces, 128)
    if accel._load_builder() is None:
        pytest.skip("no native builder in this environment")
    b = accel.build_tri_tiles(verts, faces, 128)
    # same partition structure (both morton-stable-sort based)
    assert a[0].shape == b[0].shape
    assert np.allclose(a[1], b[1], atol=1e-5)
    assert np.allclose(a[2], b[2], atol=1e-5)


def test_kernel_matches_bruteforce():
    from eradiate_kernel_tpu.core.ray import Ray
    from eradiate_kernel_tpu.ops.pallas_intersect import intersect_tiles
    from eradiate_kernel_tpu.render.geometry import moller_trumbore

    verts, faces = soup(400, seed=1)
    tiles_np = accel.pack_tiles(verts, None, faces,
                                np.zeros(len(faces), np.int32))
    tiles = {k: jnp.asarray(v) for k, v in tiles_np.items()}

    rng = np.random.default_rng(2)
    N = 600
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    target = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray.make(jnp.asarray(o), jnp.asarray(d),
                   wavelengths=jnp.zeros((N, 0)))

    t, uv, prim, shape = intersect_tiles(tiles, ray, interpret=True)

    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    tt, _, _, ok = moller_trumbore(
        jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    tt = np.asarray(jnp.where(ok & (tt >= 0), tt, jnp.inf))
    ref_t = tt.min(axis=1)

    t = np.asarray(t)
    assert (np.isinf(t) == np.isinf(ref_t)).all()
    both = ~np.isinf(t)
    assert both.sum() > N // 3  # rays were aimed: plenty of hits
    assert np.allclose(t[both], ref_t[both], rtol=1e-4, atol=1e-5)
    assert (np.asarray(prim)[both] == tt.argmin(axis=1)[both]).mean() > 0.999


def test_bvh_builder_invariants():
    from eradiate_kernel_tpu.ops.bvh import MAX_DEPTH, build_tile_bvh

    verts, faces = soup(2000, seed=7)
    tiles = accel.pack_tiles(verts, None, faces, np.zeros(len(faces), np.int32))
    T = tiles["lo"].shape[0]
    nbox, nmeta, depth = build_tile_bvh(tiles["lo"], tiles["hi"])
    assert nbox.shape == (2 * T - 1, 1, 8)
    assert depth <= MAX_DEPTH + 1

    # every tile appears in exactly one leaf; node boxes contain children
    leaves = sorted(int(m[2]) for m in nmeta if m[2] >= 0)
    assert leaves == list(range(T))
    box = nbox[:, 0, :]
    for i, (l, r, tile, _) in enumerate(nmeta):
        if tile >= 0:
            assert (box[i, 0:3] <= tiles["lo"][tile] + 1e-5).all()
            assert (box[i, 3:6] >= tiles["hi"][tile] - 1e-5).all()
        else:
            for c in (l, r):
                assert c > i  # topological order: children after parents
                assert (box[i, 0:3] <= box[c, 0:3] + 1e-5).all()
                assert (box[i, 3:6] >= box[c, 3:6] - 1e-5).all()


def test_native_bvh_builder_bitexact():
    """csrc/bvh_builder.cpp must reproduce the NumPy builder EXACTLY
    (same stable sort, SAH candidate set, cost arithmetic, node
    numbering) — the native path is a pure speedup, never a semantic
    fork."""
    from eradiate_kernel_tpu.ops import bvh

    if bvh._load_builder() is None:
        pytest.skip("no native builder (g++ unavailable)")

    for seed, F in ((7, 2000), (1, 130), (3, 40000)):
        verts, faces = soup(F, seed=seed)
        tiles = accel.pack_tiles(verts, None, faces,
                                 np.zeros(len(faces), np.int32))
        T = tiles["lo"].shape[0]
        rng = np.random.default_rng(seed)
        lt = rng.permutation(T).astype(np.int32)
        li = rng.integers(-1, 5, T).astype(np.int32)
        nbox_n, nmeta_n, depth_n = bvh.build_tile_bvh(
            tiles["lo"], tiles["hi"], lt, li)
        nbox_p, nmeta_p, depth_p = bvh._build_tile_bvh_numpy(
            tiles["lo"], tiles["hi"], lt, li)
        assert depth_n == depth_p
        assert np.array_equal(nmeta_n, nmeta_p)
        assert np.array_equal(nbox_n, nbox_p)


def _bvh_tiles(verts, faces):
    from eradiate_kernel_tpu.ops.bvh import build_tile_bvh, collapse_to_bvh8

    tiles_np = accel.pack_tiles(verts, None, faces,
                                np.zeros(len(faces), np.int32))
    nbox, nmeta, _ = build_tile_bvh(tiles_np["lo"], tiles_np["hi"])
    cbox, cmeta = collapse_to_bvh8(nbox, nmeta)
    tiles = {k: jnp.asarray(v) for k, v in tiles_np.items()}
    tiles["nbox"] = jnp.asarray(nbox)
    tiles["nmeta"] = jnp.asarray(nmeta)
    tiles["cbox"] = jnp.asarray(cbox)
    tiles["cmeta"] = jnp.asarray(cmeta)
    return tiles


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("nfaces", [100, 1500])
def test_bvh_kernel_matches_bruteforce(nfaces, wide):
    from eradiate_kernel_tpu.core.ray import Ray
    from eradiate_kernel_tpu.ops.pallas_intersect import (intersect_bvh,
                                                          intersect_bvh8)
    from eradiate_kernel_tpu.render.geometry import moller_trumbore

    verts, faces = soup(nfaces, seed=1)
    tiles = _bvh_tiles(verts, faces)

    rng = np.random.default_rng(2)
    N = 600
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    target = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # exercise axis-aligned directions (degenerate slab axes) and finite maxt
    d[:32] = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 32)] \
        * rng.choice([-1.0, 1.0], 32)[:, None]
    maxt = np.full(N, np.inf, np.float32)
    maxt[300:] = rng.uniform(0.5, 6.0, N - 300).astype(np.float32)
    ray = Ray.make(jnp.asarray(o), jnp.asarray(d),
                   wavelengths=jnp.zeros((N, 0)), maxt=jnp.asarray(maxt))

    fn = intersect_bvh8 if wide else intersect_bvh
    t, uv, prim, shape = fn(tiles, ray, interpret=True)

    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    tt, _, _, ok = moller_trumbore(
        jnp.asarray(o)[:, None, :], jnp.asarray(d)[:, None, :],
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    tt = np.asarray(jnp.where(ok & (tt >= 0) & (tt < maxt[:, None]),
                              tt, jnp.inf))
    ref_t = tt.min(axis=1)

    t = np.asarray(t)
    assert (np.isinf(t) == np.isinf(ref_t)).all()
    both = ~np.isinf(t)
    assert both.sum() > N // 12
    assert np.allclose(t[both], ref_t[both], rtol=1e-4, atol=1e-5)
    assert (np.asarray(prim)[both] == tt.argmin(axis=1)[both]).mean() > 0.999


def test_render_with_bvh_matches_naive():
    """Full cbox render through the BVH path (interpret mode) vs brute
    force — same closest-hit results end to end."""
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    scene = load_dict(cornell_box(width=8, height=8, spp=4, max_depth=3))
    os.environ["ERT_ACCEL"] = "naive"
    try:
        ref = np.asarray(integrators.render(scene, seed=5))
    finally:
        os.environ.pop("ERT_ACCEL", None)
    os.environ["ERT_ACCEL"] = "bvh"
    os.environ["ERT_ACCEL_INTERPRET"] = "1"
    try:
        img = np.asarray(integrators.render(scene, seed=5))
    finally:
        os.environ.pop("ERT_ACCEL", None)
        os.environ.pop("ERT_ACCEL_INTERPRET", None)
    assert np.allclose(img, ref, atol=1e-4), np.abs(img - ref).max()


def test_render_with_tiles_matches_naive():
    """Full cbox render through the tile path (interpret mode) vs the
    brute-force path."""
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    scene = load_dict(cornell_box(width=8, height=8, spp=4, max_depth=3))
    os.environ["ERT_ACCEL"] = "naive"
    try:
        ref = np.asarray(integrators.render(scene, seed=5))
    finally:
        os.environ.pop("ERT_ACCEL", None)
    os.environ["ERT_ACCEL"] = "tiles"
    os.environ["ERT_ACCEL_INTERPRET"] = "1"
    try:
        img = np.asarray(integrators.render(scene, seed=5))
    finally:
        os.environ.pop("ERT_ACCEL", None)
        os.environ.pop("ERT_ACCEL_INTERPRET", None)
    assert np.allclose(img, ref, atol=1e-4), np.abs(img - ref).max()
