"""Mesh-intersection benchmark: Pallas BVH traversal vs flat tile sweep.

Scene: a procedurally generated terrain heightfield (>=100k triangles, the
Earth-surface mesh workload the VERDICT requires) + a camera ray load of
coherent primary rays and incoherent bounce-style rays.

Prints one JSON line per configuration with Mrays/s; the headline number is
the BVH closest-hit rate on primary rays.
"""

import json
import time

import numpy as np


def terrain(n=256, seed=0):
    """Heightfield mesh over [-1,1]^2 with fractal bumps: 2*(n-1)^2 tris."""
    rng = np.random.default_rng(seed)
    x = np.linspace(-1, 1, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    Z = np.zeros_like(X)
    for octave in range(1, 6):
        f = 2.0 ** octave
        ph = rng.uniform(0, 2 * np.pi, 4)
        Z += (np.sin(f * np.pi * X + ph[0]) * np.sin(f * np.pi * Y + ph[1])
              + np.cos(f * np.pi * (X + Y) + ph[2])) * (0.25 / f)
    V = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    a, b, c, d = idx[:-1, :-1], idx[1:, :-1], idx[:-1, 1:], idx[1:, 1:]
    F = np.concatenate([
        np.stack([a, b, c], -1).reshape(-1, 3),
        np.stack([b, d, c], -1).reshape(-1, 3)]).astype(np.int32)
    return V, F


def make_rays(n_rays, kind, seed=1):
    rng = np.random.default_rng(seed)
    if kind == "primary":
        # coherent: pinhole camera above the terrain looking down
        o = np.array([0.0, -1.5, 1.2], np.float32)
        s = int(np.sqrt(n_rays))
        u = (np.arange(s) + 0.5) / s - 0.5
        U, Vv = np.meshgrid(u, u, indexing="ij")
        d = np.stack([U, 0.9 + 0.0 * U, -0.55 + 0.6 * Vv], axis=-1)
        d = d.reshape(-1, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(o, d.shape)
        return o.astype(np.float32)[:n_rays], d.astype(np.float32)[:n_rays]
    # incoherent: random origins above the surface, random directions
    o = rng.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    o[:, 2] = rng.uniform(0.3, 1.0, n_rays)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def main():
    import jax
    import jax.numpy as jnp

    from eradiate_kernel_tpu.core.ray import Ray
    from eradiate_kernel_tpu.ops import accel
    from eradiate_kernel_tpu.ops.bvh import build_tile_bvh, collapse_to_bvh8
    from eradiate_kernel_tpu.ops.pallas_intersect import (
        intersect_bvh, intersect_bvh8, intersect_tiles)

    # flip the axon relay into its synchronous (fast, honestly-timed)
    # dispatch mode before ANY timing — see scene/build.py load_dict note
    np.asarray(jnp.zeros(()))

    V, F = terrain(256)
    n_tris = len(F)
    tiles_np = accel.pack_tiles(V, None, F, np.zeros(n_tris, np.int32))
    t0 = time.perf_counter()
    nbox, nmeta, depth = build_tile_bvh(tiles_np["lo"], tiles_np["hi"])
    build_ms = (time.perf_counter() - t0) * 1e3
    tiles = {k: jnp.asarray(v) for k, v in tiles_np.items()}
    tiles["nbox"] = jnp.asarray(nbox)
    tiles["nmeta"] = jnp.asarray(nmeta)
    cbox, cmeta = collapse_to_bvh8(nbox, nmeta)
    tiles["cbox"] = jnp.asarray(cbox)
    tiles["cmeta"] = jnp.asarray(cmeta)
    T = tiles_np["lo"].shape[0]
    print(f"# terrain: {n_tris} tris, {T} tiles, bvh depth {depth}, "
          f"{len(cbox)} bvh8 nodes, build {build_ms:.1f} ms")

    n_rays = 1 << 20
    results = {}
    for kind in ("primary", "incoherent"):
        o, d = make_rays(n_rays, kind)
        ray = Ray.make(jnp.asarray(o), jnp.asarray(d),
                       wavelengths=jnp.zeros((n_rays, 0)))
        for name, fn in (("bvh", intersect_bvh), ("bvh8", intersect_bvh8),
                         ("tiles", intersect_tiles)):
            run = jax.jit(lambda r, fn=fn: fn(tiles, r)[0])
            t = run(ray)
            t.block_until_ready()   # compile
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                t = run(ray)
            t.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            mrays = n_rays / dt / 1e6
            hit_frac = float(jnp.isfinite(t).mean())
            results[f"{name}_{kind}"] = mrays
            print(json.dumps({
                "metric": f"mesh_intersect_{name}_{kind}",
                "value": round(mrays, 2), "unit": "Mrays/s",
                "hit_frac": round(hit_frac, 3), "n_tris": n_tris}))

    speedup = results["bvh_primary"] / results["tiles_primary"]
    # the headline is what the framework's auto policy actually dispatches
    # (_accel_mode: dense sweep <=2k tiles, BVH above / with instances)
    policy = "tiles" if T <= 2048 else "bvh"
    print(json.dumps({
        "metric": "mesh_intersect_mrays_per_s",
        "value": round(results[f"{policy}_primary"], 2), "unit": "Mrays/s",
        "policy": policy, "bvh_over_tiles": round(speedup, 2)}))

    # instanced forest: one 2k-tri canopy crown instanced N times — the
    # two-level path (geometry stored once, per-leaf ray transform)
    bench_forest()


def bench_forest(n_inst=256, n_rays=1 << 19, reps=10):
    import os

    import jax
    import jax.numpy as jnp

    os.environ.setdefault("ERT_ACCEL", "bvh")  # the two-level kernel path

    from eradiate_kernel_tpu.core.ray import Ray
    from eradiate_kernel_tpu.render.geometry import ray_intersect_preliminary
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.core.transform import Transform

    rng = np.random.default_rng(4)
    V, F = terrain(33)  # ~2k-tri crown
    d = {"type": "scene",
         "sensor": {"type": "perspective", "film": {"width": 2, "height": 2}},
         "grp": {"type": "shapegroup",
                 "crown": {"type": "mesh",
                           "vertices": V * 0.5, "faces": F,
                           "bsdf": {"type": "diffuse"}}}}
    for i in range(n_inst):
        x, y = rng.uniform(-8, 8, 2)
        d[f"i{i}"] = {"type": "instance",
                      "shapegroup": {"type": "ref", "id": "grp"},
                      "to_world": [
                          {"type": "translate",
                           "value": [float(x), float(y),
                                     float(rng.uniform(0, 0.3))]},
                          {"type": "rotate", "axis": [0, 0, 1],
                           "angle": float(rng.uniform(0, 360))}]}
    scene = load_dict(d)
    n_tris = int(scene.geo.ig_faces.shape[0])
    print(f"# forest: {n_inst} instances x {n_tris} shared tris "
          f"(= {n_inst * n_tris} effective)")

    o, dr = make_rays(n_rays, "primary")
    o = o * np.float32([8, 8, 1])  # widen the camera footprint
    ray = Ray.make(jnp.asarray(o), jnp.asarray(dr),
                   wavelengths=jnp.zeros((n_rays, 0)))
    run = jax.jit(lambda r: ray_intersect_preliminary(scene.geo, r).t)
    t = run(ray)
    t.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        t = run(ray)
    t.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": "instanced_forest_mrays_per_s",
        "value": round(n_rays / dt / 1e6, 2), "unit": "Mrays/s",
        "n_instances": n_inst, "shared_tris": n_tris,
        "hit_frac": round(float(jnp.isfinite(t).mean()), 3)}))


if __name__ == "__main__":
    main()
