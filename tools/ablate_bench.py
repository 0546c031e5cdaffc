"""Ablation sweep for the flagship atmosphere volpath bench on real TPU.

Usage: python tools/ablate_bench.py [configs...]
Each config: name=key:val,key:val (integrator extras) or lanes=N.
Default sweep covers lane counts and NEE estimator variants.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from eradiate_kernel_tpu import integrators
from eradiate_kernel_tpu.scene import load_dict
from eradiate_kernel_tpu.utils.scenes import atmosphere


def run(extras, n_lanes=24 * 1024, W=256, H=256, spp=8, iters=3):
    d = atmosphere(width=W, height=H, spp=spp, max_depth=12, grid_res=64)
    if extras:
        d["integrator"].update(extras)
    scene = load_dict(d)
    fn = jax.jit(integrators.render_wavefront_regen,
                 static_argnames=("n_lanes", "spp"))
    for w in range(2):
        film, n_rays = fn(scene, n_lanes, jnp.uint32(1000 + w), spp)
    film.block_until_ready()
    t0 = time.perf_counter()
    rays = jnp.zeros(())
    for i in range(iters):
        film, n_rays = fn(scene, n_lanes, jnp.uint32(i + 1), spp)
        rays = rays + n_rays
    film.block_until_ready()
    dt = time.perf_counter() - t0
    return float(rays) / dt / 1e6, float(jnp.mean(film[..., :3]))


CONFIGS = [
    ("default", {}, 24 * 1024),
    ("lanes16k", {}, 16 * 1024),
    ("lanes32k", {}, 32 * 1024),
    ("lanes48k", {}, 48 * 1024),
    ("quadNEE8", {"nee_transmittance": "quadrature", "nee_quad_points": 8},
     24 * 1024),
    ("quadNEE4", {"nee_transmittance": "quadrature", "nee_quad_points": 4},
     24 * 1024),
    ("quadNEE8_32k", {"nee_transmittance": "quadrature",
                      "nee_quad_points": 8}, 32 * 1024),
]

if __name__ == "__main__":
    names = sys.argv[1:]
    for name, extras, lanes in CONFIGS:
        if names and name not in names:
            continue
        mrays, mean = run(extras, n_lanes=lanes)
        print(f"{name:16s} lanes={lanes:6d} {mrays:7.3f} Mrays/s  "
              f"film_mean={mean:.6f}", flush=True)
