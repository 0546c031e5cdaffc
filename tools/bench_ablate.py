"""Ablation bench for the flagship atmosphere volpath workload.

Runs the exact bench.py timing protocol under knob overrides passed as
env vars, printing one JSON line per configuration:

  ABLATE='{"nee_transmittance": "quadrature", "nee_quad_K": 8}' \
      python tools/bench_ablate.py
  BENCH_LANES=16384 python tools/bench_ablate.py

Used to tune the perf levers (per-segment majorants, quadrature NEE,
nee_steps, lane-pool size) on real TPU without touching bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    W = H = 256
    spp = 8
    if os.environ.get("BENCH_SIZE"):
        W, H, spp = (int(x) for x in os.environ["BENCH_SIZE"].split("x"))
    grid = (64, 64, 64) if os.environ.get("BENCH_SCENE") == "large3d" else 64

    overrides = json.loads(os.environ.get("ABLATE", "{}"))
    d = atmosphere(width=W, height=H, spp=spp, max_depth=12, grid_res=grid)
    d["integrator"].update(overrides)
    scene = load_dict(d)

    n_lanes = int(os.environ.get("BENCH_LANES", 24 * 1024))
    fn = jax.jit(integrators.render_wavefront_regen,
                 static_argnames=("n_lanes", "spp"))
    for w in range(3):
        film, n_rays = fn(scene, n_lanes, jnp.uint32(1000 + w), spp)
    film.block_until_ready()

    iters = 4
    t0 = time.perf_counter()
    rays_dev = jnp.zeros(())
    for i in range(iters):
        film, n_rays = fn(scene, n_lanes, jnp.uint32(i + 1), spp)
        rays_dev = rays_dev + n_rays
    film.block_until_ready()
    dt = time.perf_counter() - t0
    mean = float(jnp.mean(film[..., :3]))
    print(json.dumps({
        "mrays_per_s": round(float(rays_dev) / dt / 1e6, 3),
        "film_mean": round(mean, 6),
        "overrides": overrides,
        "lanes": n_lanes,
    }))


if __name__ == "__main__":
    main()
