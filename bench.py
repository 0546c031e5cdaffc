"""Benchmark: Mrays/s/chip on the flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no Mrays/s figures (BASELINE.md), so vs_baseline is
reported against the first recorded value of this same bench (self-baseline,
stored in bench_baseline.json when first run); 1.0 on the first run.

Current flagship workload: Cornell-box MIS path tracing (BASELINE.json
configs[0]); will move to the atmosphere volpath scene (configs[3]) once the
volumetric stack lands.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from eradiate_kernel_tpu.integrators import path as path_mod
    from eradiate_kernel_tpu import sensors
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    W = H = 512
    spp = 16
    max_depth = 6
    scene = load_dict(cornell_box(width=W, height=H, spp=spp,
                                  max_depth=max_depth))
    n_lanes = W * H * spp

    def run(scene, seed):
        lane = jnp.arange(n_lanes, dtype=jnp.uint32)
        sampler = Sampler.seed(seed, lane)
        sampler, jitter = sampler.next_2d()
        pixel = lane // spp
        pos = jnp.stack([(pixel % W).astype(jnp.float32),
                         (pixel // W).astype(jnp.float32)], -1) + jitter
        pos_film = pos / jnp.asarray([W, H], jnp.float32)
        ray, _w, sampler = sensors.sample_ray(scene, sampler, pos_film,
                                              jnp.zeros(n_lanes))
        spec, valid, _s, n_rays = path_mod.sample_counted(scene, sampler, ray)
        return jnp.sum(spec), n_rays

    fn = jax.jit(run)
    # warmup / compile
    total, n_rays = fn(scene, jnp.uint32(0))
    total.block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    acc = 0.0
    rays = 0.0
    for i in range(iters):
        total, n_rays = fn(scene, jnp.uint32(i + 1))
        acc += float(total)
        rays += float(n_rays)
    dt = time.perf_counter() - t0

    mrays_per_s = rays / dt / 1e6
    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        base = json.load(open(baseline_path))["value"]
    else:
        base = mrays_per_s
        json.dump({"value": base, "note": "first recorded run"},
                  open(baseline_path, "w"))
    print(json.dumps({
        "metric": "cbox_path_mrays_per_s_per_chip",
        "value": round(mrays_per_s, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_s / base, 4),
    }))


if __name__ == "__main__":
    main()
