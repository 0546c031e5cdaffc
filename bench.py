"""Benchmark: Mrays/s/chip on the flagship atmosphere volpath scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no Mrays/s figures (BASELINE.md), so vs_baseline is
reported against the first recorded value of this same bench (self-baseline,
stored in bench_baseline.json at first run of this metric).

Workload (BASELINE.json north star): plane-parallel Rayleigh atmosphere —
gridvolume sigma_t with an exponential profile, ratio-tracked transmittance,
Rayleigh phase, RPV ground, directional sun — rendered with the
null-scattering volpath integrator. The ray count is exact: every masked
ray_intersect issued by the main loop and both NEE transmittance walks.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from eradiate_kernel_tpu import sensors
    from eradiate_kernel_tpu.core.rng import Sampler
    from eradiate_kernel_tpu.integrators import volpath
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    W = H = 256
    spp = 8
    scene = load_dict(atmosphere(width=W, height=H, spp=spp, max_depth=12))
    # one pass = 128k lanes (the full wavefront is split into passes, the
    # reference's samples_per_pass memory knob — integrator.cpp:59-65)
    n_lanes = 1 << 19

    def run(scene, seed, offset):
        lane = offset + jnp.arange(n_lanes, dtype=jnp.uint32)
        sampler = Sampler.seed(seed, lane)
        sampler, jitter = sampler.next_2d()
        pixel = lane // spp
        pos = jnp.stack([(pixel % W).astype(jnp.float32),
                         (pixel // W).astype(jnp.float32)], -1) + jitter
        pos_film = pos / jnp.asarray([W, H], jnp.float32)
        ray, _w, sampler = sensors.sample_ray(scene, sampler, pos_film,
                                              jnp.zeros(n_lanes))
        spec, valid, _s, n_rays = volpath.sample_counted(scene, sampler, ray)
        return jnp.sum(spec), n_rays

    fn = jax.jit(run)
    total, n_rays = fn(scene, jnp.uint32(0), jnp.uint32(0))  # warmup
    total.block_until_ready()

    iters = 4
    t0 = time.perf_counter()
    rays = 0.0
    for i in range(iters):
        total, n_rays = fn(scene, jnp.uint32(i + 1),
                           jnp.uint32(i * n_lanes))
        rays += float(n_rays)
    total.block_until_ready()
    dt = time.perf_counter() - t0

    mrays_per_s = rays / dt / 1e6
    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    metric = "atmosphere_volpath_mrays_per_s_per_chip"
    base = None
    if os.path.exists(baseline_path):
        data = json.load(open(baseline_path))
        if data.get("metric") == metric:
            base = data["value"]
    if base is None:
        base = mrays_per_s
        json.dump({"metric": metric, "value": base,
                   "note": "first recorded run"}, open(baseline_path, "w"))
    print(json.dumps({
        "metric": metric,
        "value": round(mrays_per_s, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_s / base, 4),
    }))


if __name__ == "__main__":
    main()
