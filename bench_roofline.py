"""Roofline / MFU accounting for the flagship workloads.

VERDICT weak #1: "no roofline/MFU/occupancy accounting exists anywhere —
'fast' is currently only relative to itself." This tool anchors the bench
numbers to hardware limits: XLA's compiled cost analysis gives FLOPs and
HBM bytes per invocation; dividing by measured wall time yields achieved
FLOP/s and bandwidth, reported against the chip's peaks (v5e: 197 TFLOP/s
bf16 / 394 TFLOP/s int8 path unused here; ~67 TFLOP/s f32 MXU;
819 GB/s HBM). The arithmetic-intensity column says which wall the
workload sits against.

Prints one JSON line per workload. Runs on CPU too (cost model only, no
peaks), so the accounting itself is testable without the chip.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# v5e single-chip peaks (public spec)
PEAK_F32_FLOPS = 67e12     # MXU f32 (bf16 inputs: 197e12)
PEAK_HBM_BPS = 819e9


def analyze(name, fn, *args, reps=4):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))

    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    platform = jax.devices()[0].platform
    rec = {
        "metric": f"roofline_{name}",
        "wall_s": round(dt, 5),
        "gflops_per_call": round(flops / 1e9, 3),
        "hbm_gb_per_call": round(bytes_ / 1e9, 3),
        "arith_intensity": round(flops / max(bytes_, 1.0), 2),
        "achieved_tflops": round(flops / dt / 1e12, 3),
        "achieved_gbps": round(bytes_ / dt / 1e9, 2),
        "platform": platform,
    }
    if platform == "tpu":
        rec["mfu_f32"] = round(flops / dt / PEAK_F32_FLOPS, 4)
        rec["hbm_util"] = round(bytes_ / dt / PEAK_HBM_BPS, 4)
        # which roofline wall: compute-bound above the ridge point
        rec["bound"] = ("compute" if rec["arith_intensity"]
                        > PEAK_F32_FLOPS / PEAK_HBM_BPS else "memory")
    print(json.dumps(rec))
    return rec


def main():
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import atmosphere, cornell_box

    W = H = int(os.environ.get("ROOFLINE_RES", 128))
    spp = 4

    scene = load_dict(atmosphere(width=W, height=H, spp=spp, max_depth=12,
                                 grid_res=64))
    n_lanes = min(24 * 1024, W * H * spp)

    def volpath_step(scene, seed):
        film, n = integrators.render_wavefront_regen(scene, n_lanes, seed,
                                                     spp)
        return film

    analyze("atmosphere_volpath", volpath_step, scene, jnp.uint32(0))

    cb = load_dict(cornell_box(width=W, height=H, spp=spp, max_depth=6))

    def cbox_pass(scene, seed):
        return integrators.render_wavefront(scene, jnp.uint32(0),
                                            W * H * spp, seed, spp)

    analyze("cbox_path", cbox_pass, cb, jnp.uint32(0))


if __name__ == "__main__":
    main()
