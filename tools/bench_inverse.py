"""Differentiable-rendering benchmarks (BASELINE configs[4] + VERDICT r4 #1).

Two measurements, both on the live backend (TPU via the axon relay when
available):

1. Cornell-box inverse-rendering iteration (the reference's only published
   perf figure, diff_render.rst:311-315): 256x256 spp=1, render + backward
   + Adam step, unbiased True/False, scan vs regen(path-replay) drivers.
   Round-2 self-baseline: 43.0 ms unbiased / 28.4 ms biased (scan driver);
   reference: ~50 / ~27 ms on a Titan RTX.

2. Flagship atmosphere volpath gradient throughput: primal regen pass vs
   value_and_grad through the path-replay custom_vjp, in Mrays-equivalent
   sample throughput (samples/s of the primal workload). VERDICT r4
   acceptance: gradient pass >= 1/3 of primal regen throughput.

Usage: python tools/bench_inverse.py [cbox|flagship|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _time_iters(fn, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_cbox():
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils import autodiff as ad
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    scene = load_dict(cornell_box(width=256, height=256, spp=1, max_depth=4))
    pm = ad.traverse(scene)
    keys = [k for k in pm._values if "baked" in k and "value" in k]
    pm.keep(keys[:1])
    tr0 = pm.trainable()
    target = jnp.zeros((256, 256, 3))
    out = {}
    for regen in (False, True):
        for unbiased in (False, True):
            opt = ad.Adam(tr0, lr=2e-2)

            def loss(tr, seed):
                img = ad.render(pm, tr, seed=seed, unbiased=unbiased,
                                regen=regen)
                return jnp.mean((img - target) ** 2)

            grad_fn = jax.jit(jax.grad(loss))
            it = [0]

            def step():
                it[0] += 1
                g = grad_fn(opt.params, jnp.uint32(it[0]))
                opt.step(g)
                return g

            ms = _time_iters(step) * 1e3
            name = f"cbox_iter_{'regen' if regen else 'scan'}_" \
                   f"{'unbiased' if unbiased else 'biased'}_ms"
            out[name] = round(ms, 2)
            print(name, out[name], flush=True)
    return out


def bench_flagship(scene_kind="flagship"):
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.integrators import replay
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    W = H = 256
    spp = int(os.environ.get("BENCH_GRAD_SPP", 16))
    n_lanes = int(os.environ.get("BENCH_LANES", 32 * 1024))
    grid = (64, 64, 64) if scene_kind == "large3d" else 64
    d = atmosphere(width=W, height=H, spp=spp, max_depth=12, grid_res=grid)
    scene = load_dict(d)
    total = W * H * spp

    prim = jax.jit(integrators.render_wavefront_regen,
                   static_argnames=("n_lanes", "spp"))

    def primal():
        film, _ = prim(scene, n_lanes, jnp.uint32(3), spp)
        return film

    t_prim = _time_iters(primal, warmup=2, iters=4)

    vg = jax.jit(jax.value_and_grad(
        lambda sc, seed: jnp.sum(
            replay.render_regen_diff(sc, seed, n_lanes, spp)[..., :3]),
        allow_int=True))

    def gradpass():
        v, g = vg(scene, jnp.uint32(3))
        return v

    t_grad = _time_iters(gradpass, warmup=2, iters=4)
    out = {
        f"{scene_kind}_primal_ms": round(t_prim * 1e3, 1),
        f"{scene_kind}_valgrad_ms": round(t_grad * 1e3, 1),
        f"{scene_kind}_samples": total,
        f"{scene_kind}_grad_over_primal": round(t_grad / t_prim, 2),
        f"{scene_kind}_grad_throughput_frac": round(t_prim / t_grad, 3),
    }
    for k, v in out.items():
        print(k, v, flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.devices()[0].platform, flush=True)
    out = {}
    if which in ("cbox", "all"):
        out.update(bench_cbox())
    if which in ("flagship", "all"):
        out.update(bench_flagship())
    if which == "large3d":
        out.update(bench_flagship("large3d"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
