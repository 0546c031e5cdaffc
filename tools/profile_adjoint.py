"""HLO self-time profile of the path-replay adjoint sweep (round 5).

Same mechanism as tools/profile_hlo.py (jax.profiler.ProfileData, self
time by op category, PROF_LINE='XLA Ops' per the round-4 recipe), aimed at
integrators/replay._adjoint_sweep so its TPU cost structure can be
attributed instead of guessed.

  PROF_SPP=16 python tools/profile_adjoint.py
"""

import glob
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _categorize(name: str) -> str:
    base = name.split("/")[-1]
    base = re.sub(r"\.\d+", "", base)
    return base


def main():
    from eradiate_kernel_tpu import integrators
    import eradiate_kernel_tpu.integrators.replay as rp
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    W = H = 256
    spp = int(os.environ.get("PROF_SPP", 16))
    grid = (64, 64, 64) if os.environ.get("BENCH_SCENE") == "large3d" else 64
    d = atmosphere(width=W, height=H, spp=spp, max_depth=12, grid_res=grid)
    scene = load_dict(d)
    n_lanes = int(os.environ.get("BENCH_LANES", 32 * 1024))

    fwd = jax.jit(integrators.render_wavefront_regen,
                  static_argnames=("n_lanes", "spp", "sample_log"))
    film, _r, slog = fwd(scene, n_lanes, jnp.uint32(3), spp, sample_log=True)
    jax.block_until_ready(film)
    ct = jnp.ones((H, W, 5))

    fn = jax.jit(rp._adjoint_sweep, static_argnums=(4, 5))
    g, iters = fn(scene, jnp.uint32(3), slog, ct, n_lanes, spp)
    jax.block_until_ready(g[0])
    print("# adjoint iters:", int(iters), file=sys.stderr)

    def timed(reps=1):
        t0 = time.perf_counter()
        for i in range(reps):
            g, it = fn(scene, jnp.uint32(3 + i), slog, ct, n_lanes, spp)
        jax.block_until_ready(g[0])
        return time.perf_counter() - t0

    dt = timed()
    print(f"# pre-trace adjoint: {dt*1e3:.1f} ms", file=sys.stderr)
    logdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(logdir):
        dt = timed()

    from jax.profiler import ProfileData
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no trace written under {logdir}"
    data = ProfileData.from_file(paths[0])
    only_line = os.environ.get("PROF_LINE", "XLA Ops")
    totals = {}
    grand = 0.0
    nev = {}
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if (line.name or "") != only_line:
                continue
            for ev in line.events:
                key = _categorize(ev.name)
                totals[key] = totals.get(key, 0.0) + ev.duration_ns
                nev[key] = nev.get(key, 0) + 1
                grand += ev.duration_ns
    topk = int(os.environ.get("TOPK", 30))
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:topk]
    print(f"# traced wall: {dt*1e3:.1f} ms, device op time: {grand/1e6:.1f} ms")
    for name, ns in rows:
        print(f"{ns/1e6:10.2f} ms  {100*ns/max(grand,1):5.1f}%  "
              f"{nev[name]:7d} ev  {name}")


if __name__ == "__main__":
    main()
