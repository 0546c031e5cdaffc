"""HLO self-time profile of the flagship workloads on the real chip.

Runs the bench workload under jax.profiler.trace, parses the captured
xplane with jax.profiler.ProfileData (no TensorBoard needed), aggregates
device-op self time by a normalized op-category key, and prints the top
entries — the round-3/4 "where do the microseconds actually go" tool.

  BENCH_SCENE=large3d python tools/profile_hlo.py
  TOPK=40 python tools/profile_hlo.py
"""

import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _categorize(name: str) -> str:
    """Collapse an HLO op name like 'fusion.1234' / 'gather.55.remat' to a
    stable category so self-times aggregate usefully."""
    base = name.split("/")[-1]
    base = re.sub(r"\.\d+", "", base)
    return base


def run_workload():
    from eradiate_kernel_tpu import integrators
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import atmosphere

    W = H = 256
    spp = int(os.environ.get("PROF_SPP", 32))
    grid = (64, 64, 64) if os.environ.get("BENCH_SCENE") == "large3d" else 64
    d = atmosphere(width=W, height=H, spp=spp, max_depth=12, grid_res=grid)
    nee = os.environ.get("BENCH_NEE", "residual")
    d["integrator"]["nee_transmittance"] = nee
    overrides = json.loads(os.environ.get("ABLATE", "{}"))
    d["integrator"].update(overrides)
    scene = load_dict(d)
    n_lanes = int(os.environ.get("BENCH_LANES", 32 * 1024))
    fn = jax.jit(integrators.render_wavefront_regen,
                 static_argnames=("n_lanes", "spp"))
    for w in range(2):
        film, n_rays = fn(scene, n_lanes, jnp.uint32(1000 + w), spp)
    film.block_until_ready()

    def timed(reps=2):
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for i in range(reps):
            film, n_rays = fn(scene, n_lanes, jnp.uint32(i + 1), spp)
            acc = acc + n_rays
        film.block_until_ready()
        return float(acc), time.perf_counter() - t0

    return timed


def main():
    timed = run_workload()
    rays, dt = timed()
    print(f"# pre-trace: {rays/dt/1e6:.2f} Mrays/s", file=sys.stderr)

    logdir = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(logdir):
        rays, dt = timed()

    from jax.profiler import ProfileData
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no trace written under {logdir}"
    data = ProfileData.from_file(paths[0])

    if os.environ.get("PROF_LINES"):
        for plane in data.planes:
            line_tot = {}
            for line in plane.lines:
                tot = sum(ev.duration_ns for ev in line.events)
                n = sum(1 for _ in line.events)
                line_tot[line.name] = (tot, n)
            print(f"PLANE {plane.name}")
            for ln, (tot, n) in sorted(line_tot.items(),
                                       key=lambda kv: -kv[1][0]):
                print(f"   {tot/1e6:10.2f} ms  {n:7d} ev  line={ln!r}")
        return

    only_line = os.environ.get("PROF_LINE")
    totals = {}
    grand = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name or ""
            if only_line and lname != only_line:
                continue
            if not only_line and ("XLA Modules" in lname
                                  or "Steps" in lname):
                continue
            for ev in line.events:
                dur = ev.duration_ns
                key = _categorize(ev.name)
                totals[key] = totals.get(key, 0.0) + dur
                grand += dur

    topk = int(os.environ.get("TOPK", 30))
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:topk]
    print(f"# traced wall: {dt*1e3:.1f} ms, device op time: "
          f"{grand/1e6:.1f} ms, {rays/dt/1e6:.2f} Mrays/s")
    for name, ns in rows:
        print(f"{ns/1e6:10.2f} ms  {100*ns/max(grand,1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
