"""Multi-process distributed rendering (SURVEY §5.8): two OS processes
joined via jax.distributed (Gloo CPU collectives), each owning 2 virtual
devices, rendering one sharded wavefront over the global 4-device mesh.
The film psum crosses the process boundary; results must be bit-equal to
the single-process render (seeding is lane-indexed, so sharding cannot
change the estimate)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single_process(tmp_path):
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "dist_worker.py")
    port = _free_port()
    outs = [str(tmp_path / f"img{i}.npy") for i in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), outs[i]],
        env=env, cwd=os.path.dirname(here),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            log, _ = p.communicate()
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    img0 = np.load(outs[0])
    img1 = np.load(outs[1])
    assert np.array_equal(img0, img1), "processes disagree"

    # single-process reference on a 4-device mesh (same global lane layout)
    import jax

    from eradiate_kernel_tpu.parallel import make_mesh, render_sharded
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    if len(jax.devices()) >= 4:
        scene = load_dict(cornell_box(width=16, height=16, spp=8,
                                      max_depth=3))
        ref = np.asarray(render_sharded(
            scene, make_mesh(jax.devices()[:4]), seed=3))
        assert np.array_equal(img0, ref), \
            np.abs(img0 - ref).max()
