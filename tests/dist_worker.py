"""Worker for tests/test_distributed.py: one process of a 2-process
jax.distributed CPU job. Renders the shared scene with the wavefront
sharded over the GLOBAL 4-device mesh (2 local per process) and saves the
developed image — which must be identical on every process and bit-equal
to the single-process render (lane-indexed seeding, SURVEY §2.7)."""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out = sys.argv[3]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    import numpy as np

    from eradiate_kernel_tpu.parallel import make_mesh, render_sharded
    from eradiate_kernel_tpu.scene import load_dict
    from eradiate_kernel_tpu.utils.scenes import cornell_box

    scene = load_dict(cornell_box(width=16, height=16, spp=8, max_depth=3))
    img = render_sharded(scene, make_mesh(jax.devices()), seed=3)
    # out_specs=P() -> fully replicated: addressable on every process
    np.save(out, np.asarray(img))


if __name__ == "__main__":
    main()
