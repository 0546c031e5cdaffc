"""Multi-chip rendering: wavefront sharding over a device mesh.

TPU-native replacement for the reference's TBB block scheduler
(integrator.cpp:99-139): the pixelxsample wavefront is sharded over the
``rays`` mesh axis with ``shard_map``; each device accumulates its own full
film (scatter-add is local), films are reduced with ``psum`` over ICI, and the
develop step runs on the replicated result. Scene data is replicated (it is
small next to the wavefront). Seeding is lane-indexed, so results are
bit-identical under any device count (SURVEY §2.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..films import N_BASE_CHANNELS, develop
from ..integrators import n_aov, render_wavefront, render_wavefront_regen


def make_mesh(devices=None, axis="rays"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_film(scene, mesh: Mesh, seed, spp):
    """Traceable single-pass sharded render of the full wavefront: returns the
    psum-reduced raw film (H, W, C). Each device renders an equal contiguous
    lane range; padding lanes are masked inside render_wavefront."""
    cfg = scene.config
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    total = ch * cw * spp
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    per_dev = -(-total // n_dev)

    offsets = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per_dev)
    seeds = jnp.full((n_dev,), seed, jnp.uint32)

    def shard_body(scene_, offset, seed_s):
        film = render_wavefront(scene_, offset[0], per_dev, seed_s[0], spp)
        return jax.lax.psum(film, axis)

    # check_vma=False: path state mixes replicated scene constants with
    # per-device wavefront arrays inside scan carries; classic shard_map
    # semantics (everything device-varying) sidestep the vma init/body
    # mismatch without inserting pcasts throughout the integrators.
    return jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(scene, offsets, seeds)


def render_sharded(scene, mesh: Mesh, seed=0, spp=None, develop_film=True,
                   samples_per_pass=None, regen=False, regen_lanes=1 << 14):
    """Render with the wavefront sharded across ``mesh``'s devices.

    Total samples = H * W * spp, padded up to a multiple of the device count;
    the pad lanes render pixel 0 with weight masked out by lane bounds.

    ``regen=True`` runs the regenerating lane-pool driver per shard instead
    of the fixed-trip scan: each device streams its contiguous sample range
    through a ``regen_lanes``-sized pool (occupancy stays near 100%
    independently per chip — no cross-chip work stealing is needed because
    the ranges are equal-sized and path-length variance averages out over
    thousands of samples per shard), films psum over ICI at the end.
    """
    cfg = scene.config
    spp = spp or cfg.spp
    H, W = cfg.film_height, cfg.film_width
    cw, ch = cfg.crop_size if cfg.crop_size else (W, H)
    extra = n_aov(cfg)
    total = ch * cw * spp
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    if regen:
        per_dev = -(-total // n_dev)
        n_lanes = min(regen_lanes, per_dev)

        def pass_regen(scene, offsets, counts, seed_arr):
            def shard_body(scene_, offset, count, seed_s):
                film, _ = render_wavefront_regen(
                    scene_, n_lanes, seed_s[0], spp,
                    sample_offset=offset[0], total=count[0])
                return jax.lax.psum(film, axis)

            return jax.shard_map(
                shard_body, mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P()),
                out_specs=P(),
                check_vma=False,
            )(scene, offsets, counts, seed_arr)

        offsets = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per_dev)
        counts = jnp.minimum(jnp.uint32(per_dev),
                             jnp.uint32(total) - jnp.minimum(
                                 offsets, jnp.uint32(total)))
        film = jax.jit(pass_regen)(scene, offsets, counts,
                                   jnp.full((n_dev,), seed, jnp.uint32))
        if develop_film:
            mode = "mono" if cfg.variant.is_monochromatic else "rgb"
            return develop(film, mode, cfg.pixel_format)
        return film

    if samples_per_pass is None:
        samples_per_pass = min(total, (1 << 22) * n_dev)
    samples_per_pass = -(-samples_per_pass // n_dev) * n_dev
    n_passes = -(-total // samples_per_pass)
    per_dev = samples_per_pass // n_dev

    def pass_fn(scene, offsets, seed_arr):
        def shard_body(scene, offset, seed_s):
            film = render_wavefront(scene, offset[0], per_dev, seed_s[0], spp)
            return jax.lax.psum(film, axis)

        return jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )(scene, offsets, seed_arr)

    fn = jax.jit(pass_fn)
    # sized exactly like render_wavefront's output: crop window + AOV extras
    film = jnp.zeros((ch, cw, N_BASE_CHANNELS + extra))
    for p in range(n_passes):
        base = p * samples_per_pass
        offsets = jnp.asarray(
            [base + i * per_dev for i in range(n_dev)], jnp.uint32)
        film = film + fn(scene, offsets, jnp.full((n_dev,), seed, jnp.uint32))
    if develop_film:
        mode = "mono" if cfg.variant.is_monochromatic else "rgb"
        return develop(film[..., :N_BASE_CHANNELS], mode, cfg.pixel_format)
    return film


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host initialization (jax.distributed.initialize wrapper).

    On a multi-host TPU slice, call this once per host before building the
    mesh; ``make_mesh(jax.devices())`` then spans the full slice and
    ``render_sharded`` shards the wavefront over every chip, with the film
    psum riding ICI within the slice (SURVEY §5.8). Single-host runs skip
    this entirely."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
