"""Counter-based random numbers for reproducible sharded wavefronts.

The reference seeds a per-lane PCG32 from a TEA hash of (base_seed, lane index)
(reference: include/mitsuba/core/random.h:75-123, src/librender/sampler.cpp:59,91).
PCG32 needs 64-bit state, which is a poor fit for TPUs; instead we use a pure
counter-based Threefry-2x32 generator (same family JAX's PRNG uses) keyed by

    key     = (base_seed, lane_index)
    counter = (dimension, sample/bounce salt)

so any lane's d-th random number is a pure function of (seed, lane, d) —
identical under any sharding/compaction, which is the property the path-replay
backward pass and multi-chip determinism both rely on.

All ops are uint32 adds/xors/rotates: fully vectorized VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .types import pytree_dataclass

_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = jnp.uint32(0x1BD11BDA)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 with 20 rounds. All args uint32 arrays (broadcastable).

    Returns two uint32 arrays of the broadcast shape.
    """
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks = [k0, k1, k0 ^ k1 ^ _PARITY]

    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for block in range(5):
        for r in range(4):
            x0 = x0 + x1
            x1 = _rotl(x1, _ROTATIONS[(block % 2) * 4 + r])
            x1 = x1 ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + jnp.uint32(block + 1)
    return x0, x1


def uint32_to_uniform(bits):
    """uint32 -> float32 in [0, 1) with 24 bits of mantissa."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def hash_seed(seed):
    """Mix a seed (python int or traced scalar) into a (k0, k1) uint32 pair."""
    if isinstance(seed, (int, np.integer)):
        s = int(seed) & 0xFFFFFFFFFFFFFFFF
        return jnp.uint32(s & 0xFFFFFFFF), jnp.uint32((s >> 32) & 0xFFFFFFFF)
    s = jnp.asarray(seed)
    return s.astype(jnp.uint32), jnp.zeros((), jnp.uint32)


@pytree_dataclass
class Sampler:
    """Stateless-counter sampler carried through wavefront loops.

    k0/k1: per-lane key halves (uint32, wavefront shape)
    dim:   per-lane dimension counter (uint32)
    """

    k0: jnp.ndarray
    k1: jnp.ndarray
    dim: jnp.ndarray

    @staticmethod
    def seed(seed, lane_index):
        """Decorrelated per-lane streams: key = threefry(seed, lane)
        (the TEA-hash contract of sampler.h:36-45)."""
        s0, s1 = hash_seed(seed)
        lane = jnp.asarray(lane_index, jnp.uint32)
        k0, k1 = threefry2x32(s0, s1, lane, jnp.zeros_like(lane))
        return Sampler(k0=k0, k1=k1, dim=jnp.zeros_like(lane))

    def next_1d(self):
        bits, _ = threefry2x32(self.k0, self.k1, self.dim, jnp.uint32(0))
        return self.replace(dim=self.dim + jnp.uint32(1)), uint32_to_uniform(bits)

    def next_2d(self):
        b0, b1 = threefry2x32(self.k0, self.k1, self.dim, jnp.uint32(1))
        s = self.replace(dim=self.dim + jnp.uint32(1))
        return s, jnp.stack([uint32_to_uniform(b0), uint32_to_uniform(b1)], axis=-1)

    def fork(self, salt: int):
        """Independent stream (e.g. for NEE transmittance walks)."""
        k0, k1 = threefry2x32(self.k0, self.k1, jnp.uint32(0xF0F0F0F0), jnp.uint32(salt))
        return Sampler(k0=k0, k1=k1, dim=jnp.zeros_like(self.dim))
