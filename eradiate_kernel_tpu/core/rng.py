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
_PARITY = np.uint32(0x1BD11BDA)  # numpy: no backend init at import


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


def _radical_inverse_2(bits):
    """Base-2 radical inverse (bit reversal) — first dim of the (0,2)-seq."""
    bits = jnp.asarray(bits, jnp.uint32)
    bits = ((bits << jnp.uint32(16)) | (bits >> jnp.uint32(16)))
    bits = (((bits & jnp.uint32(0x00FF00FF)) << jnp.uint32(8))
            | ((bits & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)))
    bits = (((bits & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4))
            | ((bits & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)))
    bits = (((bits & jnp.uint32(0x33333333)) << jnp.uint32(2))
            | ((bits & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)))
    bits = (((bits & jnp.uint32(0x55555555)) << jnp.uint32(1))
            | ((bits & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)))
    return bits


def _sobol_2(index):
    """Second dimension of the (0,2)-sequence (Sobol' direction numbers for
    the y component, ldsampler.cpp:61-121 sample_02 analog)."""
    index = jnp.asarray(index, jnp.uint32)
    v = jnp.uint32(1 << 31)
    result = jnp.zeros_like(index)
    # fixed 32-step unrolled scan over the bits: straight-line VPU code
    for _ in range(32):
        result = jnp.where((index & jnp.uint32(1)) != 0, result ^ v, result)
        index = index >> jnp.uint32(1)
        v = v ^ (v >> jnp.uint32(1))
    return result


SAMPLER_KINDS = ("independent", "stratified", "multijitter", "orthogonal",
                 "ldsampler")


@pytree_dataclass(static_fields=("kind", "spp"))
class Sampler:
    """Stateless-counter sampler carried through wavefront loops.

    k0/k1: per-lane key halves (uint32, wavefront shape) — hashed from
           (seed, pixel) so stratification happens *within* a pixel's spp
           samples, matching the reference's per-pixel sample sets
    dim:   per-lane dimension counter (uint32)
    s_idx: per-lane sample index within the pixel (uint32, < spp)

    ``kind`` selects the stratification scheme (src/samplers/*.cpp):
      independent  — pure counter-based threefry (independent.cpp)
      stratified   — jittered strata, sx*sy grid for 2D (stratified.cpp:54-70)
      multijitter  — correlated multi-jitter per Kensler 2013
                     (multijitter.cpp:28,61-76)
      orthogonal   — strength-2 orthogonal array (Bose) when spp = p^2 for
                     prime p, else multijitter layout (orthogonal.cpp:20-73)
      ldsampler    — xor-scrambled (0,2)-sequence (ldsampler.cpp:24,61-121)
    All are pure functions of (seed, pixel, sample index, dim): reproducible
    under any sharding/compaction, unlike the reference's stateful PCG32.
    The reference's in-pixel permutations (Kensler hash cycle-walk) are
    replaced by hash-rotations — data-independent control flow for XLA.
    """

    k0: jnp.ndarray
    k1: jnp.ndarray
    dim: jnp.ndarray
    s_idx: jnp.ndarray
    kind: str = "independent"
    spp: int = 1

    @staticmethod
    def seed(seed, lane_index, kind="independent", spp=1):
        """Decorrelated per-lane streams: key = threefry(seed, lane)
        (the TEA-hash contract of sampler.h:36-45). For stratifying kinds the
        key is derived from the *pixel* (lane // spp) and ``s_idx`` carries
        the in-pixel sample index."""
        s0, s1 = hash_seed(seed)
        lane = jnp.asarray(lane_index, jnp.uint32)
        if kind == "independent":
            k0, k1 = threefry2x32(s0, s1, lane, jnp.zeros_like(lane))
            return Sampler(k0=k0, k1=k1, dim=jnp.zeros_like(lane),
                           s_idx=jnp.zeros_like(lane), kind=kind, spp=1)
        spp = int(spp)
        pixel = lane // jnp.uint32(spp)
        s_idx = lane % jnp.uint32(spp)
        k0, k1 = threefry2x32(s0, s1, pixel, jnp.zeros_like(lane))
        return Sampler(k0=k0, k1=k1, dim=jnp.zeros_like(lane),
                       s_idx=s_idx, kind=kind, spp=spp)

    # -- raw bits: per-(pixel, dim) and per-(pixel, dim, sample) streams -------
    def _bits(self, salt):
        """Shared across a pixel's samples (permutation/scramble keys)."""
        return threefry2x32(self.k0, self.k1, self.dim, jnp.uint32(salt))

    def _bits_s(self, salt):
        """Unique per sample (jitter) — mixes the in-pixel sample index."""
        return threefry2x32(self.k0, self.k1, self.dim,
                            (self.s_idx << jnp.uint32(3)) | jnp.uint32(salt))

    def _grid_2d(self):
        """(sx, sy) static 2D strata factorization of spp (stratified.cpp)."""
        sx = int(np.floor(np.sqrt(self.spp)))
        while self.spp % sx != 0:
            sx -= 1
        return sx, self.spp // sx

    def next_1d(self):
        b0, b1 = self._bits(0)
        if self.kind == "independent":
            return (self.replace(dim=self.dim + jnp.uint32(1)),
                    uint32_to_uniform(b0))
        j0, _ = self._bits_s(4)
        u = uint32_to_uniform(j0)
        n = jnp.uint32(self.spp)
        # per-dim hash-rotation stands in for the in-pixel permutation
        rot = b1 % n
        if self.kind == "ldsampler":
            vdc = _radical_inverse_2(self.s_idx + rot * jnp.uint32(0x9E3779B9))
            u = uint32_to_uniform(vdc ^ b1)
        else:
            idx = (self.s_idx + rot) % n
            u = (idx.astype(jnp.float32) + u) / self.spp
        return self.replace(dim=self.dim + jnp.uint32(1)), u

    def next_2d(self):
        b0, b1 = self._bits(1)
        if self.kind == "independent":
            return (self.replace(dim=self.dim + jnp.uint32(1)),
                    jnp.stack([uint32_to_uniform(b0),
                               uint32_to_uniform(b1)], axis=-1))

        j0, j1 = self._bits_s(5)
        u0 = uint32_to_uniform(j0)
        u1 = uint32_to_uniform(j1)
        n = jnp.uint32(self.spp)
        b2, b3 = self._bits(2)
        rot = b2 % n
        idx = (self.s_idx + rot) % n

        if self.kind == "ldsampler":
            # xor-scrambled (0,2)-sequence at the rotated index
            x = _radical_inverse_2(idx) ^ b0
            y = _sobol_2(idx) ^ b1
            pt = jnp.stack([uint32_to_uniform(x), uint32_to_uniform(y)], -1)
        elif self.kind == "stratified":
            sx, sy = self._grid_2d()
            gx = (idx % jnp.uint32(sx)).astype(jnp.float32)
            gy = (idx // jnp.uint32(sx)).astype(jnp.float32)
            pt = jnp.stack([(gx + u0) / sx, (gy + u1) / sy], -1)
        else:  # multijitter / orthogonal: correlated multi-jitter layout
            sx, sy = self._grid_2d()
            sxu = jnp.uint32(sx)
            syu = jnp.uint32(sy)
            gx = idx % sxu
            gy = idx // sxu
            # sub-stratum rotations keyed per row/column (Kensler CMJ with
            # hash-rotations in place of cycle-walk permutations)
            r0, r1 = threefry2x32(self.k0 ^ b3, self.k1, gx, gy)
            jx = (gy + (r0 % syu)) % syu
            jy = (gx + (r1 % sxu)) % sxu
            px = (gx.astype(jnp.float32)
                  + (jx.astype(jnp.float32) + u0) / sy) / sx
            py = (gy.astype(jnp.float32)
                  + (jy.astype(jnp.float32) + u1) / sx) / sy
            pt = jnp.stack([px, py], -1)
        return self.replace(dim=self.dim + jnp.uint32(1)), pt

    def fork(self, salt: int):
        """Independent stream (e.g. for NEE transmittance walks)."""
        k0, k1 = threefry2x32(self.k0, self.k1, jnp.uint32(0xF0F0F0F0), jnp.uint32(salt))
        return Sampler(k0=k0, k1=k1, dim=jnp.zeros_like(self.dim),
                       s_idx=self.s_idx, kind="independent", spp=1)
