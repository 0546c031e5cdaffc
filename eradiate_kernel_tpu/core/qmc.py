"""Radical-inverse QMC point sets (counterpart of include/mitsuba/core/qmc.h).

``radical_inverse(base_index, index)`` mirrors the reference's
``RadicalInverse::eval`` (qmc.h:18): digit-reverse ``index`` in the
``base_index``-th prime base. The scrambled variant replaces the reference's
per-base digit permutations with a hash-based permutation keyed on
``(base, seed)`` — data-independent control flow, reproducible under any
sharding (the same re-design trade as core/rng.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_N_PRIMES = 1024


def _sieve_primes(n):
    limit = 1 << 14
    while True:
        is_p = np.ones(limit, bool)
        is_p[:2] = False
        for i in range(2, int(limit ** 0.5) + 1):
            if is_p[i]:
                is_p[i * i::i] = False
        primes = np.flatnonzero(is_p)
        if primes.size >= n:
            return primes[:n].astype(np.uint32)
        limit *= 2


PRIMES = _sieve_primes(_N_PRIMES)  # host table; device copy made lazily
MAX_DIGITS = 32  # uint32 indices: enough digits for every base >= 2


def prime_base(base_index):
    """The ``base_index``-th prime (qmc.h prime_base)."""
    return jnp.asarray(PRIMES)[base_index]


def radical_inverse(base_index, index):
    """Van der Corput radical inverse of ``index`` in the
    ``base_index``-th prime base; vectorized over both arguments."""
    base = prime_base(base_index).astype(jnp.uint32)
    index = jnp.asarray(index, jnp.uint32)
    base_f = base.astype(jnp.float32)
    inv_base = 1.0 / base_f

    def body(_, carry):
        value, inv, idx = carry
        digit = (idx % base).astype(jnp.float32)
        return (value + digit * inv, inv * inv_base, idx // base)

    value, inv, _ = jax.lax.fori_loop(
        0, MAX_DIGITS, body,
        (jnp.zeros(jnp.shape(index), jnp.float32),
         jnp.broadcast_to(inv_base, jnp.shape(index)), index))
    return jnp.minimum(value, 1.0 - 1e-7)


def _perm(digit, base, key):
    """Affine digit permutation d -> (a d + b) mod base, a in [1, base):
    a bijection for prime ``base``, keyed by ``key`` (the stateless stand-in
    for qmc.h's precomputed Faure permutation tables)."""
    a = jnp.uint32(1) + (key % (base - jnp.uint32(1)))
    b = (key >> jnp.uint32(16)) % base
    return (a * digit + b) % base


def radical_inverse_scrambled(base_index, index, seed):
    """Digit-permuted radical inverse (qmc.h scrambled eval): every digit is
    passed through a seeded permutation of [0, base)."""
    base = prime_base(base_index).astype(jnp.uint32)
    index = jnp.asarray(index, jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    key = (seed * jnp.uint32(0x9E3779B9)) ^ (base * jnp.uint32(0x85EBCA6B))
    base_f = base.astype(jnp.float32)
    inv_base = 1.0 / base_f

    def body(_, carry):
        value, inv, idx = carry
        digit = _perm((idx % base).astype(jnp.uint32), base, key)
        return (value + digit.astype(jnp.float32) * inv, inv * inv_base,
                idx // base)

    value, inv, _ = jax.lax.fori_loop(
        0, MAX_DIGITS, body,
        (jnp.zeros(jnp.shape(index), jnp.float32),
         jnp.broadcast_to(inv_base, jnp.shape(index)), index))
    # scrambling maps digit 0 -> nonzero: the tail of zero digits adds the
    # constant perm(0) * geometric series — fold it in analytically
    zero_digit = _perm(jnp.uint32(0), base, key).astype(jnp.float32)
    tail = zero_digit * inv / (1.0 - inv_base)
    return jnp.clip(value + tail, 0.0, 1.0 - 1e-7)
