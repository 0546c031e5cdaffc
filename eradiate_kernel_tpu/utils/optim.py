"""Optimizers for inverse rendering — analog of mitsuba.python.autodiff
(src/python/python/autodiff.py:197-378 SGD/Adam on a ParameterMap).

Functional style: state is a pytree, ``step`` is jittable. These operate on
any parameter pytree (typically ``ParameterMap.trainable()``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SGD:
    """SGD with optional momentum (autodiff.py:240-280)."""

    def __init__(self, lr=0.1, momentum=0.0):
        self.lr = lr
        self.momentum = momentum

    def init(self, params):
        return jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(self, params, grads, state):
        if self.momentum == 0.0:
            new_params = jax.tree_util.tree_map(
                lambda p, g: p - self.lr * g, params, grads)
            return new_params, state
        new_state = jax.tree_util.tree_map(
            lambda v, g: self.momentum * v + g, state, grads)
        new_params = jax.tree_util.tree_map(
            lambda p, v: p - self.lr * v, params, new_state)
        return new_params, new_state


class Adam:
    """Adam (autodiff.py:283-378)."""

    def __init__(self, lr=0.01, beta_1=0.9, beta_2=0.999, epsilon=1e-8):
        self.lr = lr
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon

    def init(self, params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": zeros(), "v": zeros(), "t": jnp.zeros((), jnp.int32)}

    def step(self, params, grads, state):
        t = state["t"] + 1
        b1, b2 = self.beta_1, self.beta_2
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        lr_t = self.lr * jnp.sqrt(1 - b2 ** t.astype(jnp.float32)) \
            / (1 - b1 ** t.astype(jnp.float32))
        new_params = jax.tree_util.tree_map(
            lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + self.epsilon),
            params, m, v)
        return new_params, {"m": m, "v": v, "t": t}
