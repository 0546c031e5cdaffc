"""Inverse-rendering utilities — the mitsuba.python.autodiff analog
(reference: src/python/python/autodiff.py).

The reference re-implements the wavefront loop in Python and differentiates
with Enoki's tape (autodiff.py:6-91); here the whole renderer is already a
pure JAX program, so ``jax.grad`` flows through ``integrators.render``
directly. This module adds the reference's user-facing pieces:

- ``render``: differentiable render of a Scene with a trainable-parameter
  dict, with the ``unbiased`` primal/derivative decorrelation option
  (autodiff.py:121-194 — primal image from one seed, adjoint computed
  through an independently-seeded render so gradient noise is uncorrelated
  with the image).
- ``SGD`` / ``Adam``: ParameterMap-driven optimizers (autodiff.py:197-378).
- ``render_torch``: torch.autograd bridge (autodiff.py:381-483) so torch
  optimization loops can consume the JAX renderer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import integrators
from .params import ParameterMap, traverse

__all__ = ["render", "SGD", "Adam", "render_torch", "traverse",
           "ParameterMap"]


def _render_trainable(trainable, pm: ParameterMap, seed, spp,
                      samples_per_pass=None, regen=False):
    scene = pm.with_trainable(trainable)
    return integrators.render(scene, seed=seed, spp=spp,
                              samples_per_pass=samples_per_pass, regen=regen)


def _unbiased_fn(pm: ParameterMap, regen=False):
    """Per-ParameterMap custom_vjp closure. The map holds the scene's device
    arrays, so it must NOT live in nondiff_argnums (JAX forbids array-valued
    static args); closing over it keeps it a concrete capture while the
    cached function object keeps jit retracing stable across optimizer
    iterations. ``regen=True`` routes both passes through the regenerating
    driver (primal film from its fast while-loop, adjoint via the
    path-replay backward, integrators/replay.py)."""
    attr = "_unbiased_render_fn_regen" if regen else "_unbiased_render_fn"
    fn = getattr(pm, attr, None)
    if fn is not None:
        return fn

    @partial(jax.custom_vjp, nondiff_argnums=(2,))
    def fn(trainable, seed, spp):
        # seed is a TRACED uint32 (a static seed would recompile the whole
        # render every optimization iteration — 300x slower in practice)
        return _render_trainable(trainable, pm, seed, spp, regen=regen)

    def fwd(trainable, seed, spp):
        img = _render_trainable(trainable, pm, seed, spp, regen=regen)
        return img, (trainable, seed)

    def bwd(spp, res, ct):
        # adjoint through a decorrelated render (autodiff.py:142-157): the
        # gradient estimate is unbiased even when multiplied with the primal
        # image inside the loss (E[g(X) f(Y)] = E[g] E[f] for X indep. of Y)
        trainable, seed = res
        _, vjp = jax.vjp(
            lambda tr: _render_trainable(
                tr, pm, seed + jnp.uint32(0x9E3779B9), spp, regen=regen),
            trainable)
        (g,) = vjp(ct)
        import numpy as _np
        seed_ct = _np.zeros(jnp.shape(seed), jax.dtypes.float0)
        return (g, seed_ct)

    fn.defvjp(fwd, bwd)
    setattr(pm, attr, fn)
    return fn


def render(scene_or_pm, params=None, seed=0, spp=None, unbiased=False,
           regen=False):
    """Differentiable render.

    scene_or_pm: Scene or ParameterMap. ``params``: optional trainable dict
    {key: array} overriding the map's kept parameters (this is what you
    differentiate with ``jax.grad``). ``unbiased=True`` decorrelates the
    primal image from the gradient pass. ``regen=True`` uses the fast
    regenerating driver for BOTH the primal and the gradient (path-replay
    backward, integrators/replay.py) — exact for value-class parameters
    (volumes, textures, albedos, emitters, spectra); trajectory-class
    parameters (shape vertices, transforms, sensor pose) need the
    default scan driver's attached derivatives.
    """
    pm = scene_or_pm if isinstance(scene_or_pm, ParameterMap) \
        else traverse(scene_or_pm)
    trainable = params if params is not None else pm.trainable()
    if unbiased:
        return _unbiased_fn(pm, regen=regen)(trainable, jnp.uint32(seed), spp)
    return _render_trainable(trainable, pm, jnp.uint32(seed), spp,
                             regen=regen)


# =============================================================================
# Optimizers (autodiff.py:197-378) — functional JAX state, ParameterMap API
# =============================================================================

class Optimizer:
    """Holds the trainable dict + per-parameter state; ``step(grads)``
    returns nothing but updates ``self.params`` (host-side loop driver, the
    inner math is jitted)."""

    def __init__(self, params: dict, lr: float):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.lr = lr
        self.state = {}

    def items(self):
        return self.params.items()

    def __getitem__(self, k):
        return self.params[k]

    def __setitem__(self, k, v):
        self.params[k] = jnp.asarray(v, self.params[k].dtype) \
            .reshape(self.params[k].shape)

    # --- checkpointing (orbax-style pytrees; npz on disk) ---------------------
    def state_dict(self):
        import numpy as np
        out = {f"param:{k}": np.asarray(v) for k, v in self.params.items()}
        for k, v in self.state.items():
            leaves = v if isinstance(v, tuple) else (v,)
            for i, leaf in enumerate(leaves):
                out[f"state:{k}:{i}"] = np.asarray(leaf)
        out["t"] = np.asarray(getattr(self, "t", 0))
        return out

    def save(self, path: str):
        """Checkpoint to .npz (render-loop resume, SURVEY §5.4)."""
        import numpy as np
        np.savez(path, **self.state_dict())

    def load(self, path: str):
        import numpy as np
        data = np.load(path)
        for k in list(self.params):
            self.params[k] = jnp.asarray(data[f"param:{k}"])
        for k in list(self.state):
            v = self.state[k]
            if isinstance(v, tuple):
                self.state[k] = tuple(
                    jnp.asarray(data[f"state:{k}:{i}"])
                    for i in range(len(v)))
            else:
                self.state[k] = jnp.asarray(data[f"state:{k}:0"])
        if "t" in data:
            self.t = int(data["t"])


class SGD(Optimizer):
    """SGD with optional momentum (autodiff.py SGD)."""

    def __init__(self, params, lr, momentum=0.0):
        super().__init__(params, lr)
        self.momentum = momentum
        if momentum > 0:
            self.state = {k: jnp.zeros_like(v) for k, v in params.items()}

    def step(self, grads: dict):
        for k, g in grads.items():
            if self.momentum > 0:
                self.state[k] = self.momentum * self.state[k] + g
                g = self.state[k]
            self.params[k] = self.params[k] - self.lr * g


class Adam(Optimizer):
    """Adam (autodiff.py Adam; Kingma & Ba 2015)."""

    def __init__(self, params, lr, beta_1=0.9, beta_2=0.999, epsilon=1e-8):
        super().__init__(params, lr)
        self.beta_1, self.beta_2, self.epsilon = beta_1, beta_2, epsilon
        self.t = 0
        self.state = {k: (jnp.zeros_like(v), jnp.zeros_like(v))
                      for k, v in params.items()}

    def step(self, grads: dict):
        self.t += 1
        lr_t = self.lr * (1 - self.beta_2 ** self.t) ** 0.5 \
            / (1 - self.beta_1 ** self.t)
        for k, g in grads.items():
            m, v = self.state[k]
            m = self.beta_1 * m + (1 - self.beta_1) * g
            v = self.beta_2 * v + (1 - self.beta_2) * g * g
            self.state[k] = (m, v)
            self.params[k] = self.params[k] \
                - lr_t * m / (jnp.sqrt(v) + self.epsilon)


# =============================================================================
# torch bridge (autodiff.py:381-483)
# =============================================================================

def render_torch(scene_or_pm, params: dict, seed=0, spp=None, unbiased=True,
                 regen=False):
    """Render to a torch tensor with autograd support: gradients flow from a
    torch loss back into the torch parameter tensors via the JAX vjp."""
    import numpy as np
    import torch

    pm = scene_or_pm if isinstance(scene_or_pm, ParameterMap) \
        else traverse(scene_or_pm)

    class _RenderFn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *values):
            keys = list(params.keys())
            trainable = {k: jnp.asarray(np.asarray(v.detach()))
                         for k, v in zip(keys, values)}
            img, vjp = jax.vjp(
                lambda tr: render(pm, tr, seed=seed, spp=spp,
                                  unbiased=unbiased, regen=regen), trainable)
            ctx.vjp = vjp
            ctx.keys = keys
            return torch.from_numpy(np.asarray(img))

        @staticmethod
        def backward(ctx, ct):
            (g,) = ctx.vjp(jnp.asarray(np.asarray(ct)))
            return tuple(torch.from_numpy(np.asarray(g[k]))
                         for k in ctx.keys)

    return _RenderFn.apply(*params.values())
