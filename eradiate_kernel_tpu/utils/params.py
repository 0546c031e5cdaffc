"""Differentiable scene-parameter access — the ``traverse``/ParameterMap
analog (reference: src/python/python/util.py:14-140).

The reference walks the object graph collecting named differentiable
parameters; here the Scene already *is* a pytree, so traversal is a flatten
with path-derived keys. ``keep()`` filters; ``update()`` writes values back
into a new Scene (functional — the old scene is untouched, as JAX requires).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


class ParameterMap:
    """Dict-like view of a Scene's differentiable parameters."""

    def __init__(self, scene, keys=None):
        self._scene = scene
        leaves, self._treedef = jax.tree_util.tree_flatten_with_path(scene)
        self._paths = {}
        self._values = {}
        for path, leaf in leaves:
            key = _path_str(path)
            self._paths[key] = path
            self._values[key] = leaf
        self._kept = set(keys) if keys is not None else set(self._values)

    def keys(self):
        return [k for k in self._values if k in self._kept]

    def items(self):
        return [(k, self._values[k]) for k in self.keys()]

    def __contains__(self, key):
        return key in self._values

    def __getitem__(self, key):
        return self._values[key]

    def __setitem__(self, key, value):
        old = self._values[key]
        self._values[key] = jnp.asarray(value, old.dtype).reshape(old.shape)

    def keep(self, keys):
        """Restrict the trainable set (util.py ParameterMap.keep)."""
        if isinstance(keys, str):
            keys = [k for k in self._values if keys in k]
        missing = [k for k in keys if k not in self._values]
        if missing:
            raise KeyError(f"unknown parameter(s): {missing}; "
                           f"available: {list(self._values)[:20]}...")
        self._kept = set(keys)
        return self

    def scene(self):
        """Rebuild the Scene with current values (parameters_changed analog)."""
        leaves = [self._values[k] for k in self._values]
        return jax.tree_util.tree_unflatten(self._treedef, leaves)

    # --- functional helpers for optimization loops ---------------------------
    def trainable(self):
        """The kept subset as a plain dict (a pytree for jax.grad)."""
        return {k: self._values[k] for k in self.keys()}

    def with_trainable(self, values: dict):
        """Scene with the kept subset replaced by ``values`` (traceable)."""
        merged = dict(self._values)
        merged.update(values)
        leaves = [merged[k] for k in self._values]
        return jax.tree_util.tree_unflatten(self._treedef, leaves)


def traverse(scene) -> ParameterMap:
    return ParameterMap(scene)
