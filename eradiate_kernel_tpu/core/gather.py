"""TPU-friendly gathers.

XLA lowers `table[idx]` gathers on TPU to slow serialized loads (~ms for a
100k-lane wavefront even on tiny tables), while elementwise VPU work is
~1000x faster. Every registry lookup in this framework (kind/slot tables,
per-object parameter rows) is a gather from a table with only a handful of
rows — exactly the case where a one-hot select beats the native gather by
orders of magnitude:

    out[n] = sum_r (idx[n] == r) * table[r]      # R fused VPU selects

`table_gather` switches on a static row-count threshold; the one-hot path is
exact for every dtype (each lane sums one table row and zeros).
"""

from __future__ import annotations

import jax.numpy as jnp

# one-hot select wins up to surprisingly large row counts (measured ~10-20x
# vs the native gather at R=256 on v5e); beyond this the (lanes, R)
# reduction starts to dominate
ONE_HOT_MAX_ROWS = 512


def table_gather(table, idx, max_rows: int = ONE_HOT_MAX_ROWS):
    """``table[idx]`` with a one-hot VPU path for small tables.

    table: (R, ...) array; idx: integer array of any shape. Returns
    table[idx] with shape idx.shape + table.shape[1:]. The one-hot select
    is exact for every dtype (each lane sums one table row and zeros) and
    fuses into neighboring elementwise work, unlike the native gather.
    """
    R = table.shape[0]
    if R == 0 or R > max_rows:
        return table[idx]
    if R == 1:
        return jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    r_ids = jnp.arange(R, dtype=idx.dtype)
    oh = idx[..., None] == r_ids                      # (..., R)
    oh = oh[(...,) + (None,) * (table.ndim - 1)]      # (..., R, 1...)
    flat = table[(None,) * idx.ndim]                  # (1..., R, ...)
    return jnp.sum(jnp.where(oh, flat, 0), axis=idx.ndim)


def index_channel(values, channel):
    """values[..., channel] per lane (the volpath hero-channel select) as a
    one-hot sum over the (tiny) channel axis — no take_along_axis gather."""
    C = values.shape[-1]
    oh = (jnp.arange(C, dtype=channel.dtype) == channel[..., None])
    return jnp.sum(jnp.where(oh, values, 0), axis=-1)


def select_along_axis(values, idx):
    """take_along_axis(values, idx[..., None], -1)[..., 0] via one-hot sum —
    for small trailing axes (closest-hit reductions over prims/channels)."""
    C = values.shape[-1]
    oh = (jnp.arange(C, dtype=idx.dtype) == idx[..., None])
    return jnp.sum(jnp.where(oh, values, 0), axis=-1)
