"""Probe which per-lane dynamic-gather formulations Mosaic can lower.

The 3-D-grid volpath is pinned by the XLA HBM-gather floor (~26-50 ns per
index at 32k lanes, PARITY r4); the candidate fix is a Pallas kernel that
keeps the whole grid (1 MB at 64^3 f32) VMEM-resident and does the
8-corner taps in-kernel. Arbitrary per-lane gathers are not first-class on
TPU, so this probes the candidate lowerings one by one on the live backend
(or CPU interpret with --interpret):

  a) fancy-index a VMEM ref with a traced index vector: tab_ref[idx]
  b) jnp.take(tab_ref[:], idx, axis=0)
  c) take_along_axis on a 2-D VMEM block along the sublane axis
  d) one-hot matmul fallback (always lowers; MXU cost O(V) per lane)

Usage: python tools/probe_pallas_gather.py [--interpret]
"""

import functools
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    os.environ["JAX_PLATFORMS"] = "cpu"
V, L = 4096, 1024


def probe(name, fn):
    try:
        out = jax.jit(fn)()
        out = np.asarray(out)
        ref = np.asarray(TAB)[np.asarray(IDX)]
        ok = np.allclose(out[: len(ref)].squeeze(), ref.squeeze())
        print(f"{name}: LOWERED, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED — {msg}")


rng = np.random.default_rng(0)
TAB = jnp.asarray(rng.random((V,)).astype(np.float32))
TAB2 = TAB.reshape(V // 128, 128)
IDX = jnp.asarray(rng.integers(0, V, L).astype(np.int32))


def k_fancy(tab_ref, idx_ref, out_ref):
    out_ref[:] = tab_ref[idx_ref[:]]


def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


def k_tala(tab_ref, idx_ref, out_ref):
    # gather along the minor (lane) axis of a 2-D block: for each output
    # lane j, pick tab2[r[j], c[j]] via take_along_axis on rows then select
    idx = idx_ref[:]
    r = idx // 128
    c = idx % 128
    rows = jnp.take(tab_ref[:], r, axis=0)          # (L, 128)
    out_ref[:] = jnp.take_along_axis(rows, c[:, None], axis=1)[:, 0]


def k_onehot(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, V // 128), 1)
    # two-level one-hot: row select via matmul, lane select via iota cmp
    r = idx // 128
    c = idx % 128
    oh = (cols == r[:, None]).astype(jnp.float32)   # (L, V/128)
    rows = jax.lax.dot_general(
        oh, tab_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (L, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 1)
    return out_ref.__setitem__(
        slice(None), jnp.sum(jnp.where(lane == c[:, None], rows, 0.0), -1))


def call(kernel, tab):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(tab, IDX)


print("backend:", jax.devices()[0].platform, "interpret:", INTERPRET)
probe("a_fancy_1d", functools.partial(call, k_fancy, TAB))
probe("b_take_1d", functools.partial(call, k_take, TAB))
probe("c_take_rows_then_lanes_2d", functools.partial(call, k_tala, TAB2))
probe("d_onehot_mxu_2d", functools.partial(call, k_onehot, TAB2))
