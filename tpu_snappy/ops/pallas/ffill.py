"""Pallas TPU kernel: multi-payload forward-fill (segmented broadcast).

The decoder spreads element metadata across the bytes/output positions each
element covers via forward-fills from tag positions. As XLA associative
scans these round-trip HBM per tree level; here the whole array lives in
VMEM and the 17 Hillis-Steele levels are register/VMEM traffic only.

A flattened roll by s over a row-major (R, 128) layout decomposes as a lane
roll plus a row-carry select:

    y[r, c] = x[r, c-s]            for c >= s
            = x[r-1, 128+c-s]      for c <  s   (previous row's tail)

which is roll(x, s, axis=1) patched with roll(.., 1, axis=0) on the first s
lanes. Shifts >= 128 (multiples of 128) are pure sublane rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _rollf(x: jax.Array, s: int) -> jax.Array:
    """Roll a (R, 128) array by s positions in flattened row-major order."""
    if s % LANES == 0:
        return pltpu.roll(x, s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, s, axis=1)
    zc = pltpu.roll(z, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, z, zc)


def _make_kernel(n_vals: int, levels: int):
    def kernel(*refs):
        mask_ref = refs[0]
        val_refs = refs[1:1 + n_vals]
        out_refs = refs[1 + n_vals:]

        # Mask stays int32: Mosaic's rotate doesn't support sub-32-bit data.
        m = (mask_ref[:] != 0).astype(jnp.int32)
        vals = [r[:] for r in val_refs]
        rows, lanes = m.shape
        gidx = (jax.lax.broadcasted_iota(jnp.int32, m.shape, 0) * lanes
                + jax.lax.broadcasted_iota(jnp.int32, m.shape, 1))
        for lvl in range(levels):
            s = 1 << lvl
            ms = jnp.where(gidx >= s, _rollf(m, s), 0)
            take = ((1 - m) * ms) == 1
            vals = [jnp.where(take, _rollf(v, s), v) for v in vals]
            m = jnp.maximum(m, ms)
        for r, v in zip(out_refs, vals):
            r[:] = v

    return kernel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("max_gap",))
def ffill_block(mask: jax.Array, *vals: jax.Array, max_gap: int | None = None):
    """Forward-fill vals from the latest true mask position (flattened
    order). mask: (M,) bool/int32, M a multiple of 128. Positions before the
    first true mask keep their original entries. max_gap: caller-proven
    bound on the distance to the nearest set mask behind any position
    (e.g. the sidecar's split pieces guarantee <= SPLIT_LEN) — cuts the
    Hillis-Steele levels from log2(M) to log2(max_gap). Returns filled
    arrays."""
    m = mask.shape[-1]
    rows = m // LANES
    levels = max(1, ((max_gap if max_gap is not None else m) - 1)
                 .bit_length())
    shaped = [v.reshape(rows, LANES).astype(jnp.int32) for v in vals]
    spec = pl.BlockSpec((rows, LANES), lambda: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(len(vals), levels),
        in_specs=[spec] * (1 + len(vals)),
        out_specs=[spec] * len(vals),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * len(vals),
        interpret=_interpret(),
    )(mask.reshape(rows, LANES).astype(jnp.int32), *shaped)
    if len(vals) == 1:
        return (outs[0].reshape(m),)
    return tuple(o.reshape(m) for o in outs)
