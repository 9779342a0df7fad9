"""Pallas TPU kernels: whole-block prefix scans (cumsum, next-set-position).

The emission pass computes byte offsets with an exclusive cumsum and literal
run extents with a reverse cummin (scan.next_element_start); the decoder's
element table needs the same cumsum for output positions. The hypothesis was
that XLA's log-depth associative scans round-trip HBM per tree level and a
VMEM-resident single pass would win like ffill.py did (~4x).

**Measured: a WASH (not wired on the hot path).** On v5e, standalone at
(8, 64K) both forms sit at the dispatch floor (~147 us/block), and swapping
them into encode emission + decode parse moves end-to-end within noise
(encode 1019.8 vs 1022.7, decode 1383.4 vs 1391.0 us/block, same warm job).
Unlike the multi-payload ffill (5 fused scans), a single cumsum is cheap
enough that XLA's fused form is already fine. Kept tested
(tests/test_pallas.py) as the building block for future VMEM-resident
fusions; the codec paths use ops/scan.py.

Roll decomposition over the row-major (R, 128) layout: a flattened shift by
s < 128 is a lane roll patched with the neighbouring row's wrap-around
(ffill.py docstring); shifts that are multiples of 128 are sublane rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _rollf(x: jax.Array, s: int) -> jax.Array:
    """Roll a (R, 128) array by +s flattened positions: y[i] = x[i-s]."""
    if s % LANES == 0:
        return pltpu.roll(x, s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, s, axis=1)
    zc = pltpu.roll(z, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, z, zc)


def _rollb(x: jax.Array, s: int) -> jax.Array:
    """Roll a (R, 128) array by -s flattened positions: y[i] = x[i+s]."""
    rows = x.shape[0]
    if s % LANES == 0:
        return pltpu.roll(x, rows - s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, LANES - s, axis=1)
    zc = pltpu.roll(z, rows - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, z, zc)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _levels(m: int) -> int:
    return max(1, (m - 1).bit_length())


def _cumsum_kernel(levels: int):
    def kernel(x_ref, out_ref):
        v = x_ref[:]
        gidx = (jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) * v.shape[1]
                + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1))
        for lvl in range(levels):
            s = 1 << lvl
            v = v + jnp.where(gidx >= s, _rollf(v, s), 0)
        out_ref[:] = v

    return kernel


@jax.jit
def cumsum_block(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum over a flat int32 array (length multiple of 128).
    Callers derive the exclusive form as `inc - x` and totals as inc[-1]."""
    m = x.shape[-1]
    rows = m // LANES
    spec = pl.BlockSpec((rows, LANES), lambda: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _cumsum_kernel(_levels(m)),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=_interpret(),
    )(x.reshape(rows, LANES).astype(jnp.int32))
    return out.reshape(m)


def _next_start_kernel(levels: int, default: int):
    def kernel(flag_ref, out_ref):
        f = flag_ref[:]
        shape = f.shape
        gidx = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * shape[1]
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        m = shape[0] * shape[1]
        v = jnp.where(f != 0, gidx, jnp.int32(default))
        # Strictly-next: start from the successor position's value.
        v = jnp.where(gidx < m - 1, _rollb(v, 1), jnp.int32(default))
        for lvl in range(levels):
            s = 1 << lvl
            v = jnp.minimum(v, jnp.where(gidx < m - s, _rollb(v, s),
                                         jnp.int32(default)))
        out_ref[:] = v

    return kernel


@functools.partial(jax.jit, static_argnames=("default",))
def next_start_block(flags: jax.Array, default: int) -> jax.Array:
    """For each i, the smallest j > i with flags[j], else `default`
    (scan.next_element_start's VMEM-resident form)."""
    m = flags.shape[-1]
    rows = m // LANES
    spec = pl.BlockSpec((rows, LANES), lambda: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _next_start_kernel(_levels(m), default),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=_interpret(),
    )(flags.reshape(rows, LANES).astype(jnp.int32))
    return out.reshape(m)
