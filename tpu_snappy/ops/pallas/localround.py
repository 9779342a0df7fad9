"""Pallas TPU kernel: one PARALLEL tile-local pointer-doubling round.

The tile-sequential resolve tail (ops/pallas/tiledres.py) interleaves two
phases per tile: LOCAL doubling rounds to the tile-local fixpoint and one
ABSORB gather from the resolved plane P. Only the absorb has a serial
dependency (P rows of earlier tiles); the local rounds of different tiles
are INDEPENDENT — but inside the tail kernel they still execute serially,
tile after tile, at the measured ~8 us/one-hot-op in-kernel floor.

This kernel hoists the local rounds out: one dispatched grid pass runs a
single in-tile doubling round for ALL tiles at once (grid over tiles,
Mosaic-pipelined). Its one-hot is TILE-diagonal — each target gathers only
from its own tile's rows — so a round costs tr/HI (= 1/16 at 4 K tiles)
of a dense round's MACs and build volume. Out-of-tile lanes pass through
unchanged (they are strictly-left pointers, the absorb's job).

After rounds reach the all-tile local fixpoint, the tail kernel runs with
`resolved=True` (locals skipped, absorbs only): exactness is unchanged —
in-tile lanes now point at in-tile literals (P rows still literal when
their tile absorbs), out-of-tile lanes read already-final P rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
LO = 128
TILE = 4096


def _make_kernel(tile: int):
    tr = tile // LO

    def kernel(src_ref, out_ref):
        t = pl.program_id(0)
        base = t * tile
        s1 = src_ref[:]  # (tr, LO) i32, src[p] <= p => in-tile d < tile
        d = s1 - base
        in_t = d >= 0
        dc = jnp.where(in_t, d, 0)
        h_oh = ((dc >> 7)[:, :, None] ==
                jax.lax.broadcasted_iota(jnp.int32, (tr, LO, tr), 2)
                ).astype(jnp.bfloat16)
        l_oh = ((dc & 127)[:, :, None] ==
                jax.lax.broadcasted_iota(jnp.int32, (tr, LO, LO), 2)
                ).astype(jnp.float32)
        # Pre-scaled 8-bit limbs of the tile's own state (bf16-exact;
        # f32 accumulation exact below 2^24 — see ops/pallas/gather.py).
        z = (jax.lax.dot_general(
                h_oh, (s1 & 0xFF00).astype(jnp.bfloat16),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
             + jax.lax.dot_general(
                h_oh, (s1 & 0x00FF).astype(jnp.bfloat16),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        g = jnp.sum(z * l_oh, axis=2).astype(jnp.int32)
        out_ref[:] = jnp.where(in_t, g, s1)

    return kernel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("tile",))
def local_round(src: jax.Array, tile: int = TILE) -> jax.Array:
    """One in-tile doubling round over all tiles in parallel:
    out[p] = src[src[p]] where src[p] >= tile_start(p), else src[p].
    src: (65536,) int32 with src[p] <= p. Bit-compatible with the tail
    kernel's local rounds (same fixpoint)."""
    assert N % tile == 0 and tile % LO == 0, tile
    tr = tile // LO
    out = pl.pallas_call(
        _make_kernel(tile),
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((tr, LO), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, LO), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // LO, LO), jnp.int32),
        interpret=_interpret(),
    )(src.reshape(N // LO, LO))
    return out.reshape(N)
