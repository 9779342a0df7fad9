"""Pallas TPU kernel: windowed dynamic gather for pointer-doubling rounds.

A full 64K one-hot gather costs 64K x 64K MACs no matter how the index is
split (the hi contraction always multiplies every table row into every
target): ~44 us/limb of pure MXU at v5e bf16 peak, measured ~121 us/round
for the decoder's 2-limb pointer doubling. But chain pointers are LOCAL
early on — the first doubling round's hops are 94% within 16 KB on mtg
text (single Snappy hops are rarely >2.4 KB; only round composition grows
them) — so the early rounds can gather from a sliding window of the table
at rows x window MAC cost: 4x cheaper at 16 KB, 2x at 32 KB.

Mechanically the window rides the grid pipeline: the table is passed as K
overlapping chunk views (BlockSpec index maps `max(0, i - (K-1-j))`), so
each grid step sees the K chunks ending at its own position tile, and
Mosaic double-buffers them like any other operand. Out-of-window targets
simply don't advance that round (`out[p] = idx[p]`): a windowed round is
still an exact pointer-doubling step wherever it fires and a no-op where
it doesn't, so correctness is untouched — the decoder's trailing full
rounds (ops/decode.py) finish whatever stayed out of range.

Plays the same role as ops/pallas/gather.py (the decoder's only dynamic-
indexing engine; the reference RTL never built decode at all —
CompressionAccelerator.scala:385-388 stubs funct=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
TR, TC = 16, 128       # one grid step: a 16 x 128 = 2048-position tile
CHUNK = TR * TC        # table chunk size = position tile size (2 KB elems)
TILES = N // CHUNK     # 32


def _make_kernel(k: int, limbs: int):
    def kernel(*refs):
        x_refs = refs[:k]
        idx_ref, out_ref = refs[k], refs[k + 1]
        i = pl.program_id(0)
        idx = idx_ref[:]

        # Window = the K table chunks ending at this tile: global rows
        # [(i-K+1)*2048, (i+1)*2048). For i < K-1 the leading chunks are
        # clamped duplicates of chunk 0, but `local` for any idx >= 0 maps
        # past them into the correctly-placed trailing chunks, so they are
        # never addressed. idx <= position < (i+1)*2048 bounds the top.
        xw = jnp.concatenate([r[:] for r in x_refs], axis=0)  # (K*16, 128)
        local = idx - (i - (k - 1)) * CHUNK
        valid = local >= 0
        localc = jnp.where(valid, local, 0)
        hi = localc >> 7
        lo = localc & (TC - 1)

        hi_oh = (hi[:, :, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TR, TC, k * TR), 2)
                 ).astype(jnp.bfloat16)
        lo_oh = (lo[:, :, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TR, TC, TC), 2)
                 ).astype(jnp.bfloat16)

        def limb(xl):
            z = jax.lax.dot_general(
                hi_oh, xl,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TR, TC, TC)
            return jnp.sum(z * lo_oh.astype(jnp.float32), axis=2)

        res = limb((xw & 0xFF).astype(jnp.bfloat16)).astype(jnp.int32)
        for j in range(1, limbs):
            res |= limb(((xw >> (8 * j)) & 0xFF)
                        .astype(jnp.bfloat16)).astype(jnp.int32) << (8 * j)
        out_ref[:] = jnp.where(valid, res, idx)

    return kernel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("k", "limbs"))
def gather_window_block(x: jax.Array, idx: jax.Array, k: int,
                        limbs: int = 2) -> jax.Array:
    """y[p] = x[idx[p]] where idx[p] falls in the k*2048-element window
    ending at p's 2048-tile, else y[p] = idx[p] (no advance). Requires
    idx[p] <= p (chain pointers always point backward). x, idx: (65536,)
    int32; values must fit 8*limbs bits. k in {8, 16} keeps the MXU
    contraction at a native 128/256 width."""
    x2 = x.reshape(N // TC, TC)
    idx2 = idx.reshape(N // TC, TC)
    chunk = [pl.BlockSpec(
        (TR, TC),
        functools.partial(
            lambda i, j: (jnp.maximum(0, i - (k - 1 - j)), 0), j=j),
        memory_space=pltpu.VMEM) for j in range(k)]
    tile = pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(k, limbs),
        grid=(TILES,),
        in_specs=chunk + [tile],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((N // TC, TC), jnp.int32),
        interpret=_interpret(),
    )(*([x2] * k), idx2)
    return out.reshape(N)
