"""Pallas TPU kernel: monotone-destination byte placement (encode emission).

Replaces the 2N-entry placement sort at the end of encode_block (the
TPU-native stand-in for the RTL's streamHolder serialization + emptySpotAddr
back-patching, CompressionAccelerator.scala:230-285). Both emission lanes
have *nondecreasing* destinations — header bytes land at exclusive-scan
offsets, literal payload at run-base + position — and Snappy's element
economics bound the output bytes per source position by ~1 (copies: <=3
bytes per >=4 positions; literal runs: ~(len+3)/len bytes per position). So
a tile of 1024 consecutive sources writes into a window of at most ~1.1 KB
of the output stream.

The kernel exploits that: per source tile it builds one-hots only over a
W=32-row (4 KB) window anchored at the tile's minimum destination and
accumulates the (W, 128) MXU contribution into VMEM scratch at a dynamic
row offset — ~16x less one-hot/matmul work than a full-height scatter
(scatter.py) and no sort. Byte values (< 256) are bf16-exact, so a single
limb suffices (see gather.py for the MXU rounding rule).

A violation of the window contract (destinations in one tile spanning more
than W*128 - 1024 bytes) cannot happen for encoder-produced lanes, but is
counted and returned so tests can assert the contract instead of trusting
this analysis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO = 128
W = 32           # window rows per tile: 4 KB >> worst-case ~1.1 KB span + 1 KB align slop
TR, TC = 8, 128  # sources per grid step
SENT = 1 << 20   # inactive-destination sentinel (any value >= out capacity)


def _make_kernel(out_rows: int):
    cap = out_rows * LO

    def kernel(dest_ref, val_ref, out_ref, ovf_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            ovf_ref[0, 0] = 0

        dest = dest_ref[:]
        active = dest < cap
        m = jnp.min(jnp.where(active, dest, SENT))

        @pl.when(m < cap)
        def _():
            # Window base row: tile-min destination aligned down to 8 rows
            # (f32 sublane tile), clamped so the window stays in range.
            base = jnp.minimum((m >> 10) << 3, out_rows - W)
            rel = (dest >> 7) - base
            rel = jnp.where(active, rel, W)  # inactive: matches no window row
            lo = dest & (LO - 1)
            ovf_ref[0, 0] += jnp.sum(((rel >= W) & active).astype(jnp.int32))

            w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, TC), 0)
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (LO, TC), 0)
            contrib = jnp.zeros((W, LO), jnp.float32)
            # Mosaic wants a single contracting dim: go one 128-source row at
            # a time, one-hots built in (window_row, source) orientation.
            # bf16 one-hots/values: exact (0/1 times bytes < 256) and half
            # the build cost of f32 — A/B'd 155 vs 204 us/block against the
            # placement sort on emission-shaped lanes.
            for r in range(TR):
                hi_oh = (rel[r:r + 1, :] == w_iota).astype(jnp.bfloat16)
                lov = ((lo[r:r + 1, :] == lo_iota).astype(jnp.bfloat16)
                       * val_ref[r:r + 1, :].astype(jnp.bfloat16))
                contrib += jax.lax.dot_general(
                    hi_oh, lov,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (W, LO)
            acc_ref[pl.ds(base, W), :] += contrib

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(jnp.int32)

    return kernel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("out_rows",))
def place_block(dest: jax.Array, values: jax.Array, out_rows: int):
    """out[dest[p]] = values[p] for monotone-windowed destinations.

    dest: (M,) int32, M a multiple of 1024; active destinations in
    [0, out_rows*128), inactive >= out_rows*128 (use SENT). Within each
    aligned 1024-source tile, active destinations must span < W*128 - 1024
    bytes (the encoder's emission lanes satisfy this by construction).
    values: (M,) int32 byte values < 256. Destinations must be unique.

    Returns (out (out_rows*128,) int32 bytes, unwritten cells 0;
    overflow scalar int32 — count of window-contract violations, 0 in
    correct use; violated writes are dropped, not misplaced).
    """
    m = dest.shape[-1]
    d2 = dest.reshape(m // TC, TC)
    v2 = values.astype(jnp.float32).reshape(m // TC, TC)
    tile = pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out, ovf = pl.pallas_call(
        _make_kernel(out_rows),
        grid=(m // (TR * TC),),
        in_specs=[tile, tile],
        out_specs=[
            pl.BlockSpec((out_rows, LO), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LO), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((out_rows, LO), jnp.float32)],
        interpret=_interpret(),
    )(d2, v2)
    return out.reshape(out_rows * LO), ovf[0, 0]
