"""Pallas TPU kernel: anchored windowed gather for early pointer-doubling
rounds (decode copy-chain resolve).

The full-table one-hot gather is MXU-MAC-bound at targets x table-size per
limb (~89 us/round after the int8 path). But the resolve's EARLY rounds are
local: single Snappy hops are rarely > 2.4 KB (94% of round-1 hops fall
within 16 KB on mtg text — composition only grows them later), and a copy's
source always lies BELOW its own position. So each 4096-target tile gathers
from a 2*WR-row (8192-element) window of the table anchored just under the
tile's maximum source row — WINDOW/65536 of the dense MAC work — with the
anchor row fed per tile through Mosaic scalar prefetch (the data-dependent
BlockSpec index_map the static-window form ops/pallas/gatherw.py lacks;
that form ships K overlapping chunk views per step and measured overhead-
bound at ~110-125 us/round).

Out-of-window sources simply do not advance (out[p] = idx[p]) and are
REPORTED per tile: a windowed round is an exact doubling step where it
fires and a no-op where it doesn't, so the trailing dense rounds finish
stragglers — but the caller MUST treat non-advanced out-of-window lanes as
still-moving (the sparse resolve extracts by moved-mask; a windowed no-op
is not a fixpoint proof the way a dense no-op is — see decode.py).

Same decode role as ops/pallas/gather.py; the reference never built decode
at all (funct=1 is a stub, CompressionAccelerator.scala:385-388).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
LO = 256
ROWS = N // LO          # 256 table rows
WR = 16                 # window block = 16 rows x 256 = 4096 elements;
                        # two consecutive blocks -> 8192-element window
NBLK = ROWS // WR       # 16 anchor positions (0..14 usable)
TR, TC = 32, 128        # 4096 targets per grid step (matches gather.py)


def _kernel(anc_ref, x0a, x0b, x1a, x1b, idx_ref, out_ref, win_ref):
    i = pl.program_id(0)
    base = anc_ref[i] * WR  # window start row
    idx = idx_ref[:]
    rel = (idx >> 8) - base
    inwin = (rel >= 0) & (rel < 2 * WR)
    relc = jnp.where(inwin, rel, 0)
    lo = idx & (LO - 1)

    hi_oh = (relc[:, :, None] ==
             jax.lax.broadcasted_iota(jnp.int32, (TR, TC, 2 * WR), 2)
             ).astype(jnp.int8)
    lo_oh = (lo[:, :, None] ==
             jax.lax.broadcasted_iota(jnp.int32, (TR, TC, LO), 2)
             ).astype(jnp.float32)

    # int8 row gathers over the window (see gather.py for the bias/combine
    # scheme: tables carry limb-128; partials combine before one select).
    zc = None
    bias = 0
    for xa, xb in ((x0a, x0b), (x1a, x1b)):
        xw = jnp.concatenate([xa[:], xb[:]], axis=0)  # (2*WR, LO) int8
        z = jax.lax.dot_general(
            hi_oh, xw,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (TR, TC, LO)
        zc = z if zc is None else (zc << 8) + z
        bias = (bias << 8) + 128
    val = (jnp.sum(zc.astype(jnp.float32) * lo_oh, axis=2)
           .astype(jnp.int32) + bias)
    out_ref[:] = jnp.where(inwin, val, idx)
    win_ref[:] = inwin.astype(jnp.int32)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@jax.jit
def gather_window_anchored(x: jax.Array, idx: jax.Array):
    """One anchored-window doubling step: y[p] = x[idx[p]] where idx[p]
    falls in p's tile window, else idx[p]; also returns inwin (N,) int32.
    x, idx: (N,) int32 (16-bit values). The window of a 4096-target tile is
    the 8192 table elements [anchor*4096, anchor*4096 + 8192) with
    anchor = min(max(idx) >> 12, 14) over the tile — always covering the
    tile's maximum source."""
    assert x.shape[-1] == N and idx.shape[-1] == N
    anchors = jnp.minimum(
        jnp.max(idx.reshape(N // (TR * TC), TR * TC), axis=-1) >> 12,
        NBLK - 2).astype(jnp.int32)
    xs = [((((x >> (8 * (1 - j))) & 0xFF) - 128)
           .reshape(ROWS, LO).astype(jnp.int8)) for j in range(2)]
    idx2 = idx.reshape(N // TC, TC)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // (TR * TC),),
        in_specs=[
            pl.BlockSpec((WR, LO), lambda i, anc: (anc[i], 0)),
            pl.BlockSpec((WR, LO), lambda i, anc: (anc[i] + 1, 0)),
            pl.BlockSpec((WR, LO), lambda i, anc: (anc[i], 0)),
            pl.BlockSpec((WR, LO), lambda i, anc: (anc[i] + 1, 0)),
            pl.BlockSpec((TR, TC), lambda i, anc: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TR, TC), lambda i, anc: (i, 0)),
            pl.BlockSpec((TR, TC), lambda i, anc: (i, 0)),
        ],
    )
    out, win = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N // TC, TC), jnp.int32)] * 2,
        interpret=_interpret(),
    )(anchors, xs[0], xs[0], xs[1], xs[1], idx2)
    return out.reshape(N), win.reshape(N)
