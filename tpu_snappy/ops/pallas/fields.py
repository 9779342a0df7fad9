"""Pallas TPU kernel: fused speculative element-field decode (gridded).

Computes decode._elem_fields — (size, outbytes, is_lit, hdr, offset) for
EVERY compressed byte position, as if each byte were a tag. The XLA version
materializes the four shifted byte streams plus ~10 intermediate (FRAG_CAP,)
i32 arrays through HBM and was measured at 0.217 ms/block (the bulk of the
decode parse, which the scan machinery itself finishes in ~0.07 ms).

The first kernel form here ran the whole 68 KB fragment as a single grid=1
VMEM block and measured SLOWER than XLA (0.667 ms/block): with one giant
block Mosaic cannot overlap HBM loads with compute. This version tiles the
fragment over a grid and feeds each step TWO views of the input — its own
tile and the next tile (wrapping at the fragment end) — so the 4-byte
lookahead crosses tile boundaries exactly the way jnp.roll wraps, while
Mosaic double-buffers tiles through VMEM. Bit-identical to the XLA path.

Plays the role the reference's (stubbed) decode datapath would have needed:
the tag-byte field extraction of CompressionAccelerator.scala's funct=1
path (never implemented there, CompressionAccelerator.scala:385-388).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAG_CAP = 68 * 1024
LANES = 128
TR = 16  # rows per grid step (16 x 128 = 2048 positions)


def _rollb_ext(x, s):
    """y[i] = x[i + s] over a flattened (TR+halo, LANES) block; only the
    first TR rows of the result are consumed, so the block-level wrap is
    harmless."""
    assert 0 < s < LANES
    rows = x.shape[0]
    z = pltpu.roll(x, LANES - s, axis=1)
    zc = pltpu.roll(z, rows - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, z, zc)


def _kernel(c_ref, nxt_ref, size_ref, outb_ref, islit_ref, hdr_ref, off_ref):
    # Extended tile: TR rows + an 8-row halo from the next tile (the roll
    # lookahead needs only 4 bytes; 8 rows is the f32/i32 sublane tile).
    t = jnp.concatenate(
        [c_ref[:], nxt_ref[0:8, :]], axis=0).astype(jnp.int32)
    b1 = _rollb_ext(t, 1)
    b2 = _rollb_ext(t, 2)
    b3 = _rollb_ext(t, 3)
    b4 = _rollb_ext(t, 4)
    t, b1, b2, b3, b4 = (a[:TR] for a in (t, b1, b2, b3, b4))
    kind = t & 3
    code = t >> 2

    extra = jnp.clip(code - 59, 0, 4)
    ext_val = jnp.where(
        extra == 0, code,
        jnp.where(extra == 1, b1,
                  jnp.where(extra == 2, b1 | (b2 << 8),
                            jnp.where(extra == 3, b1 | (b2 << 8) | (b3 << 16),
                                      b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)))))
    lit_len = ext_val + 1
    lit_hdr = 1 + extra

    copy_len = jnp.where(kind == 1, ((t >> 2) & 7) + 4, code + 1)
    copy_size = jnp.where(kind == 1, 2, jnp.where(kind == 2, 3, 5))
    copy_off = jnp.where(
        kind == 1, ((t >> 5) << 8) | b1,
        jnp.where(kind == 2, b1 | (b2 << 8),
                  b1 | (b2 << 8) | (b3 << 16) | (b4 << 24)))

    is_lit = kind == 0
    size_ref[:] = jnp.where(is_lit, lit_hdr + lit_len, copy_size)
    outb_ref[:] = jnp.where(is_lit, lit_len, copy_len)
    islit_ref[:] = is_lit.astype(jnp.int32)
    hdr_ref[:] = jnp.where(is_lit, lit_hdr, copy_size)
    off_ref[:] = copy_off


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@jax.jit
def elem_fields_block(c: jax.Array):
    """c: (W,) uint8, W any multiple of 2048 (the bucketed fragment widths
    are 8 KB multiples). Returns (size, outbytes, is_lit, hdr, offset),
    each (W,) int32 — bit-identical to decode._elem_fields (which
    additionally returns a `length` field no caller consumes); the shifted
    byte streams wrap at the fragment end exactly like jnp.roll (the final
    tile's halo is tile 0)."""
    w = c.shape[-1]
    assert w % (TR * LANES) == 0, w
    rows = w // LANES
    tiles = rows // TR
    c2 = c.reshape(rows, LANES)
    tile = pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((TR, LANES), lambda i: ((i + 1) % tiles, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        grid=(tiles,),
        in_specs=[tile, halo],
        out_specs=[tile] * 5,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 5,
        interpret=_interpret(),
    )(c2, c2)
    return tuple(o.reshape(w) for o in outs)
