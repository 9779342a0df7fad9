"""Pallas TPU kernel: fused speculative element-field decode.

Computes decode._elem_fields — (size, outbytes, is_lit, hdr, offset) for
EVERY compressed byte position, as if each byte were a tag — in one
VMEM-resident pass. The XLA version materializes the four shifted byte
streams plus ~10 intermediate (FRAG_CAP,) i32 arrays through HBM and was
measured at 0.217 ms/block (the bulk of the decode parse, which the scan
machinery itself finishes in ~0.07 ms); here the whole computation is five
VPU expressions over one 68 KB VMEM block.

Plays the role the reference's (stubbed) decode datapath would have needed:
the tag-byte field extraction of CompressionAccelerator.scala's funct=1
path (never implemented there, CompressionAccelerator.scala:385-388).

Roll identity note: like the XLA path's jnp.roll, the byte streams wrap at
the fragment end; positions past clen are zero padding and masked by the
parse, so the wrap is harmless and the two paths agree bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAG_CAP = 68 * 1024
ROWS, LANES = FRAG_CAP // 128, 128  # 544 x 128


def _rollb(x, s):
    """y[i] = x[i + s] in flattened row-major order (backward roll, wraps)."""
    assert 0 < s < LANES
    z = pltpu.roll(x, LANES - s, axis=1)
    zc = pltpu.roll(z, ROWS - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, z, zc)


def _kernel(c_ref, size_ref, outb_ref, islit_ref, hdr_ref, off_ref):
    t = c_ref[:].astype(jnp.int32)
    b1 = _rollb(t, 1)
    b2 = _rollb(t, 2)
    b3 = _rollb(t, 3)
    b4 = _rollb(t, 4)
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
    """c: (FRAG_CAP,) uint8. Returns (size, outbytes, is_lit, hdr, offset),
    each (FRAG_CAP,) int32 — bit-identical to decode._elem_fields (which
    additionally returns a `length` field no caller consumes)."""
    c2 = c.reshape(ROWS, LANES)
    outs = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 5,
        interpret=_interpret(),
    )(c2)
    return tuple(o.reshape(FRAG_CAP) for o in outs)
