"""Pallas TPU kernel: full-block dynamic gather via MXU one-hot decomposition.

TPU has no vector-gather hardware; XLA lowers a 64K-element dynamic gather
to a ~700us scalar path — the single dominant cost of the decoder's copy-
chain pointer doubling. The MXU *is* the TPU's gather engine: decompose the
index as idx = hi*128 + lo, then

    W[t, h] = X2[h, lo[t]]   — one-hot(lo) contraction against X2 = x.reshape(512, 128)
    y[t]    = W[t, hi[t]]    — one-hot(hi) masked row-sum

MXU matmuls round f32 operands to bf16 (integers only exact to 256), so
16-bit values are gathered as two 8-bit limbs — each limb matmul is exact
(one-hot times values < 256, f32 accumulation) and runs at full bf16 MXU
rate. Work is 2 * N * 1024 MACs per block, every intermediate in VMEM;
measured ~2.5x faster than XLA's gather path on v5e.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
HI = 512       # rows of the value matrix
LO = 128       # columns of the value matrix
TR, TC = 8, 128  # target tile: 8 x 128 = 1024 targets per grid step


def _gather_kernel(xh_ref, xl_ref, idx_ref, out_ref):
    # xh/xl: (HI, LO) f32 value limbs; idx_ref/out_ref: (TR, TC) tiles.
    idx = idx_ref[:]
    lo = idx & (LO - 1)
    hi = idx >> 7

    # Row gather on the MXU (contract the 512-wide one-hot against the value
    # matrix), then a 128-way lane select on the VPU. The transposed variant
    # (contract LO on the MXU, masked-sum the (TR, TC, HI) intermediate on
    # the VPU) needs ~2.6M VPU ops/tile vs ~1.3M here.
    hi_oh = (hi[:, :, None] ==
             jax.lax.broadcasted_iota(jnp.int32, (TR, TC, HI), 2)
             ).astype(jnp.float32)
    lo_oh = (lo[:, :, None] ==
             jax.lax.broadcasted_iota(jnp.int32, (TR, TC, LO), 2)
             ).astype(jnp.float32)

    def limb(x_ref):
        z = jax.lax.dot_general(
            hi_oh, x_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TR, TC, LO): rows at idx
        return jnp.sum(z * lo_oh, axis=2)

    out_ref[:] = (limb(xh_ref).astype(jnp.int32) << 8) | \
        limb(xl_ref).astype(jnp.int32)


def _interpret() -> bool:
    # Compiled Mosaic kernels need real TPUs; CPU (tests) runs interpreted.
    return jax.devices()[0].platform != "tpu"


@jax.jit
def gather_block(x: jax.Array, idx: jax.Array) -> jax.Array:
    """y[p] = x[idx[p]] for one 64K block. x, idx: (65536,) int32; values
    must fit 16 bits (block positions and bytes do)."""
    xh = (x >> 8).reshape(HI, LO).astype(jnp.float32)
    xl = (x & 0xFF).reshape(HI, LO).astype(jnp.float32)
    idx2 = idx.reshape(N // TC, TC)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(N // (TR * TC),),
        in_specs=[
            pl.BlockSpec((HI, LO), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HI, LO), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, TC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // TC, TC), jnp.int32),
        interpret=_interpret(),
    )(xh, xl, idx2)
    return out.reshape(N)


gather_blocks = jax.jit(jax.vmap(gather_block))
