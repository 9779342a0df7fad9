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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
HI = 512       # rows of the value matrix
LO = 128       # columns of the value matrix
TR, TC = 8, 128  # target tile: 8 x 128 = 1024 targets per grid step


def _make_kernel(limbs: int):
    def kernel(*refs):
        x_refs = refs[:limbs]
        idx_ref, out_ref = refs[limbs], refs[limbs + 1]
        idx = idx_ref[:]
        lo = idx & (LO - 1)
        hi = idx >> 7

        # Row gather on the MXU (contract the 512-wide one-hot against the
        # value matrix), then a 128-way lane select on the VPU. The
        # transposed variant (contract LO on the MXU, masked-sum the
        # (TR, TC, HI) intermediate on the VPU) needs ~2.6M VPU ops/tile vs
        # ~1.3M here.
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
                preferred_element_type=jnp.float32)  # (TR, TC, LO)
            return jnp.sum(z * lo_oh, axis=2)

        res = limb(x_refs[0]).astype(jnp.int32)
        for j in range(1, limbs):
            res = (res << 8) | limb(x_refs[j]).astype(jnp.int32)
        out_ref[:] = res

    return kernel


def _interpret() -> bool:
    # Compiled Mosaic kernels need real TPUs; CPU (tests) runs interpreted.
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("limbs",))
def gather_block(x: jax.Array, idx: jax.Array, limbs: int = 2) -> jax.Array:
    """y[p] = x[idx[p]] for one 64K block. x, idx: (65536,) int32; values
    must fit 8*limbs bits (block positions need 2 limbs, bytes only 1 —
    each limb costs one MXU pass)."""
    xs = [((x >> (8 * (limbs - 1 - j))) & 0xFF).reshape(HI, LO)
          .astype(jnp.float32) for j in range(limbs)]
    idx2 = idx.reshape(N // TC, TC)
    full = pl.BlockSpec((HI, LO), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(limbs),
        grid=(N // (TR * TC),),
        in_specs=[full] * limbs + [
            pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, TC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N // TC, TC), jnp.int32),
        interpret=_interpret(),
    )(*xs, idx2)
    return out.reshape(N)


gather_blocks = jax.jit(jax.vmap(gather_block))
