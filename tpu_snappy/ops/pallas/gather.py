"""Pallas TPU kernel: full-block dynamic gather via MXU one-hot decomposition.

TPU has no vector-gather hardware; XLA lowers a 64K-element dynamic gather
to a ~700us scalar path — the single dominant cost of the decoder's copy-
chain pointer doubling. The MXU *is* the TPU's gather engine: decompose the
index as idx = hi*256 + lo, then

    W[t, h] = X2[h, lo[t]]   — one-hot(hi) contraction against X2 = x.reshape(256, 256)
    y[t]    = W[t, lo[t]]    — one-hot(lo) masked lane sum on the VPU

MXU matmuls round f32 operands to bf16 (integers only exact to 256), so
16-bit values are gathered as two 8-bit limbs — each limb matmul is exact
(one-hot times values < 256, f32 accumulation) and runs at full bf16 MXU
rate. Work is limbs * N * N/256 MACs per block, every intermediate in VMEM.

Shape/dtype choices are measured (v5e, within one warm job, 8-block batch):
f32 one-hots + (512, 128) split + 8-row tiles (the original form) 322
us/block standalone; bf16 one-hots 259; (256, 256) split 246; 16-row tiles
230 — net of the ~138 us/block standalone-dispatch floor that's ~2x. int8
one-hot matmuls returned wrong values through Mosaic and were no faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
HI = 256       # rows of the value matrix
LO = 256       # columns of the value matrix
TR, TC = 16, 128  # target tile: 16 x 128 = 2048 targets per grid step


def _make_kernel(limbs: int):
    def kernel(*refs):
        x_refs = refs[:limbs]
        idx_ref, out_ref = refs[limbs], refs[limbs + 1]
        idx = idx_ref[:]
        lo = idx & (LO - 1)
        hi = idx >> 8

        # Row gather on the MXU (contract the HI-wide one-hot against the
        # value matrix), then an LO-way lane select on the VPU. bf16
        # one-hots: exact (0/1) and half the build/feed cost of f32.
        hi_oh = (hi[:, :, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TR, TC, HI), 2)
                 ).astype(jnp.bfloat16)
        lo_oh = (lo[:, :, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TR, TC, LO), 2)
                 ).astype(jnp.bfloat16)

        def limb(x_ref):
            # Mosaic requires a 32-bit matmul accumulator, so z stays f32;
            # the lo one-hot rides bf16 (exact 0/1, half the build traffic)
            # and upcasts in-register at the select.
            z = jax.lax.dot_general(
                hi_oh, x_ref[:],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TR, TC, LO)
            return jnp.sum(z * lo_oh.astype(jnp.float32), axis=2)

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
    """y[p] = x[idx[p]] for a 64K-entry table. x: (65536,) int32;
    idx: (T,) int32 with T any multiple of 2048 (T < 65536 is the sparse
    form: the full table stays resident, only T targets are gathered —
    grid steps and one-hot work scale with T, so a 12K-target pass costs
    ~T/N of the full pass). Values must fit 8*limbs bits (block positions
    need 2 limbs, bytes only 1 — each limb costs one MXU pass)."""
    t = idx.shape[-1]
    assert t % (TR * TC) == 0, t
    xs = [((x >> (8 * (limbs - 1 - j))) & 0xFF).reshape(HI, LO)
          .astype(jnp.bfloat16) for j in range(limbs)]
    idx2 = idx.reshape(t // TC, TC)
    full = pl.BlockSpec((HI, LO), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(limbs),
        grid=(t // (TR * TC),),
        in_specs=[full] * limbs + [
            pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, TC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t // TC, TC), jnp.int32),
        interpret=_interpret(),
    )(*xs, idx2)
    return out.reshape(t)


gather_blocks = jax.jit(jax.vmap(gather_block))
