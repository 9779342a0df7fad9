"""Pallas TPU kernel: full-block dynamic gather via MXU one-hot decomposition.

TPU has no vector-gather hardware; XLA lowers a 64K-element dynamic gather
to a ~700us scalar path — the single dominant cost of the decoder's copy-
chain pointer doubling. The MXU *is* the TPU's gather engine: decompose the
index as idx = hi*LO + lo, then

    W[t, :] = one-hot(hi[t]) @ X2      — row gather on the MXU
    y[t]    = sum_l W[t, l]*onehot(lo) — lane select on the VPU

MXU matmuls round f32 operands to bf16 (8-bit mantissa), so values are fed
as PRE-SCALED 8-bit limb tables x & (0xFF << 8j): an 8-bit field times a
power of two is bf16-exact, the per-limb row gathers accumulate in f32
(exact below 2^24), and ONE lane select finishes the job — no per-limb
select passes and no in-kernel limb recombination.

The kernel is VPU-bound on the one-hot builds + the select
(cost/target ~ HI + 4*LO once the limb combine rides the MXU), which is
kept square despite the op-count model preferring a taller split.
Measured v5e history (us/block standalone, 8-block batch): f32 one-hots +
per-limb selects + 8-row tiles 322; bf16 one-hots 259; (256,256) split
246; 16-row tiles 230; 32-row tiles 229; pre-scaled limbs + fused select
224 (the (512,128) re-split regressed to 258). int8 one-hot matmuls
returned wrong values through Mosaic and were no faster. Decode e2e on
mtg: 1306 -> 1154 us/frag across the fused-select + tile + limb-scaling
batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
HI = 256       # rows of the value matrix
LO = 256       # columns of the value matrix ((512,128) re-split measured
               # WORSE despite the op-count model: 258 vs 229 us/block)
LO_BITS = 8
TR, TC = 32, 128  # target tile: 32 x 128 = 4096 targets per grid step
                  # (TR swept on v5e: 16 -> 235.3, 32 -> 228.9, 64 -> 231.3
                  # us/block standalone, 128 OOMs scoped VMEM)


def _make_kernel(limbs: int, hi_n: int, int8: bool):
    def kernel(*refs):
        x_refs = refs[:limbs]
        idx_ref, out_ref = refs[limbs], refs[limbs + 1]
        idx = idx_ref[:]
        lo = idx & (LO - 1)
        hi = idx >> LO_BITS

        # One-hots: exact (0/1) at the matmul input dtype; narrow dtypes
        # halve/quarter the build/feed cost vs f32.
        hi_oh = (hi[:, :, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TR, TC, hi_n), 2)
                 ).astype(jnp.int8 if int8 else jnp.bfloat16)
        lo_oh = (lo[:, :, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (TR, TC, LO), 2)
                 ).astype(jnp.float32)

        if int8:
            # int8 x int8 -> i32 row gathers (2x MXU peak vs bf16). int8
            # cannot hold a 0..255 limb, so tables carry limb-128 and the
            # combined bias is added back after the single fused select
            # (exactly one one-hot hit per target). The i32 limb partials
            # combine into ONE value plane BEFORE the select — a per-limb
            # select is what made the first int8 attempt lose. Measured
            # 95.9 -> 88.6 us/round on v5e (2-limb doubling round).
            zc = None
            bias = 0
            for x_ref in x_refs:
                z = jax.lax.dot_general(
                    hi_oh, x_ref[:],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # (TR, TC, LO)
                zc = z if zc is None else (zc << 8) + z
                bias = (bias << 8) + 128
            out_ref[:] = (jnp.sum(zc.astype(jnp.float32) * lo_oh, axis=2)
                          .astype(jnp.int32) + bias)
            return

        # bf16 path: row gathers accumulate the pre-scaled limbs on the
        # MXU/f32 side (Mosaic requires a 32-bit matmul accumulator);
        # values < 2^24 keep the sum exact. One lane select finishes.
        zc = None
        for x_ref in x_refs:
            z = jax.lax.dot_general(
                hi_oh, x_ref[:],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TR, TC, LO)
            zc = z if zc is None else zc + z
        out_ref[:] = jnp.sum(zc * lo_oh, axis=2).astype(jnp.int32)

    return kernel


def _interpret() -> bool:
    # Compiled Mosaic kernels need real TPUs; CPU (tests) runs interpreted.
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("limbs",))
def gather_block(x: jax.Array, idx: jax.Array, limbs: int = 2) -> jax.Array:
    """y[p] = x[idx[p]]. x: (S,) int32 table, S a multiple of 4096 (the
    one-hot row count scales with S, so small tables — e.g. the sparse
    resolve's chase results — gather cheaply); idx: (T,) int32 with T any
    multiple of 4096 (T < S is the sparse-target form: the table stays
    resident, only T targets are gathered). Values must fit 8*limbs bits
    and limbs <= 3 (the f32 limb accumulation is exact below 2^24; block
    positions need 2 limbs, bytes only 1).

    Multi-limb gathers take the int8 MXU path (2x peak, ~8% measured);
    1-limb stays bf16 pre-scaled (measured a wash, and the bf16 form
    needs no bias arithmetic)."""
    assert limbs <= 3, limbs
    t = idx.shape[-1]
    s = x.shape[-1]
    hi_n = s // LO
    assert t % (TR * TC) == 0, t
    assert s % LO == 0, s
    int8 = limbs > 1
    if int8:
        xs = [((((x >> (8 * (limbs - 1 - j))) & 0xFF) - 128)
               .reshape(hi_n, LO).astype(jnp.int8)) for j in range(limbs)]
    else:
        xs = [(x & (0xFF << (8 * (limbs - 1 - j)))).reshape(hi_n, LO)
              .astype(jnp.bfloat16) for j in range(limbs)]
    idx2 = idx.reshape(t // TC, TC)
    full = pl.BlockSpec((hi_n, LO), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(limbs, hi_n, int8),
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
