"""Pallas TPU kernel: one pointer-doubling round with per-tile stability.

Decode's copy-chain resolution iterates s <- s o s to a fixed point
(decode.py RESOLVE). Text streams need ~8-9 rounds, but most positions hit
their fixed points in the first 2-3 — re-gathering all 64K every round
wastes most of the doubling budget. This kernel runs ONE round but carries
a per-tile stability flag across rounds: a tile whose 1024 targets all sit
at fixed points can never change again (fixed points of a chain map stay
fixed), so it is copied through without building one-hots or touching the
MXU. The convergence-detection round (all tiles stable) is then nearly
free, where the plain kernel paid a full gather to discover idempotence.

Differs from resolve.py's rejected mega-kernel (2.30 vs 1.82 ms/block) by
keeping one pallas dispatch per round: Mosaic pipelines the 64-tile grid,
which the in-kernel serial tile loop forfeited.

Gather mechanics per tile are gather.py's (MXU row-gather + VPU lane
select, 8-bit limbs — see there for the bf16 rounding rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
HI = 512
LO = 128
TR, TC = 8, 128
TILES = N // (TR * TC)  # 64


def _dbl_kernel(xh_ref, xl_ref, idx_ref, stable_ref, out_ref, stout_ref):
    t = pl.program_id(0)

    @pl.when(stable_ref[t, 0] == 0)
    def _():
        idx = idx_ref[:]
        lo = idx & (LO - 1)
        hi = idx >> 7
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
                preferred_element_type=jnp.float32)
            return jnp.sum(z * lo_oh, axis=2)

        s2 = (limb(xh_ref).astype(jnp.int32) << 8) | \
            limb(xl_ref).astype(jnp.int32)
        out_ref[:] = s2
        stout_ref[t, 0] = jnp.where(jnp.any(s2 != idx), 0, 1)

    @pl.when(stable_ref[t, 0] != 0)
    def _():
        out_ref[:] = idx_ref[:]
        stout_ref[t, 0] = 1


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@jax.jit
def doubling_round(s: jax.Array, stable: jax.Array):
    """(s o s, stable') for one 64K pointer map. s: (65536,) int32 in
    [0, 65536); stable: (64,) int32 per-tile flags from the previous round
    (zeros initially). Tiles flagged stable are copied through unchanged;
    stable'[t] == 1 iff tile t is now at its fixed point. Convergence:
    all(stable') — one (cheap) extra round after the map stops moving."""
    xh = (s >> 8).reshape(HI, LO).astype(jnp.float32)
    xl = (s & 0xFF).reshape(HI, LO).astype(jnp.float32)
    idx2 = s.reshape(N // TC, TC)
    st2 = stable.reshape(TILES, 1)
    full = pl.BlockSpec((HI, LO), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out, stout = pl.pallas_call(
        _dbl_kernel,
        grid=(TILES,),
        in_specs=[
            full, full,
            pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILES, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILES, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // TC, TC), jnp.int32),
            jax.ShapeDtypeStruct((TILES, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(xh, xl, idx2, st2)
    return out.reshape(N), stout.reshape(TILES)
