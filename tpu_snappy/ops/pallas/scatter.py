"""Pallas TPU kernel: full-block unique-destination scatter via MXU one-hot.

The transpose of the gather kernel: out[dest[p]] = v[p] for destinations
that are unique (every cell written at most once; dest == 65536 drops the
write — the one-hot simply never fires, giving free masking). XLA lowers
such scatters to the same ~700us scalar path as gathers; here each source
tile contributes

    A[h, l] += sum_{p in tile} onehot_hi[p, h] * onehot_lo[p, l] * v[p]

accumulated over tiles in f32 VMEM scratch, with 16-bit values split into
two 8-bit limbs for MXU bf16 exactness (see gather.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
HI = 512
LO = 128
TR, TC = 8, 128  # sources per grid step


def _make_kernel(limbs: int, hi_n: int):
    def kernel(dest_ref, *rest):
        v_refs = rest[:limbs]
        out_ref = rest[limbs]
        acc = rest[limbs + 1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        dest = dest_ref[:]
        lo = dest & (LO - 1)
        hi = dest >> 7  # >= hi_n for dropped writes: matches no row

        # Mosaic requires a single contracting dim, so process the tile one
        # 128-wide row at a time: one-hots are built directly in (out_dim,
        # source) orientation and contract over the 128 sources per row.
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (hi_n, TC), 0)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (LO, TC), 0)
        for r in range(TR):
            hi_oh = (hi[r:r + 1, :] == hi_iota).astype(jnp.float32)
            lo_oh = (lo[r:r + 1, :] == lo_iota).astype(jnp.float32)  # (LO, TC)
            for j in range(limbs):
                lov = lo_oh * v_refs[j][r:r + 1, :]
                acc[j] += jax.lax.dot_general(
                    hi_oh, lov,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (HI, LO)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            res = acc[0].astype(jnp.int32)
            for j in range(1, limbs):
                res = (res << 8) | acc[j].astype(jnp.int32)
            out_ref[:] = res

    return kernel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("limbs", "out_cells"))
def scatter_block(dest: jax.Array, values: jax.Array, limbs: int = 2,
                  out_cells: int = N) -> jax.Array:
    """out[dest[p]] = values[p] over `out_cells` output cells (a multiple
    of 128; default one 64K block); unwritten cells 0. The one-hot/matmul
    work scales with out_cells, so small outputs (e.g. the sparse
    resolve's rank compaction) scatter cheaply.

    dest: (M,) int32 in [0, out_cells] (out_cells == drop), M a multiple
    of 1024.
    values: (M,) int32, <= 2^(8*limbs) inclusive (the top limb may reach
    256 — still bf16-exact). Destinations must be unique (duplicate writes
    SUM).
    """
    m = dest.shape[-1]
    hi_n = out_cells // LO
    d2 = dest.reshape(m // TC, TC)
    # The top limb is left unmasked: any value <= 256 is bf16-exact (256 is
    # a power of two), so `values` may reach 2^(8*limbs) INCLUSIVE — the
    # decode transport uses exactly that headroom to fit its packed
    # descriptor+byte cell in 3 limbs instead of 4 (the kernel is MAC-bound
    # in limbs * HI * LO * M).
    vs = [(values >> (8 * (limbs - 1)) if j == 0
           else (values >> (8 * (limbs - 1 - j))) & 0xFF)
          .reshape(m // TC, TC).astype(jnp.float32) for j in range(limbs)]
    tile = pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(limbs, hi_n),
        grid=(m // (TR * TC),),
        in_specs=[tile] * (1 + limbs),
        out_specs=pl.BlockSpec((hi_n, LO), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hi_n, LO), jnp.int32),
        scratch_shapes=[pltpu.VMEM((limbs, hi_n, LO), jnp.float32)],
        interpret=_interpret(),
    )(d2, *vs)
    return out.reshape(out_cells)


#: Windowed-scatter rows per source tile: Snappy expansion caps a 1024-byte
#: compressed tile's output span at ceil(1024/3)*64 = 21846 bytes (copy2:
#: 64 out per 3 in is the format maximum), plus <= 1024 bytes of window
#: base alignment slop -> 179 rows; 192 leaves margin.
WROWS = 192


def _make_wkernel(limbs: int, hi_n: int, wrows: int = WROWS):
    cap = hi_n * LO
    WR = wrows

    def kernel(dest_ref, *rest):
        v_refs = rest[:limbs]
        out_ref = rest[limbs]
        ovf_ref = rest[limbs + 1]
        acc = rest[limbs + 2]

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            ovf_ref[0, 0] = 0

        dest = dest_ref[:]
        active = dest < cap
        m = jnp.min(jnp.where(active, dest, cap + (1 << 20)))

        @pl.when(m < cap)
        def _():
            base = jnp.minimum((m >> 10) << 3, hi_n - WR)
            rel = (dest >> 7) - base
            rel = jnp.where(active, rel, WR)
            ovf_ref[0, 0] += jnp.sum(((rel >= WR) & active)
                                     .astype(jnp.int32))
            lo = dest & (LO - 1)
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (WR, TC), 0)
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (LO, TC), 0)
            # bf16 one-hots/values: exact (0/1 times limb values <= 256)
            # and half the build cost — unlike the full-height kernel,
            # the windowed form is build-bound, not MAC-bound.
            contribs = [jnp.zeros((WR, LO), jnp.float32)
                        for _ in range(limbs)]
            for r in range(TR):
                hi_oh = (rel[r:r + 1, :] == w_iota).astype(jnp.bfloat16)
                lo_oh = (lo[r:r + 1, :] == lo_iota).astype(jnp.bfloat16)
                for j in range(limbs):
                    lov = lo_oh * v_refs[j][r:r + 1, :].astype(jnp.bfloat16)
                    contribs[j] += jax.lax.dot_general(
                        hi_oh, lov,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            for j in range(limbs):
                acc[j, pl.ds(base, WR), :] += contribs[j]

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            res = acc[0].astype(jnp.int32)
            for j in range(1, limbs):
                res = (res << 8) | acc[j].astype(jnp.int32)
            out_ref[:] = res

    return kernel


@functools.partial(jax.jit, static_argnames=("limbs", "out_cells", "wrows"))
def scatter_windowed(dest: jax.Array, values: jax.Array, limbs: int = 3,
                     out_cells: int = N, wrows: int = WROWS):
    """Windowed variant of scatter_block for NEAR-MONOTONE destinations
    (the decode transport: element/payload dests are nondecreasing apart
    from dropped-write sentinels). Each 1024-source tile builds one-hots
    over a wrows-row window anchored at its minimum active destination —
    wrows/hi_n of the full scatter's MAC work. Destinations whose tile
    violates the window contract (impossible for valid Snappy transport
    sources, see WROWS; the sidecar's split pieces prove tighter bounds
    and pass a smaller wrows) are dropped and counted.

    Returns (out (out_cells,) int32, overflow count int32)."""
    m = dest.shape[-1]
    hi_n = out_cells // LO
    d2 = dest.reshape(m // TC, TC)
    vs = [(values >> (8 * (limbs - 1)) if j == 0
           else (values >> (8 * (limbs - 1 - j))) & 0xFF)
          .reshape(m // TC, TC).astype(jnp.float32) for j in range(limbs)]
    tile = pl.BlockSpec((TR, TC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out, ovf = pl.pallas_call(
        _make_wkernel(limbs, hi_n, wrows),
        grid=(m // (TR * TC),),
        in_specs=[tile] * (1 + limbs),
        out_specs=[
            pl.BlockSpec((hi_n, LO), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hi_n, LO), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((limbs, hi_n, LO), jnp.float32)],
        interpret=_interpret(),
    )(d2, *vs)
    return out.reshape(out_cells), ovf[0, 0]
