"""Pallas TPU kernel: fused 4-byte-window sort keys for the encode matcher.

encode._windows_u32 + the validity mask build the pair-sort input key
(window bytes little-endian, invalid tail positions forced to 0xFFFFFFFF so
they sort last). The XLA expression costs ~139 us/block on v5e — the
u8->u32 cast, three rolls, and the or-shift chain each round-trip a 256 KB
array through HBM. Here the whole key is one VMEM pass: each grid step
reads its 16-row tile plus the next tile (the 3-byte lookahead crosses
tile boundaries exactly like jnp.roll wraps — the halo of the final tile
is tile 0, matching the roll's wraparound, and callers mask the last 3
positions anyway via the n-4 validity bound).

Replaces the role of the reference's per-cycle window register feed
(MatchFinder.scala:26-77 streams one 4-byte window per cycle into the hash
table; here all 64K windows materialize in one pass for the sort-based
matcher).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
LANES = 128
ROWS = N // LANES  # 512
TR = 16            # rows per grid step
TILES = ROWS // TR


def _rollb_ext(x, s):
    """y[i] = x[i + s] over a flattened (TR + halo, LANES) block."""
    rows = x.shape[0]
    z = pltpu.roll(x, LANES - s, axis=1)
    zc = pltpu.roll(z, rows - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, z, zc)


def _kernel(b_ref, nxt_ref, n_ref, key_ref):
    i = pl.program_id(0)
    t = jnp.concatenate([b_ref[:], nxt_ref[0:8, :]], axis=0).astype(jnp.uint32)
    w = (t[:TR]
         | _rollb_ext(t, 1)[:TR] << 8
         | _rollb_ext(t, 2)[:TR] << 16
         | _rollb_ext(t, 3)[:TR] << 24)
    pos = (jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (TR, LANES), 1)
           + i * TR * LANES)
    valid = pos <= n_ref[0, 0] - 4
    key_ref[:] = jnp.where(valid, w, jnp.uint32(0xFFFFFFFF))


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@jax.jit
def window_keys_block(block: jax.Array, n: jax.Array) -> jax.Array:
    """block: (65536,) uint8, n: scalar int32. Returns (65536,) uint32 sort
    keys: w[i] = bytes[i:i+4] LE where i <= n-4, else 0xFFFFFFFF.
    Bit-identical to jnp.where(iota <= n-4, encode._windows_u32(block),
    0xFFFFFFFF)."""
    b2 = block.reshape(ROWS, LANES)
    tile = pl.BlockSpec((TR, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    halo = pl.BlockSpec((TR, LANES), lambda i: ((i + 1) % TILES, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(TILES,),
        in_specs=[tile, halo,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
        interpret=_interpret(),
    )(b2, b2, jnp.reshape(n, (1, 1)).astype(jnp.int32))
    return out.reshape(N)
