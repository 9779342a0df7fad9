"""Pallas TPU kernel: fused emission lane builder for the encoder.

Everything between the commit scan and the placement sort — element
detection, literal run lengths (a reverse scan), element sizes, output
offsets (a forward scan), Snappy tag bytes, header-lane riding, and the
literal-payload base forward-fill — fuses into ONE VMEM-resident pass that
emits the two packed (dest << 8 | byte) lane arrays the placement sort
consumes. The XLA expression of the same math is ~15 elementwise passes
plus three associative scans, each round-tripping 256 KB through HBM
(~190 us/block of the encode budget net of the placement sort); here the
three scans are Hillis-Steele register sweeps like ops/pallas/ffill.py
(the measured-win pattern: scans fused into one VMEM residency).

This is the TPU reformulation of the reference's serializing emit path:
streamHolder byte staging, the emptySpotAddr literal-tag back-patch, and
CopyStreamFormer's tag-01/10 little-endian swizzle
(CompressionAccelerator.scala:230-285, CopyCompress.scala:211-264) all
become pure per-position arithmetic on exact exclusive-scan offsets.
Copy elements never need tag-11 here (offsets are 16-bit by block-size
construction) and literal runs never exceed 65536 (hdr <= 3), matching
the XLA path bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_snappy import format as fmt

N = 1 << 16
LANES = 128
ROWS = N // LANES  # 512
SENT = 1 << 20     # inactive-destination sentinel (mirrors place.SENT)


def _rollf(x: jax.Array, s: int) -> jax.Array:
    """Flattened row-major roll toward HIGHER indices (y[i] = x[i-s]),
    wrapping; callers mask the first s positions."""
    if s % LANES == 0:
        return pltpu.roll(x, s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, s, axis=1)
    zc = pltpu.roll(z, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, z, zc)


def _rollb(x: jax.Array, s: int) -> jax.Array:
    """Flattened row-major roll toward LOWER indices (y[i] = x[i+s]),
    wrapping; callers mask the last s positions."""
    if s % LANES == 0:
        return pltpu.roll(x, x.shape[0] - s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, LANES - s, axis=1)
    zc = pltpu.roll(z, x.shape[0] - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, z, zc)


def _kernel(cj_ref, off_ref, b_ref, n_ref, pa_ref, pb_ref, tot_ref):
    n = n_ref[0, 0]
    cj = cj_ref[:]          # committed ? jump : -1
    off = off_ref[:]
    gidx = (jax.lax.broadcasted_iota(jnp.int32, cj.shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, cj.shape, 1))

    is_copy = cj >= 4
    is_lit = (cj >= 0) & (cj < 4)
    prev_lit = jnp.where(gidx >= 1, _rollf(is_lit.astype(jnp.int32), 1), 0)
    lit_start = is_lit & (prev_lit == 0)
    elem = is_copy | lit_start
    elem_i = elem.astype(jnp.int32)

    # run_end: the smallest element start > i (reverse suffix-min), capped
    # at n. 17 Hillis-Steele levels, all in registers.
    eidx = jnp.where(elem, gidx, N)
    sm = eidx
    for lvl in range(17):
        s = 1 << lvl
        sm = jnp.minimum(sm, jnp.where(gidx < N - s, _rollb(sm, s), N))
    run_end = jnp.minimum(jnp.where(gidx < N - 1, _rollb(sm, 1), N), n)
    lit_len = jnp.maximum(run_end - gidx, 1)

    cpy_len = cj
    copy_small = (cpy_len <= fmt.COPY1_MAX_LEN) & (off < fmt.COPY1_MAX_OFFSET)
    copy_sz = jnp.where(copy_small, 2, 3)
    lit_hdr = jnp.where(lit_len <= 60, 1, jnp.where(lit_len <= 256, 2, 3))
    esz = jnp.where(elem, jnp.where(is_copy, copy_sz, lit_hdr + lit_len), 0)

    # out_off: exclusive prefix sum of esz (17 levels).
    inc = esz
    for lvl in range(17):
        s = 1 << lvl
        inc = inc + jnp.where(gidx >= s, _rollf(inc, s), 0)
    out_off = inc - esz
    total = jnp.max(inc)

    # Tag bytes (all lanes computed everywhere, masked on use) — mirrors
    # encode_block's XLA expressions exactly.
    n1 = lit_len - 1
    lt0 = jnp.where(lit_len <= 60, n1 << 2,
                    jnp.where(lit_len <= 256, 60 << 2, 61 << 2))
    ct0 = jnp.where(
        copy_small,
        1 | ((cpy_len - 4) << 2) | ((off >> 8) << 5),
        2 | ((cpy_len - 1) << 2))
    t0 = jnp.where(is_copy, ct0, lt0)
    t1 = jnp.where(is_copy, off, n1) & 0xFF
    t2 = (jnp.where(is_copy, off, n1) >> 8) & 0xFF
    hdr = jnp.where(is_copy, copy_sz, lit_hdr)

    def rollz(x, s):
        return jnp.where(gidx >= s, _rollf(x, s), 0)

    e1 = rollz(elem_i, 1) == 1
    e2 = rollz(elem_i, 2) == 1
    a_t1 = e1 & (rollz(hdr, 1) >= 2)
    a_t2 = e2 & (rollz(hdr, 2) >= 3)
    lane_a_val = jnp.where(elem, t0,
                           jnp.where(a_t1, rollz(t1, 1), rollz(t2, 2)))
    lane_a_dst = jnp.where(elem, out_off,
                           jnp.where(a_t1, rollz(out_off, 1) + 1,
                                     rollz(out_off, 2) + 2))
    lane_a_on = elem | a_t1 | a_t2

    # Literal payload base: forward-fill of (out_off + lit_hdr - i) from
    # run starts (17 masked Hillis-Steele levels).
    m = lit_start.astype(jnp.int32)
    v = out_off + lit_hdr - gidx
    for lvl in range(17):
        s = 1 << lvl
        ms = jnp.where(gidx >= s, _rollf(m, s), 0)
        take = ((1 - m) * ms) == 1
        v = jnp.where(take, _rollf(v, s), v)
        m = jnp.maximum(m, ms)
    lane_b_dst = v + gidx

    pa = (jnp.where(lane_a_on, lane_a_dst, SENT).astype(jnp.uint32) << 8
          ) | (lane_a_val & 0xFF).astype(jnp.uint32)
    pb = (jnp.where(is_lit, lane_b_dst, SENT).astype(jnp.uint32) << 8
          ) | b_ref[:].astype(jnp.uint32)
    pa_ref[:] = pa
    pb_ref[:] = pb
    tot_ref[:] = jnp.full((8, LANES), total, jnp.int32)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@jax.jit
def emit_block(cj: jax.Array, off: jax.Array, block: jax.Array,
               n: jax.Array):
    """cj: (65536,) int32 = committed ? jump : -1; off: (65536,) int32;
    block: (65536,) uint8; n: scalar int32. Returns (pack_a, pack_b, total):
    the two (65536,) uint32 (dest << 8 | byte) placement-lane arrays (dest =
    SENT where inactive) and the total output size — bit-identical to
    encode_block's XLA emission lanes."""
    full = pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    pa, pb, tot = pl.pallas_call(
        _kernel,
        in_specs=[full, full, full,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[full, full,
                   pl.BlockSpec((8, LANES), lambda: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((8, LANES), jnp.int32)],
        interpret=_interpret(),
    )(cj.reshape(ROWS, LANES), off.reshape(ROWS, LANES),
      block.reshape(ROWS, LANES), jnp.reshape(n, (1, 1)).astype(jnp.int32))
    return pa.reshape(N), pb.reshape(N), tot[0, 0]


def _single_kernel(cj_ref, off_ref, b_ref, n_ref, pm_ref, pa_ref, pb_ref,
                   head_ref, tot_ref):
    """Single-lane emission: ONE (dest << 8 | byte) entry per input position
    plus two sparse overflow arrays, so the placement sort shrinks from 2N
    to N + 1408 entries.

    Byte-to-position assignment (provably conflict-free for ANY committed
    parse with jumps in [1, 64] — no reliance on the profitability filter):

      * literal payload rides its own position (dest advances by 1);
      * a copy's 2-3 header bytes ride its own first positions (span >= 4);
      * a literal run's 1-byte tag rides position s-1 — always the last
        position of the preceding copy, which its own header (<= 3 bytes
        over >= 4 positions) never occupies;
      * a literal run's 2nd/3rd header bytes (runs > 60 / > 256 bytes,
        where s-2/s-3 may be header-occupied) go to the overflow arrays,
        nonzero only at run starts. Runs > 60 start > 64 apart and runs
        > 256 start > 260 apart, so slots s>>6 / s>>8 are collision-free
        and an XLA reshape-max compacts each array without any scatter;
      * a block-opening literal's tag (no s-1 exists) lands in `head`.
    """
    n = n_ref[0, 0]
    cj = cj_ref[:]
    off = off_ref[:]
    gidx = (jax.lax.broadcasted_iota(jnp.int32, cj.shape, 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, cj.shape, 1))

    is_copy = cj >= 4
    is_lit = (cj >= 0) & (cj < 4)
    prev_lit = jnp.where(gidx >= 1, _rollf(is_lit.astype(jnp.int32), 1), 0)
    lit_start = is_lit & (prev_lit == 0)
    elem = is_copy | lit_start
    elem_i = elem.astype(jnp.int32)

    eidx = jnp.where(elem, gidx, N)
    sm = eidx
    for lvl in range(17):
        s = 1 << lvl
        sm = jnp.minimum(sm, jnp.where(gidx < N - s, _rollb(sm, s), N))
    run_end = jnp.minimum(jnp.where(gidx < N - 1, _rollb(sm, 1), N), n)
    lit_len = jnp.maximum(run_end - gidx, 1)

    cpy_len = cj
    copy_small = (cpy_len <= fmt.COPY1_MAX_LEN) & (off < fmt.COPY1_MAX_OFFSET)
    copy_sz = jnp.where(copy_small, 2, 3)
    lit_hdr = jnp.where(lit_len <= 60, 1, jnp.where(lit_len <= 256, 2, 3))
    esz = jnp.where(elem, jnp.where(is_copy, copy_sz, lit_hdr + lit_len), 0)

    inc = esz
    for lvl in range(17):
        s = 1 << lvl
        inc = inc + jnp.where(gidx >= s, _rollf(inc, s), 0)
    out_off = inc - esz
    total = jnp.max(inc)

    n1 = lit_len - 1
    lt0 = jnp.where(lit_len <= 60, n1 << 2,
                    jnp.where(lit_len <= 256, 60 << 2, 61 << 2))
    ct0 = jnp.where(
        copy_small,
        1 | ((cpy_len - 4) << 2) | ((off >> 8) << 5),
        2 | ((cpy_len - 1) << 2))
    t1 = jnp.where(is_copy, off, n1) & 0xFF
    t2 = (jnp.where(is_copy, off, n1) >> 8) & 0xFF

    def rollz(x, s):
        return jnp.where(gidx >= s, _rollf(x, s), 0)

    def rollbz(x, s):
        return jnp.where(gidx < N - s, _rollb(x, s), 0)

    # Literal payload base ffill (dest = run base + position).
    m = lit_start.astype(jnp.int32)
    v = out_off + lit_hdr - gidx
    for lvl in range(17):
        s = 1 << lvl
        ms = jnp.where(gidx >= s, _rollf(m, s), 0)
        take = ((1 - m) * ms) == 1
        v = jnp.where(take, _rollf(v, s), v)
        m = jnp.maximum(m, ms)
    payload_dst = v + gidx

    ic = is_copy.astype(jnp.int32)
    c1 = rollz(ic, 1) == 1                       # copy's 2nd header byte
    c2v = (rollz(ic, 2) == 1) & (rollz(copy_sz, 2) == 3)  # copy's 3rd
    ls_i = lit_start.astype(jnp.int32)
    lt0c = rollbz(ls_i, 1) == 1                  # next run's tag rides here

    md = jnp.where(is_lit, payload_dst,
         jnp.where(is_copy, out_off,
         jnp.where(c1, rollz(out_off, 1) + 1,
         jnp.where(c2v, rollz(out_off, 2) + 2,
         jnp.where(lt0c, rollbz(out_off, 1), SENT)))))
    mv = jnp.where(is_lit, b_ref[:].astype(jnp.int32),
         jnp.where(is_copy, ct0,
         jnp.where(c1, rollz(t1, 1),
         jnp.where(c2v, rollz(t2, 2),
         jnp.where(lt0c, rollbz(lt0, 1), 0)))))
    pm_ref[:] = (md.astype(jnp.uint32) << 8) | (mv & 0xFF).astype(jnp.uint32)

    # Sparse overflow arrays (nonzero only at qualifying run starts; their
    # packs are >= 256 so an XLA reshape-max compacts them collision-free).
    ovf_b = lit_start & (lit_hdr >= 2)
    pa = jnp.where(lit_start & (lit_hdr == 3),
                   ((out_off + 2).astype(jnp.uint32) << 8)
                   | (t2 & 0xFF).astype(jnp.uint32), 0)
    pb = jnp.where(ovf_b,
                   ((out_off + 1).astype(jnp.uint32) << 8)
                   | (t1 & 0xFF).astype(jnp.uint32), 0)
    pa_ref[:] = pa
    pb_ref[:] = pb

    # Block-opening literal tag (dest 0); SENT-packed otherwise.
    first_lit = jnp.sum(jnp.where(gidx == 0, lit_start.astype(jnp.int32), 0))
    head = jnp.sum(jnp.where(gidx == 0, lt0, 0)) & 0xFF
    head_pack = jnp.where(first_lit == 1, head.astype(jnp.uint32),
                          jnp.uint32(SENT) << 8)
    head_ref[:] = jnp.full((8, LANES), jnp.uint32(SENT) << 8)
    lane0 = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) == 0) & \
            (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1) == 0)
    head_ref[:] = jnp.where(lane0, head_pack, jnp.uint32(SENT) << 8)
    tot_ref[:] = jnp.full((8, LANES), total, jnp.int32)


@jax.jit
def emit_block_single(cj: jax.Array, off: jax.Array, block: jax.Array,
                      n: jax.Array):
    """Single-lane emission (see _single_kernel). Returns
    (pack_main (65536,) u32, ovf_a (65536,) u32 sparse, ovf_b (65536,) u32
    sparse, head (128,) u32, total) — the caller reshape-max-compacts the
    overflow arrays to 256 + 1024 slots and sorts N + 1408 entries."""
    full = pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    small = pl.BlockSpec((8, LANES), lambda: (0, 0), memory_space=pltpu.VMEM)
    pm, pa, pb, head, tot = pl.pallas_call(
        _single_kernel,
        in_specs=[full, full, full,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[full, full, full, small, small],
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((8, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((8, LANES), jnp.int32)],
        interpret=_interpret(),
    )(cj.reshape(ROWS, LANES), off.reshape(ROWS, LANES),
      block.reshape(ROWS, LANES), jnp.reshape(n, (1, 1)).astype(jnp.int32))
    return (pm.reshape(N), pa.reshape(N), pb.reshape(N), head[0],
            tot[0, 0])
