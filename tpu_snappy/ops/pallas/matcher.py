"""Pallas TPU kernel: fused match pipeline (sticky offsets -> match lengths
-> profitability filter -> suffix propagation -> greedy jumps).

Mirrors ops/encode.py's _sticky_offsets/_match_lengths/_propagate/
lazy-deferral/_jump exactly (same windowed Hillis-Steele structure, same
tie-breaks), but fused in VMEM: the XLA version materializes ~40 intermediate (N,) arrays through
HBM; here everything between the candidate table and the (jump, offset)
pair stays on-chip.

All shifts are <= 128, so rolls over the flattened row-major (512, 128)
layout decompose as lane rolls with row-carry (see ffill.py) or pure
sublane rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
ROWS, LANES = 512, 128


def _rollf(x, s):
    """y[i] = x[i - s] in flattened order (forward roll)."""
    if s % LANES == 0:
        return pltpu.roll(x, s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, s, axis=1)
    zc = pltpu.roll(z, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= s, z, zc)


def _rollb(x, s):
    """y[i] = x[i + s] in flattened order (backward roll, wrapping)."""
    if s % LANES == 0:
        return pltpu.roll(x, ROWS - s // LANES, axis=0)
    assert s < LANES
    z = pltpu.roll(x, LANES - s, axis=1)
    zc = pltpu.roll(z, ROWS - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - s, z, zc)


def _sig_bit(x):
    """Mirror of encode._sig_bit: 5-bit multiplicative-hash bucket as a
    one-bit u32 signature (bit-identical)."""
    h = (x.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) >> 27
    return (jnp.uint32(1) << h).astype(jnp.uint32)


def _make_kernel(k: int, packed: bool, lazy: int = 0,
                 sticky: str = "exact"):
    def kernel(cands_ref, *rest):
        if packed:
            pref_ref, n_ref, jump_ref, off_ref = rest
        else:
            (n_ref, jump_ref, off_ref), pref_ref = rest, None
        n = n_ref[0, 0]
        gidx = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))

        # --- sticky offsets: windowed keep-set composition (the level
        # count mirrors encode.STICKY_LEVELS; see the analysis there) ---
        from tpu_snappy.ops.encode import STICKY_LEVELS
        if packed:
            # Restore-sort payload words unpacked here (two 16-bit offsets
            # per u32): halves the kernel's VMEM input block — the scoped-
            # VMEM ceiling that capped encode waves at 16 blocks — and
            # skips the XLA-side unpack + (N, K) re-stack. keeps[0] is the
            # gated flattening default (encode._flat_gate); the logical
            # keep-set = [pref] + payload entries 0..k-2, exactly the
            # unpacked table's columns.
            keeps = [pref_ref[:]]
            for j in range(k // 2):
                w = cands_ref[j]
                keeps.append(w & 0xFFFF)
                if len(keeps) < k:
                    keeps.append((w >> 16) & 0xFFFF)
        else:
            keeps = [cands_ref[j] for j in range(k)]
        dflt = keeps[0]
        cands0 = keeps if sticky == "sig" else None
        for lvl in range(STICKY_LEVELS):
            s = 4 << lvl

            if sticky == "sig":
                # Signature membership (encode._sticky_offsets_sig):
                # one u32 bucket mask per position, one AND per test.
                mask = jnp.uint32(0)
                for kp in keeps:
                    mask |= jnp.where(kp > 0, _sig_bit(kp), jnp.uint32(0))

                def in_b(x, mask=mask):
                    return ((mask & _sig_bit(x)) != 0) & (x > 0)
            else:
                def in_b(x, keeps=keeps):
                    # (x == kp) & (x > 0) per keep would re-test x > 0 K
                    # times; hoisting it to one final mask cuts a third of
                    # the 17*K membership ops per level (identical truth
                    # table).
                    hit = x == keeps[0]
                    for kp in keeps[1:]:
                        hit |= x == kp
                    return hit & (x > 0)

            # Window edge: below gidx=s there is no left context — the
            # composed transfer stays the current one (identity on its own
            # keeps), matching the XLA formulation bit-for-bit.
            edge = gidx < s
            rolled = [_rollf(kp, s) for kp in keeps]
            rd = _rollf(dflt, s)
            new_keeps = [jnp.where(edge, kp, jnp.where(in_b(r), r, 0))
                         for kp, r in zip(keeps, rolled)]
            dflt = jnp.where(edge, dflt, jnp.where(in_b(rd), rd, dflt))
            keeps = new_keeps
        off = dflt
        if sticky == "sig":
            # Exact re-verification gate (see encode._sticky_offsets_sig).
            ver = (off == cands0[0]) & (off > 0)
            for kp in cands0[1:]:
                ver |= (off == kp) & (off > 0)
            off = jnp.where(ver, off, cands0[0])

        # --- match lengths: stride-4 links, capped doubling, phase max ---
        m4 = off > 0
        link = m4 & _rollb(m4.astype(jnp.int32), 4).astype(jnp.bool_) \
            & (_rollb(off, 4) == off)
        r = link.astype(jnp.int32)
        step = 1
        for _ in range(4):
            r = jnp.where(r == step, step + _rollb(r, 4 * step), r)
            step *= 2
        mlq = jnp.where(m4, 4 + 4 * jnp.minimum(r, 16), 0)
        ml = mlq
        for p in (1, 2, 3):
            agree = (_rollb(off, p) == off) & \
                _rollb(m4.astype(jnp.int32), p).astype(jnp.bool_)
            ml = jnp.maximum(ml, jnp.where(agree, p + _rollb(mlq, p), 0))
        ml = jnp.where(m4, ml, 0)
        ml = jnp.minimum(ml, n - gidx)

        # --- profitability filter (window count of other match starts) ---
        # Doubling window-sum: 5 zero-filled rolls instead of 16 (w covers
        # [i-15, i] after 4 doublings; one more +1 roll shifts it to the
        # [i-16, i-1] window the filter needs). Integer-exact, identical
        # to the 16-term sum.
        m4i = (ml > 0).astype(jnp.int32)

        def rollz(x, t):
            return jnp.where(gidx >= t, _rollf(x, t), 0)

        w = m4i
        for t in (1, 2, 4, 8):
            w = w + rollz(w, t)
        before16 = rollz(w, 1)
        isolated = before16 == 0
        near = off < 2048
        keep = ((ml >= 5) | near) & ((ml >= 6) | near | ~isolated)
        ml = jnp.where(keep, ml, 0)

        # --- suffix propagation: windowed max-plus, 7 levels ---
        pv = ml + gidx
        offp = off
        for lvl in range(7):
            s = 1 << lvl
            av = jnp.where(gidx >= s, _rollf(pv, s), -1)
            ao = _rollf(offp, s)
            take = av > pv
            pv = jnp.where(take, av, pv)
            offp = jnp.where(take, ao, offp)
        mlp = jnp.minimum(pv - gidx, 68)

        if lazy:
            # Lazy one-position lookahead (mirrors encode._matcher_xla):
            # defer the match at i to a literal whenever the match at i+1
            # is >= `lazy` bytes longer. _rollb wraps, so the last position
            # (no successor) is masked to 0 like the XLA .at[-1].set(0).
            nxt = jnp.where(gidx == N - 1, 0, _rollb(mlp, 1))
            defer = (mlp >= 4) & (mlp < 64) & (nxt >= mlp + lazy)
            mlp = jnp.where(defer, 0, mlp)

        # --- greedy jump rule ---
        jump_ref[:] = jnp.where(
            mlp < 4, 1,
            jnp.where(mlp <= 64, mlp, jnp.where(mlp < 68, 60, 64)))
        off_ref[:] = offp

    return kernel


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("lazy", "sticky"))
def matcher_block(cands: jax.Array, n: jax.Array, lazy: int = 0,
                  sticky: str = "exact"):
    """cands: (N, K) int32 candidate offsets (column 0 = sticky default);
    n: scalar. Returns (jump (N,), off (N,))."""
    k = cands.shape[-1]
    c3 = jnp.moveaxis(cands, -1, 0).reshape(k, ROWS, LANES)
    outs = pl.pallas_call(
        _make_kernel(k, False, lazy, sticky),
        in_specs=[
            pl.BlockSpec((k, ROWS, LANES), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
        interpret=_interpret(),
    )(c3, jnp.reshape(n, (1, 1)).astype(jnp.int32))
    return outs[0].reshape(N), outs[1].reshape(N)


@functools.partial(jax.jit, static_argnames=("k", "lazy", "sticky"))
def matcher_block_packed(pref: jax.Array, words: jax.Array, n: jax.Array,
                         k: int, lazy: int = 0, sticky: str = "exact"):
    """Packed-table form: pref (N,) int32 gated default + words (N, K//2)
    u32 restore-sort payloads (two 16-bit offsets per word, unpacked
    in-kernel). Bit-identical to matcher_block on the unpacked table."""
    w3 = jnp.moveaxis(words.astype(jnp.int32), -1, 0).reshape(
        k // 2, ROWS, LANES)
    outs = pl.pallas_call(
        _make_kernel(k, True, lazy, sticky),
        in_specs=[
            pl.BlockSpec((k // 2, ROWS, LANES), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda: (0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)] * 2,
        interpret=_interpret(),
    )(w3, pref.reshape(ROWS, LANES),
      jnp.reshape(n, (1, 1)).astype(jnp.int32))
    return outs[0].reshape(N), outs[1].reshape(N)
