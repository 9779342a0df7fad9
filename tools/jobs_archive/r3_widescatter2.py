"""Probe: windowed scatter with BATCHED row dots (one dot_general over all
TR rows per limb per step) vs the per-row-loop production kernel. Both on
the real sidecar piece data (split=8)."""
import sys

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import functools
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import tpu_snappy.sidecar as sc
from tpu_snappy import format as fmt
from tpu_snappy.native import golden
from tpu_snappy.ops.pallas import scatter as psc
from tpu_snappy.utils import corpus, profiling

LO, TC = 128, 128

data = corpus.load("all-mtg-cards.txt")
B = 24
sc.SPLIT_LEN = 8
jobs = []
for i in range(B):
    blk = data[i * 65536:(i + 1) * 65536]
    comp = golden.compress(blk)
    total, start = fmt.varint_decode(comp)
    elems = comp[start:]
    payload = sc.build(elems, total)
    s2, vals = sc.split_for_device(*sc.parse(payload), total)
    jobs.append((s2, vals))
pw = max(sc.pieces_width(len(j[0])) for j in jobs)
S = np.full((B, pw), 65536, np.int32)
V = np.zeros((B, pw), np.int32)
for j, (s2, vals) in enumerate(jobs):
    S[j, : len(s2)] = s2
    V[j, : len(vals)] = vals
Sj, Vj = jnp.asarray(S), jnp.asarray(V)

WR = 8 * (sc.SPLIT_LEN + 1)


def make_wide(limbs, hi_n, wrows, tr):
    cap = hi_n * LO

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
            base = jnp.minimum((m >> 10) << 3, hi_n - wrows)
            rel = (dest >> 7) - base
            rel = jnp.where(active, rel, wrows)
            ovf_ref[0, 0] += jnp.sum(((rel >= wrows) & active)
                                     .astype(jnp.int32))
            lo = dest & (LO - 1)
            # batched one-hots over all tr rows at once
            h_oh = (rel[:, :, None] ==
                    jax.lax.broadcasted_iota(jnp.int32, (tr, TC, wrows), 2)
                    ).astype(jnp.bfloat16)          # (tr, TC, WR)
            lo_oh = (lo[:, :, None] ==
                     jax.lax.broadcasted_iota(jnp.int32, (tr, TC, LO), 2)
                     ).astype(jnp.bfloat16)         # (tr, TC, LO)
            for j in range(limbs):
                vv = v_refs[j][:]
                lov = lo_oh * vv[:, :, None].astype(jnp.bfloat16)
                z = jax.lax.dot_general(
                    h_oh, lov,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (tr, WR, LO)
                acc[j, pl.ds(base, wrows), :] += jnp.sum(z, axis=0)
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            res = acc[0].astype(jnp.int32)
            for j in range(1, limbs):
                res = (res << 8) | acc[j].astype(jnp.int32)
            out_ref[:] = res

    return kernel


def wide_scatter(dest, values, limbs, out_cells, wrows, tr):
    mm = dest.shape[-1]
    hi_n = out_cells // LO
    d2 = dest.reshape(mm // TC, TC)
    vs = [(values >> (8 * (limbs - 1)) if j == 0
           else (values >> (8 * (limbs - 1 - j))) & 0xFF)
          .reshape(mm // TC, TC).astype(jnp.float32) for j in range(limbs)]
    tile = pl.BlockSpec((tr, TC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out, ovf = pl.pallas_call(
        make_wide(limbs, hi_n, wrows, tr),
        grid=(mm // (tr * TC),),
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
    )(d2, *vs)
    return out.reshape(out_cells), ovf[0, 0]


ref_fn = jax.jit(lambda s, v: jax.vmap(
    lambda a, b: psc.scatter_windowed(a, b, 3, 65536, wrows=WR)[0])(s, v))
ref = np.asarray(ref_fn(Sj, Vj))
t0 = profiling.device_bench(ref_fn, Sj, Vj, iters=20)
print(f"per-row kernel (WR={WR}): {t0/B*1e6:.1f} us/frag")
ref192_fn = jax.jit(lambda s, v: jax.vmap(
    lambda a, b: psc.scatter_windowed(a, b, 3, 65536, wrows=192)[0])(s, v))
assert (np.asarray(ref192_fn(Sj, Vj)) == ref).all()
t0 = profiling.device_bench(ref192_fn, Sj, Vj, iters=20)
print(f"per-row kernel (WR=192): {t0/B*1e6:.1f} us/frag")

for tr, wrows in ((8, WR), (16, 8 * (2 * sc.SPLIT_LEN + 1) + 8),
                  (32, 8 * (4 * sc.SPLIT_LEN + 1) + 8)):
    # window span grows with sources/tile: tr*TC*SPLIT + 1024 slop cells
    need = (tr * TC * sc.SPLIT_LEN + 1024 + 127) // 128
    wrows = ((need + 7) // 8) * 8
    try:
        f = jax.jit(functools.partial(
            lambda s, v, tr=tr, wrows=wrows: jax.vmap(
                lambda a, b: wide_scatter(a, b, 3, 65536, wrows, tr)[0]
            )(s, v)))
        got = np.asarray(f(Sj, Vj))
        okc = (got == ref).all()
        t = profiling.device_bench(f, Sj, Vj, iters=20)
        print(f"wide tr={tr} wrows={wrows}: exact={bool(okc)} "
              f"{t/B*1e6:.1f} us/frag")
    except Exception as e:
        print(f"wide tr={tr} wrows={wrows}: FAIL {str(e)[:160]}")
