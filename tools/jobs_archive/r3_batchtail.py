"""Probe: FULLY-batched tail (locals + absorbs across B fragments in one
kernel) vs per-fragment vmapped resolve_tiled, on the REAL mtg post-dense
state with correct expected values (the round-2b probe's exp was wrong).

Hypothesis from the census: locals are 55.4 bodies/frag x 5.6 us and the
ops are tiny (32,128,32) — issue-bound, so batch-dim dots should amortize
the in-kernel op floor across fragments. Absorbs are big (work-bound,
round-2b) — expect ~neutral there.
"""
import sys

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import functools
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_snappy import format as fmt
from tpu_snappy.config import DEFAULT_CONFIG
from tpu_snappy.ops import decode as D, encode as E
from tpu_snappy.ops.pallas import tiledres
from tpu_snappy.parallel import shard
from tpu_snappy.utils import corpus, profiling

HI, LO = 512, 128
TILE = 4096
TR = TILE // LO
NT = 65536 // TILE
MAXL = TILE.bit_length()

data = corpus.load("all-mtg-cards.txt")
n = len(data)
W = 24
arr, lengths, _ = shard.blocks_of(data, fmt.BLOCK_SIZE, 2 * W)
enc = jax.jit(lambda b, l: E.encode_corpus(b, l, DEFAULT_CONFIG, wave=W))
out_np, lens_np = [np.asarray(x) for x in enc(arr, lengths)]
nblocks = -(-n // fmt.BLOCK_SIZE)
comp = fmt.varint_encode(n) + b"".join(
    out_np[i, : lens_np[i]].tobytes() for i in range(nblocks))
total, start = fmt.varint_decode(comp)
frags, clens, ulens = D.fragment_table(comp, start, total)
w = D.frag_width(clens)
frags = np.asarray(frags)[:W, :w]
clens = np.asarray(clens)[:W].astype(np.int32)
ulens = np.asarray(ulens)[:W].astype(np.int32)
front = jax.jit(jax.vmap(lambda c, cl, ul: D.parse_transport(c, cl, ul)))
lit, src, okf = [np.asarray(x) for x in front(frags, clens, ulens)]

# post-dense state (1 lockstep round at cap 57344 per census)
s = np.take_along_axis(src, src, axis=1)
sfix = s.copy()
for _ in range(17):
    sfix = np.take_along_axis(sfix, sfix, axis=1)
exp = np.take_along_axis(lit, sfix, axis=1)


def make_batch_kernel(B, th):
    THR = TR // th  # absorb half rows

    def kernel(src_ref, lit_ref, out_ref, p_ref):
        p_ref[:] = lit_ref[:].astype(jnp.bfloat16)

        def step(t, _):
            base = t * TILE
            s0 = src_ref[:, pl.ds(t * TR, TR), :]  # (B, TR, LO)

            def one_round(s1):
                d = s1 - base
                in_t = d >= 0
                dc = jnp.where(in_t, d, 0)
                h_oh = ((dc >> 7)[:, :, :, None] ==
                        jax.lax.broadcasted_iota(
                            jnp.int32, (B, TR, LO, TR), 3)
                        ).astype(jnp.bfloat16)
                l_oh = ((dc & 127)[:, :, :, None] ==
                        jax.lax.broadcasted_iota(
                            jnp.int32, (B, TR, LO, LO), 3)
                        ).astype(jnp.float32)
                z = (jax.lax.dot_general(
                        h_oh, (s1 & 0xFF00).astype(jnp.bfloat16),
                        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                        h_oh, (s1 & 0x00FF).astype(jnp.bfloat16),
                        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32))
                g = jnp.sum(z * l_oh, axis=3).astype(jnp.int32)
                return jnp.where(in_t, g, s1)

            pos = base + (
                jax.lax.broadcasted_iota(jnp.int32, (B, TR, LO), 1) * LO
                + jax.lax.broadcasted_iota(jnp.int32, (B, TR, LO), 2))

            def cond(c):
                _s, changed, r = c
                return changed & (r < MAXL)

            def body(c):
                s1, _, r = c
                s2 = one_round(s1)
                return s2, jnp.any(s2 != s1), r + 1

            pre = jnp.any((s0 >= base) & (s0 != pos))
            sl, _, _ = jax.lax.while_loop(cond, body,
                                          (s0, pre, jnp.int32(0)))

            # batched absorb, chunked over hi rows and target halves
            for h in range(th):
                sh = sl[:, h * THR:(h + 1) * THR, :]
                hi = sh >> 7
                z = jnp.zeros((B, THR, LO, LO), jnp.bfloat16)
                for hc in range(HI // 128):
                    oh = (hi[:, :, :, None] ==
                          (jax.lax.broadcasted_iota(
                              jnp.int32, (B, THR, LO, 128), 3) + hc * 128)
                          ).astype(jnp.bfloat16)
                    pc = p_ref[:, pl.ds(hc * 128, 128), :]
                    z = z + jax.lax.dot_general(
                        oh, pc,
                        dimension_numbers=(((3,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
                l_oh = ((sh & 127)[:, :, :, None] ==
                        jax.lax.broadcasted_iota(
                            jnp.int32, (B, THR, LO, LO), 3)
                        ).astype(jnp.bfloat16)
                byte = jnp.sum(z * l_oh, axis=3, dtype=jnp.float32)
                p_ref[:, pl.ds(t * TR + h * THR, THR), :] = byte.astype(
                    jnp.bfloat16)
                out_ref[:, pl.ds(t * TR + h * THR, THR), :] = byte.astype(
                    jnp.int32)
            return 0

        jax.lax.fori_loop(0, NT, step, 0)

    return kernel


def batch_tail_fn(B, th):
    @jax.jit
    def f(srcb, litb):
        return pl.pallas_call(
            make_batch_kernel(B, th),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, HI, LO), jnp.int32),
            scratch_shapes=[pltpu.VMEM((B, HI, LO), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(srcb, litb)
    return f


# per-frag baseline on the same state
litj = jnp.asarray(lit)
spost = jnp.asarray(s)
tail_post = jax.jit(lambda l, q: jax.vmap(
    lambda a, b2: tiledres.resolve_tiled(a, b2))(l, q))
outp = np.asarray(tail_post(litj, spost))
print("per-frag exact:", (outp == exp).all())
t_pf = profiling.device_bench(tail_post, litj, spost, iters=20)
print(f"per-frag tail: {t_pf/W*1e6:.1f} us/frag")

for B in (4, 8):
    for th in (2,):
        try:
            f = batch_tail_fn(B, th)
            sb = jnp.asarray(s[:B].reshape(B, HI, LO))
            lb = jnp.asarray(lit[:B].reshape(B, HI, LO))
            ob = np.asarray(f(sb, lb)).reshape(B, 65536)
            okb = (ob == exp[:B]).all()
            t = profiling.device_bench(f, sb, lb, iters=20)
            print(f"batched B={B} th={th}: exact={okb} "
                  f"{t/B*1e6:.1f} us/frag")
        except Exception as e:
            print(f"batched B={B} th={th}: FAIL {str(e)[:200]}")
