"""Tail op census + attribution (VERDICT r3 item 3).

1. Build the mtg own-stream 24-wide wave, extract (lit, src) via
   parse_transport, simulate the lockstep dense rounds (cap semantics of
   the vmapped while loop) on host.
2. Census per-tile local-round bodies the tail's while loops execute.
3. Measure on device: full tiledtail decode, absorb-only tail (true
   fixpoint src + resolved=True), and the tail on post-dense src.
4. Fit per-op costs; print the attribution table.
"""
import sys

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import numpy as np
from tpu_snappy import format as fmt
from tpu_snappy.config import DEFAULT_CONFIG
from tpu_snappy.ops import decode as D, encode as E
from tpu_snappy.ops.pallas import tiledres
from tpu_snappy.parallel import shard
from tpu_snappy.utils import corpus, profiling

data = corpus.load("all-mtg-cards.txt")
n = len(data)
B = 24
arr, lengths, _ = shard.blocks_of(data, fmt.BLOCK_SIZE, 2 * B)
enc = jax.jit(lambda b, l: E.encode_corpus(b, l, DEFAULT_CONFIG, wave=B))
out_np, lens_np = [np.asarray(x) for x in enc(arr, lengths)]
nblocks = -(-n // fmt.BLOCK_SIZE)
comp = fmt.varint_encode(n) + b"".join(
    out_np[i, : lens_np[i]].tobytes() for i in range(nblocks))
total, start = fmt.varint_decode(comp)
frags, clens, ulens = D.fragment_table(comp, start, total)
w = D.frag_width(clens)
frags = np.asarray(frags)[:B, :w]
clens = np.asarray(clens)[:B].astype(np.int32)
ulens = np.asarray(ulens)[:B].astype(np.int32)
print("wave:", frags.shape)

front = jax.jit(jax.vmap(lambda c, cl, ul: D.parse_transport(c, cl, ul)))
lit, src, okf = [np.asarray(x) for x in front(frags, clens, ulens)]
print("front ok:", okf.all())

# --- simulate lockstep dense rounds (vmapped while: done lanes freeze) ---
CAP = D.TAIL_CAP
s = src.copy()
cnt = np.full(B, 1 << 17)
rounds = 0
active = np.ones(B, bool)
while active.any() and rounds < 16:
    s2 = np.take_along_axis(s, s, axis=1)
    moved = (s2 != s).sum(axis=1)
    s[active] = s2[active]
    cnt[active] = moved[active]
    rounds += 1
    active = active & (cnt > CAP)
print(f"dense rounds (lockstep, cap {CAP}): {rounds}; "
      f"post counts {sorted(cnt)[:4]}..{sorted(cnt)[-4:]}")

# --- census: per-tile local bodies on the post-dense state ---
TILE = D.TAIL_TILE
NT = 65536 // TILE
max_local = TILE.bit_length()
tot_pre = tot_bodies = 0
body_hist = {}
for b in range(B):
    for t in range(NT):
        base = t * TILE
        st = s[b, base: base + TILE].copy()
        pos = np.arange(base, base + TILE)
        if not ((st >= base) & (st != pos)).any():
            continue  # precheck skips the while loop entirely
        tot_pre += 1
        bodies = 0
        while bodies < max_local:
            in_t = st >= base
            idx = np.clip(st - base, 0, TILE - 1)
            s2 = np.where(in_t, st[idx], st)
            bodies += 1
            if (s2 == st).all():
                break
            st = s2
        tot_bodies += bodies
        body_hist[bodies] = body_hist.get(bodies, 0) + 1
print(f"tiles with locals: {tot_pre}/{B*NT}; total while bodies "
      f"{tot_bodies} = {tot_bodies/B:.1f}/frag; hist {sorted(body_hist.items())}")

# --- device measurements ---
litj = jnp.asarray(lit)
dec = jax.jit(lambda f, c, u: D.decode_corpus(f, c, u, wave=B))
fj, cj, uj = map(jnp.asarray, (frags, clens, ulens))
t_full = profiling.device_bench(dec, fj, cj, uj, iters=20)
print(f"full decode: {t_full/B*1e6:.1f} us/frag")

# absorb-only: true fixpoint src, resolved=True
sfix = s.copy()
for _ in range(17):
    sfix = np.take_along_axis(sfix, sfix, axis=1)
sfixj = jnp.asarray(sfix)
tail_res = jax.jit(lambda l, q: jax.vmap(
    lambda a, b2: tiledres.resolve_tiled(a, b2, resolved=jnp.bool_(True)))(
        l, q))
outr = np.asarray(tail_res(litj, sfixj))
exp = np.take_along_axis(lit, sfix, axis=1)
print("absorb-only exact:", (outr == exp).all())
t_abs = profiling.device_bench(tail_res, litj, sfixj, iters=20)
print(f"absorb-only tail: {t_abs/B*1e6:.1f} us/frag")

# tail on post-dense state (the real tail work), resolved=False
spost = jnp.asarray(s)
tail_post = jax.jit(lambda l, q: jax.vmap(
    lambda a, b2: tiledres.resolve_tiled(a, b2))(l, q))
outp = np.asarray(tail_post(litj, spost))
print("post-dense tail exact:", (outp == exp).all())
t_tail = profiling.device_bench(tail_post, litj, spost, iters=20)
print(f"tail on post-dense src: {t_tail/B*1e6:.1f} us/frag")

# fit
locals_per_frag = tot_bodies / B
c_local = (t_tail - t_abs) / max(1, tot_bodies) * 1e6
print(f"ATTRIBUTION: absorbs+prechecks {t_abs/B*1e6:.1f} us "
      f"({t_abs/B/16*1e6:.2f} us/absorb-step) + locals "
      f"{locals_per_frag:.1f} bodies x {c_local:.2f} us = "
      f"{(t_tail)/B*1e6:.1f} us/frag tail")

# check=2 variant
tail_c2 = jax.jit(lambda l, q: jax.vmap(
    lambda a, b2: tiledres.resolve_tiled(a, b2, check=2))(l, q))
outc = np.asarray(tail_c2(litj, spost))
print("check=2 exact:", (outc == exp).all())
t_c2 = profiling.device_bench(tail_c2, litj, spost, iters=20)
print(f"tail check=2: {t_c2/B*1e6:.1f} us/frag")
