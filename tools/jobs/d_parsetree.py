# r5 item 1b: parse entry-scan halving tree (concatenated pair tables,
# scan.entry_states_tree_general) on the hinted decode path — levels
# 0/1/2/3 A/B at the shipped operating point (cap 57344, tile 1024),
# plus the cap 61440 gap point left by a_captile. Bit-identity asserted.
import sys
import importlib

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import numpy as np
import tpu_snappy.ops.decode as D
from tpu_snappy import format as fmt
from tpu_snappy.config import DEFAULT_CONFIG
from tpu_snappy.native import golden
from tpu_snappy.ops import encode as E
from tpu_snappy.parallel import shard
from tpu_snappy.utils import corpus, profiling

WAVE = 24
N = fmt.BLOCK_SIZE
mtg = corpus.load("all-mtg-cards.txt")
n = len(mtg)
nblocks = -(-n // N)
enc = jax.jit(lambda b, l: E.encode_corpus(b, l, DEFAULT_CONFIG, wave=WAVE))
arr, lengths, _ = shard.blocks_of(mtg, N, -(-nblocks // WAVE) * WAVE)
out_np, lens_np = [np.asarray(x) for x in enc(
    jax.device_put(arr), jax.device_put(jnp.asarray(lengths)))]
comp = fmt.varint_encode(n) + b"".join(
    out_np[i, :lens_np[i]].tobytes() for i in range(nblocks))
total, start = fmt.varint_decode(comp)
frags, clens, ulens = D.fragment_table(comp, start, total)
frags = frags[:, : D.frag_width(clens)]
nf = len(clens)
pad = -nf % WAVE
B = nf + pad
fd = jax.device_put(np.pad(frags, ((0, pad), (0, 0))))
cd = jax.device_put(np.pad(np.asarray(clens, np.int32), (0, pad)))
ud = jax.device_put(np.pad(np.asarray(ulens, np.int32), (0, pad)))
exp = []
off = 0
for i in range(nf):
    exp.append(mtg[off: off + int(ulens[i])])
    off += int(ulens[i])


def run_point(cap, tile, levels, label):
    D.TAIL_CAP = cap
    D.HINT_TILE = tile
    D.PARSE_TREE_LEVELS = levels
    deps = np.zeros((B, D.OUT // tile), np.int32)
    for i in range(nf):
        deps[i] = golden.depth_hints(
            frags[i, : clens[i]].tobytes(), int(ulens[i]), cap, tile)
    dd = jax.device_put(deps)

    def corpus_fn(fr, cl, ul, dp):
        nfr = fr.shape[0]
        fw = fr.reshape(nfr // WAVE, WAVE, fr.shape[-1])
        cw = cl.reshape(nfr // WAVE, WAVE)
        uw = ul.reshape(nfr // WAVE, WAVE)
        dw = dp.reshape(nfr // WAVE, WAVE, dp.shape[-1])
        out, ok = jax.lax.map(
            lambda t: jax.vmap(
                lambda c, l, u, d: D.decode_fragment(
                    c, l, u, "depthtail", "auto", True, d))(*t),
            (fw, cw, uw, dw))
        return out.reshape(nfr, -1), ok.reshape(nfr)

    f = jax.jit(corpus_fn)
    out, ok = f(fd, cd, ud, dd)
    on, okn = np.asarray(out), np.asarray(ok)
    ident = all(bool(okn[i]) and on[i, : int(ulens[i])].tobytes() == exp[i]
                for i in range(nf))
    t = profiling.device_bench(f, fd, cd, ud, dd, iters=20) / B * 1e6
    print(f"{label}: {t:7.1f} us/frag identical={ident}", flush=True)


for lv in (0, 1, 2, 3):
    run_point(57344, 1024, lv, f"cap 57344 tile 1024 tree L={lv}")
run_point(61440, 1024, 0, "cap 61440 tile 1024 tree L=0")
