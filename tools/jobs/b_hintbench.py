# Round-4: depth-hinted decode headline A/B on mtg (device path +
# framed end-to-end), with native-computed hints (the shipping path).
import sys
import time

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import numpy as np

import tpu_snappy.ops.decode as D
from tpu_snappy import format as fmt, framing
from tpu_snappy.config import DEFAULT_CONFIG
from tpu_snappy.native import golden
from tpu_snappy.ops import encode as ops_encode
from tpu_snappy.parallel import shard
from tpu_snappy.utils import corpus, profiling

WAVE = 24
N = fmt.BLOCK_SIZE
mtg = corpus.load("all-mtg-cards.txt")
n = len(mtg)
nblocks = -(-n // N)
nwaves = -(-nblocks // WAVE)
arr, lengths, _ = shard.blocks_of(mtg, N, nwaves * WAVE)
enc = jax.jit(lambda b, l: ops_encode.encode_corpus(
    b, l, DEFAULT_CONFIG, wave=WAVE))
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
deps = np.zeros((B, D.OUT // D.TAIL_TILE), np.int32)
t0 = time.time()
for i in range(nf):
    deps[i] = golden.depth_hints(
        frags[i, : clens[i]].tobytes(), int(ulens[i]),
        D.TAIL_CAP, D.TAIL_TILE)
t_hint = (time.time() - t0) / nf
print(f"native hint build: {t_hint*1e3:.3f} ms/chunk", flush=True)

fd = jax.device_put(np.pad(frags, ((0, pad), (0, 0))))
cd = jax.device_put(np.pad(np.asarray(clens, np.int32), (0, pad)))
ud = jax.device_put(np.pad(np.asarray(ulens, np.int32), (0, pad)))
dd = jax.device_put(deps)

plain = jax.jit(lambda f, c, u: D.decode_corpus(f, c, u, wave=WAVE))
hinted = jax.jit(lambda f, c, u, d: D.decode_corpus_depth(
    f, c, u, d, wave=WAVE))

o1, k1 = plain(fd, cd, ud)
o2, k2 = hinted(fd, cd, ud, dd)
same = (np.asarray(o1) == np.asarray(o2)).all() and \
    bool(np.asarray(k1)[:nf].all()) and bool(np.asarray(k2)[:nf].all())
t_p = profiling.device_bench(plain, fd, cd, ud, iters=20)
t_h = profiling.device_bench(hinted, fd, cd, ud, dd, iters=20)
print(f"device decode: plain {t_p/B*1e6:.1f} us/frag "
      f"({n/t_p/1e9:.3f} GB/s) | hinted {t_h/B*1e6:.1f} "
      f"({n/t_h/1e9:.3f} GB/s) | identical={same}", flush=True)

# framed end-to-end (host-orchestrated, incl. CRC + assembly)
fr_auto = framing.compress(mtg, sidecar="auto")
fr_off = framing.compress(mtg, sidecar="off")
print(f"framed sizes: off {len(fr_off)} auto {len(fr_auto)} "
      f"(+{len(fr_auto)-len(fr_off)} B hints)", flush=True)
for tag, fr, use in (("off    ", fr_off, True),
                     ("hints  ", fr_auto, True),
                     ("ignored", fr_auto, False)):
    back = framing.decompress(fr, use_sidecar=use)
    assert back == mtg
    t0 = time.time()
    for _ in range(5):
        framing.decompress(fr, use_sidecar=use)
    dt = (time.time() - t0) / 5
    print(f"framed e2e {tag}: {dt*1e3:7.1f} ms = {n/dt/1e6:6.1f} MB/s",
          flush=True)
