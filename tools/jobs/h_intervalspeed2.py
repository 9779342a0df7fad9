# r5 item 5, control rows the first run lacked: K=14 XLA (the Pallas
# kernel's measured margin — bounds what porting intervals into the
# kernel could recover) and K=12 points p=20 class XLA (isolates the
# interval's own overhead from the K/probe change).
import sys
import dataclasses

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import numpy as np
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
nb = -(-nblocks // WAVE) * WAVE
arr, lengths, _ = shard.blocks_of(mtg, N, nb)
bd = jax.device_put(arr)
ld = jax.device_put(jnp.asarray(lengths))


def bench(label, cfg, force_xla=False):
    E.FORCE_XLA_MATCHER = force_xla
    try:
        enc = jax.jit(lambda b, l, c=cfg: E.encode_corpus(b, l, c,
                                                          wave=WAVE))
        out, lens = enc(bd, ld)
        out_np, lens_np = np.asarray(out), np.asarray(lens)
        comp = fmt.varint_encode(n) + b"".join(
            out_np[i, :lens_np[i]].tobytes() for i in range(nblocks))
        assert golden.uncompress(comp) == mtg, label
        t = profiling.device_bench(enc, bd, ld, iters=20)
        print(f"{label:26s}: {n / t / 1e9:.4f} GB/s "
              f"({t / nb * 1e6:.1f} us/block) size {len(comp)}", flush=True)
    finally:
        E.FORCE_XLA_MATCHER = False


bench("K=14 points Pallas", DEFAULT_CONFIG)
bench("K=14 points XLA", DEFAULT_CONFIG, force_xla=True)
bench("K=12 points p=20 XLA",
      dataclasses.replace(DEFAULT_CONFIG, candidates=12, probes=20),
      force_xla=True)
