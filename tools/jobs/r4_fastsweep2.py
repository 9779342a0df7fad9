# Round-4 FAST sweep 2: recover K=7's 0.25% aggregate miss via probe
# dedup (free) / lazy=3 / flatten="lift".
import sys

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import numpy as np
import tpu_snappy.ops.encode as E
from tpu_snappy import format as fmt
from tpu_snappy.config import CodecConfig
from tpu_snappy.native import golden
from tpu_snappy.parallel import shard
from tpu_snappy.utils import corpus, profiling

WAVE = 24
N = fmt.BLOCK_SIZE
mtg = corpus.load("all-mtg-cards.txt")
n = len(mtg)
nblocks = -(-n // N)
nwaves = -(-nblocks // WAVE)
arr, lengths, _ = shard.blocks_of(mtg, N, nwaves * WAVE)
ad = jax.device_put(arr)
ld = jax.device_put(jnp.asarray(lengths))
snappy_size = len(golden.compress(mtg))

cfgs = [
    ("K=7 p=9       ", CodecConfig(candidates=7, probes=9)),
    ("K=7 p=10      ", CodecConfig(candidates=7, probes=10)),
    ("K=7 p=12      ", CodecConfig(candidates=7, probes=12)),
    ("K=7 p=10 lazy3", CodecConfig(candidates=7, probes=10, lazy=3)),
    ("K=7 p=10 lift ", CodecConfig(candidates=7, probes=10,
                                   flatten="lift")),
    ("K=8 p=12      ", CodecConfig(candidates=8, probes=12)),
]
for tag, cfg in cfgs:
    E.encode_corpus.clear_cache()
    f = jax.jit(lambda b, l, c=cfg: E.encode_corpus(b, l, c, wave=WAVE))
    try:
        out, lens = f(ad, ld)
        lens_np = np.asarray(lens)
        size = int(lens_np[:nblocks].sum()) + len(fmt.varint_encode(n))
        on = np.asarray(out)
        comp = fmt.varint_encode(n) + b"".join(
            on[i, : lens_np[i]].tobytes() for i in range(nblocks))
        rt = golden.uncompress(comp) == mtg
        t = profiling.device_bench(f, ad, ld, iters=20)
        print(f"{tag}: {t/(nwaves*WAVE)*1e6:6.1f} us/block "
              f"{n/t/1e9:.3f} GB/s size={size} x{size/snappy_size:.4f} "
              f"rt={bool(rt)}", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
E.encode_corpus.clear_cache()
