# Turbo preset confirmation: K=3 levels sensitivity + real-50000 size
# head-to-head vs the RTL's own recorded output (32683 B on real-50KB,
# hw_results.csv:25).
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

for tag, levels, lazy in (("l4 g2", 4, 2), ("l1 g2", 1, 2), ("l2 g0", 2, 0)):
    E.STICKY_LEVELS = levels
    E.encode_corpus.clear_cache()
    cfg = CodecConfig(candidates=3, probes=3, sticky="sig", lazy=lazy)
    f = jax.jit(lambda b, l, c=cfg: E.encode_corpus(b, l, c, wave=WAVE))
    out, lens = f(ad, ld)
    lens_np = np.asarray(lens)
    size = int(lens_np[:nblocks].sum()) + len(fmt.varint_encode(n))
    on = np.asarray(out)
    comp = fmt.varint_encode(n) + b"".join(
        on[i, : lens_np[i]].tobytes() for i in range(nblocks))
    rt = golden.uncompress(comp) == mtg
    t = profiling.device_bench(f, ad, ld, iters=20)
    gbps = n / t / 1e9
    print(f"K=3 sig {tag}: {t/(nwaves*WAVE)*1e6:6.1f} us/block "
          f"{gbps:.3f} GB/s {0.94/gbps:.2f} cyc/B size={size} "
          f"x{size/snappy_size:.4f} rt={bool(rt)}", flush=True)

# real-50000 head-to-head at K=3 sig l4 (the RTL's own benchmark file)
E.STICKY_LEVELS = 4
E.encode_corpus.clear_cache()
from tpu_snappy import api
cfg = CodecConfig(candidates=3, probes=3, sticky="sig")
real = corpus.load("real-50000")
ours = api.compress(real, cfg=cfg)
assert golden.uncompress(ours) == real
sw = len(golden.compress(real))
print(f"real-50000: ours(K=3 turbo)={len(ours)} B, software snappy={sw} B, "
      f"RTL recorded=32683 B -> ours/RTL={len(ours)/32683:.3f}", flush=True)
E.encode_corpus.clear_cache()
