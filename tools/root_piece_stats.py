"""Root-map piece statistics: the measurement behind DESIGN.md
"Round-2c: the formulation-independent decode ceiling".

Walks our own mtg stream's elements, builds the per-byte source map
f(x) = x - off(x), chases it to the fixed point, and counts maximal
affine runs (pieces) of both the initial and the root map. Result
(recorded, tools/jobs/b_rootruns.out): ~8.6K elements but ~27K ROOT
pieces per 64 KB fragment — piece count triples under iteration, which
kills interval-composition decoding (work would exceed the byte-level
pipeline's). Run via the warm TPU runner (encode on device) or anywhere
with the corpus mounted."""
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from tpu_snappy import api
from tpu_snappy.utils import corpus
from tpu_snappy import format as fmt

data = corpus.load("all-mtg-cards.txt")
comp = api.compress(data)
total, start = fmt.varint_decode(comp)
buf = np.frombuffer(comp, np.uint8)
ip, op = start, 0
n = len(buf)
BS = fmt.BLOCK_SIZE
src_all = np.zeros(total, np.int64)
nelem = 0
while ip < n:
    tag = int(buf[ip]); kind = tag & 3
    if kind == 0:
        code = tag >> 2
        if code < 60:
            outb = code + 1; esize = 1 + outb
        else:
            extra = code - 59
            outb = int.from_bytes(buf[ip+1:ip+1+extra].tobytes(), "little") + 1
            esize = 1 + extra + outb
        src_all[op:op+outb] = np.arange(op, op+outb)
    else:
        esize = 2 if kind == 1 else 3 if kind == 2 else 5
        outb = (((tag >> 2) & 7) + 4) if kind == 1 else (tag >> 2) + 1
        if kind == 1: off = ((tag >> 5) << 8) | int(buf[ip+1])
        elif kind == 2: off = int.from_bytes(buf[ip+1:ip+3].tobytes(), "little")
        else: off = int.from_bytes(buf[ip+1:ip+5].tobytes(), "little")
        src_all[op:op+outb] = np.arange(op, op+outb) - off
    ip += esize; op += outb; nelem += 1

nfrag = -(-total // BS)
runs_per_frag = []
init_pieces = []
for f in range(nfrag):
    lo, hi = f*BS, min((f+1)*BS, total)
    s = (src_all[lo:hi] - lo).clip(0)
    init_pieces.append(int((s[1:] != s[:-1] + 1).sum()) + 1)
    root = s.copy()
    for r in range(24):
        nxt = root[root]
        if (nxt == root).all():
            break
        root = nxt
    runs_per_frag.append(int((root[1:] != root[:-1] + 1).sum()) + 1)
print("elements total:", nelem, " per-frag:", nelem // nfrag)
print("initial src-map affine pieces/frag: mean %.0f min %d max %d" % (
    np.mean(init_pieces), np.min(init_pieces), np.max(init_pieces)))
print("ROOT-map affine pieces/frag: mean %.0f min %d max %d" % (
    np.mean(runs_per_frag), np.min(runs_per_frag), np.max(runs_per_frag)))
