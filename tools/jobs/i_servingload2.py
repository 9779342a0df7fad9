# r5 item 7: serving-under-load with the PIPELINED batcher (depth-2
# wave overlap, kinds interleave on the device stream) -> refreshed
# results/serving_load.json + a device-bound projection receipt
# (standalone per-wave device times x observed per-kind wave counts
# vs wall time). Same request mix as r4's z2_servingload.
import sys

for m in list(sys.modules):
    if m.startswith("tpu_snappy"):
        del sys.modules[m]

import json
import threading
import time

import numpy as np

from tpu_snappy import serving
from tpu_snappy.native import golden
from tpu_snappy.utils import corpus, profiling

mtg = corpus.load("all-mtg-cards.txt")
rng = np.random.default_rng(5)
REQ = 256 * 1024

payloads = [mtg[i * REQ:(i + 1) * REQ] for i in range(10)]
payloads += [rng.integers(0, 256, REQ, np.uint8).tobytes(),
             b"z" * REQ,
             mtg[:REQ // 2] + b"q" * (REQ // 2)]
comps = [golden.compress(p) for p in payloads]

with serving.CodecServer(wave=8, max_wait_ms=10.0) as srv:
    wfr = srv.compress_framed(payloads[0], sidecar="always").result(1200)
    srv.compress(payloads[0]).result(1200)
    srv.decompress(comps[0]).result(1200)
    srv.decompress_framed(wfr).result(1200)
    srv.stats = serving.ServerStats()
    t0 = time.time()
    futs = []
    lock = threading.Lock()

    def submit(kind, items):
        for it in items:
            if kind == "c":
                f = srv.compress(it)
            elif kind == "d":
                f = srv.decompress(it)
            else:
                f = srv.compress_framed(it, sidecar="always")
            with lock:
                futs.append((kind, it, f))

    threads = [threading.Thread(target=submit, args=("c", payloads)),
               threading.Thread(target=submit, args=("d", comps)),
               threading.Thread(target=submit, args=("f", payloads[:4]))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    in_bytes = 0
    framed_out = []
    for kind, it, f in futs:
        r = f.result(timeout=1200)
        in_bytes += len(it)
        if kind == "c":
            assert golden.uncompress(r) == it
        elif kind == "d":
            assert r == payloads[comps.index(it)]
        else:
            framed_out.append(r)
    elapsed = time.time() - t0
    t1 = time.time()
    dfuts = [srv.decompress_framed(fr) for fr in framed_out]
    for (i, p), f in zip(enumerate(payloads[:4]), dfuts):
        assert f.result(timeout=1200) == payloads[i]
    framed_s = time.time() - t1
    stats = srv.stats
    lat = stats.latency_percentiles()
    wbk = dict(stats.waves_by_kind)

    # Device-bound projection: standalone per-wave device time per kind.
    W = srv._wave
    blocks = np.zeros((W, 65536), np.uint8)
    for j in range(W):
        blocks[j] = np.frombuffer(payloads[j % 10][:65536], np.uint8)
    lens = np.full(W, 65536, np.int32)
    t_enc = profiling.device_bench(srv._enc, blocks, lens, iters=10)
    from tpu_snappy import format as fmt
    from tpu_snappy.ops import decode as D
    frg, cl, ul = D.fragment_table(comps[0], fmt.varint_decode(comps[0])[1],
                                   len(payloads[0]))
    wdt = D.frag_width(cl)
    fr8 = np.zeros((W, wdt), np.uint8)
    cl8 = np.zeros(W, np.int32)
    ul8 = np.zeros(W, np.int32)
    for j in range(W):
        i = j % len(cl)
        fr8[j, :cl[i]] = frg[i, :cl[i]]
        cl8[j] = cl[i]
        ul8[j] = ul[i]
    t_dec = profiling.device_bench(srv._dec, fr8, cl8, ul8, iters=10)

dev_s = wbk.get("enc", 0) * t_enc + (wbk.get("dec", 0) + wbk.get("dcd", 0)
                                     + wbk.get("scd", 0)) * t_dec
res = {
    "platform": "v5e-1chip-tunnel",
    "note": ("CodecServer under concurrent load, PIPELINED batcher "
             "(depth 2: submit wave k+1 before syncing wave k; kinds "
             "interleave on the device stream). Latencies include ~30ms "
             "tunnel RTT per wave sync. device_bound_projection = "
             "standalone per-wave device seconds x observed wave counts "
             "over measured wall seconds — the occupancy an attached-chip "
             "deployment of the same batcher would see (dec time used as "
             "the stand-in for the scd/dcd kinds' waves)."),
    "wave": 8, "max_wait_ms": 10.0,
    "requests": stats.requests, "units": stats.units,
    "waves": stats.waves, "waves_by_kind": wbk,
    "occupancy": round(stats.occupancy, 4),
    "spliced_fragments": stats.spliced_fragments,
    "mixed_phase_bytes": in_bytes,
    "mixed_phase_s": round(elapsed, 3),
    "mixed_phase_MBps": round(in_bytes / elapsed / 1e6, 2),
    "framed_sidecar_decode_s": round(framed_s, 3),
    "per_wave_device_s": {"enc": round(t_enc, 4), "dec": round(t_dec, 4)},
    "device_bound_projection": round(dev_s / elapsed, 4),
    "latency_ms": lat,
}
print(json.dumps(res, indent=1))
with open("/root/repo/results/serving_load.json", "w") as f:
    json.dump(res, f, indent=1)
