# Round-4: serving-under-load artifact on the real chip ->
# results/serving_load.json (VERDICT item 9). Concurrent compress +
# decompress + framed-with-sidecar requests through CodecServer's wave
# batcher; reports throughput, occupancy, latency percentiles.
# NOTE: latencies on this dev setup are tunnel-RTT-dominated (~30 ms per
# device sync); the artifact records that context.
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
from tpu_snappy.utils import corpus

mtg = corpus.load("all-mtg-cards.txt")
rng = np.random.default_rng(5)
REQ = 256 * 1024

payloads = [mtg[i * REQ:(i + 1) * REQ] for i in range(10)]
payloads += [rng.integers(0, 256, REQ, np.uint8).tobytes(),
             b"z" * REQ,
             mtg[:REQ // 2] + b"q" * (REQ // 2)]
comps = [golden.compress(p) for p in payloads]

results = {}
with serving.CodecServer(wave=8, max_wait_ms=10.0) as srv:
    # Warmup: compile every wave-kind graph (enc, dec, scd) before the
    # timed phase, then reset stats so latencies reflect steady state.
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
    # framed decode wave (exercises the sidecar 'scd' lane end to end)
    t1 = time.time()
    dfuts = [srv.decompress_framed(fr) for fr in framed_out]
    for (kindless, p), f in zip(enumerate(payloads[:4]), dfuts):
        assert f.result(timeout=1200) == payloads[kindless]
    elapsed2 = time.time() - t1
    st = srv.stats
    results = {
        "platform": "v5e-1chip-tunnel",
        "note": ("CodecServer under concurrent load; latencies include "
                 "~30ms tunnel RTT per wave sync — on directly-attached "
                 "chips the same batcher is device-bound. sidecar lane "
                 "uses the round-4 parent-direct path."),
        "wave": 8, "max_wait_ms": 10.0,
        "requests": st.requests,
        "units": st.units, "waves": st.waves,
        "occupancy": round(st.occupancy, 4),
        "spliced_fragments": st.spliced_fragments,
        "mixed_phase_bytes": in_bytes,
        "mixed_phase_s": round(elapsed, 3),
        "mixed_phase_MBps": round(in_bytes / elapsed / 1e6, 2),
        "framed_sidecar_decode_s": round(elapsed2, 3),
        "latency_ms": st.latency_percentiles(),
    }

with open("/root/repo/results/serving_load.json", "w") as fp:
    json.dump(results, fp, indent=1)
print(json.dumps(results, indent=1), flush=True)
