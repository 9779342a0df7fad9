"""Benchmark driver: one JSON line on stdout, detail on stderr.

Headline metric: encode throughput (GB/s per chip) on the reference repo's
headline corpus (data/all-mtg-cards.txt), with round-trip correctness and
the software-Snappy ratio bar checked in the same run. vs_baseline compares
against the BASELINE.md north-star target of 1 GB/s/chip encode.

The reference reports only simulator cycle counts (hw_results.csv — e.g.
3.50 cycles/byte on real-50000); GB/s on real silicon is our comparable.
Timing methodology: dispatch many iterations before syncing once — the axon
tunnel adds O(10ms) RTT per sync and its block_until_ready is unreliable, so
per-call host timing would measure the tunnel, not the chip.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


#: Blocks/fragments per vmapped wave inside the single-dispatch corpus
#: programs. Swept on v5e: encode improves with batch (499/450/462
#: us/block at 16/24/32 with windowed placement — the packed-candidate
#: matcher cleared the scoped-VMEM ceiling at 16); decode improves
#: through 24+ (1060/1022/994 at 16/24/32). 24 is the largest divisor of
#: the 48-block/fragment corpus — padding a wave with zero entries costs
#: full-lane work.
ENC_WAVE = 24
DEC_WAVE = 24

#: The speed presets run at wave 48 (one vmapped wave covers the whole
#: 48-block corpus, no lax.map step): measured ac_wave48 — fast 0.206 ->
#: 0.212, turbo 0.248 -> 0.262, ultra 0.324 -> 0.349-0.363 GB/s, while
#: DEFAULT at K=14 LOSES at 48 (0.169 -> 0.160, VMEM pressure), so the
#: headline keeps ENC_WAVE=24.
SPEED_WAVE = 48


def main():
    import argparse
    import contextlib
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the timed encode "
                         "passes into DIR (the VCD-waveform role of the "
                         "reference's Treadle/Verilator flows — view with "
                         "tensorboard or xprof)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_snappy import format as fmt
    from tpu_snappy.config import DEFAULT_CONFIG
    from tpu_snappy.ops import decode as ops_decode
    from tpu_snappy.ops import encode as ops_encode
    from tpu_snappy.parallel import shard
    from tpu_snappy.utils import corpus

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    data = corpus.load("all-mtg-cards.txt")
    n = len(data)
    nblocks = -(-n // fmt.BLOCK_SIZE)
    nwaves = -(-nblocks // ENC_WAVE)
    arr, lengths, _ = shard.blocks_of(data, fmt.BLOCK_SIZE, nwaves * ENC_WAVE)

    blocks_d = jax.device_put(arr)
    lens_d = jax.device_put(lengths)

    # One dispatched program per corpus pass (lax.map over WAVE-block
    # vmapped waves): same compile cost as a single wave, but the per-
    # dispatch fixed cost (~1.1 ms on the tunneled dev chip) is paid once
    # per pass instead of once per wave.
    enc = jax.jit(lambda b, l: ops_encode.encode_corpus(
        b, l, DEFAULT_CONFIG, wave=ENC_WAVE))

    # Warmup/compile, and correctness capture.
    t0 = time.time()
    out_np, lens_np = [np.asarray(x) for x in enc(blocks_d, lens_d)]
    log(f"encode compile+first corpus pass: {time.time()-t0:.1f}s")

    comp = fmt.varint_encode(n) + b"".join(
        out_np[i, : lens_np[i]].tobytes() for i in range(nblocks))
    csize = len(comp)

    # Correctness + ratio vs the independent C++ golden codec.
    ratio_ok = rt_ok = None
    try:
        from tpu_snappy.native import golden
        rt_ok = golden.uncompress(comp) == data
        gsize = len(golden.compress(data))
        ratio_ok = csize <= gsize
        log(f"round-trip vs C++ golden: {rt_ok}; size {csize} vs snappy {gsize}"
            f" ({'-' if ratio_ok else '+'}{abs(1 - csize/gsize)*100:.2f}%)")
    except Exception as e:  # native toolchain unavailable: report, don't fail
        log(f"golden harness unavailable: {e}")

    # BASELINE.md's bar taken literally: bit-for-bit decompressible by
    # ACTUAL google/snappy (system libsnappy), ratio at-or-below its output.
    real_rt = real_ratio = None
    try:
        from tpu_snappy.native import realsnappy
        if realsnappy.available():
            real_rt = realsnappy.uncompress(comp) == data
            rsize = len(realsnappy.compress(data))
            real_ratio = round(csize / rsize, 4)
            log(f"round-trip vs REAL google/snappy: {real_rt}; "
                f"size vs its {rsize} (ratio {real_ratio})")
    except Exception as e:
        log(f"real snappy unavailable: {e}")

    # Throughput: dispatch ITERS full corpus passes, then sync ONCE on the
    # final manifest — the device queue is sequential, so the last result
    # bounds all prior work, and every extra host fetch costs a full tunnel
    # round-trip (~30 ms) that would otherwise dominate the measurement.
    # The first timed window after a fresh compile is unreliable (measured
    # 0.82 s vs 0.18 s for the same 5 passes minutes apart — deferred
    # autotune/transfer stragglers), so drain two warmup passes first.
    # ITERS amortizes the single closing sync: the tunnel round-trip is
    # ~30 ms, a full corpus pass ~22 ms, so 5 iterations left ~5% of pure
    # link RTT in the "device" number (measured via a stage sweep whose
    # first-stage marginal tracked RTT/ITERS). 20 bounds that bias < 1%.
    ITERS = 20
    for _ in range(2):
        last = enc(blocks_d, lens_d)[1]
    np.asarray(jnp.ravel(last)[0])
    trace_ctx = (jax.profiler.trace(args.trace)
                 if args.trace else contextlib.nullcontext())
    t0 = time.time()
    last = None
    with trace_ctx:
        for _ in range(ITERS):
            last = enc(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])  # one-scalar sync bounds the queue
    dt = time.time() - t0
    enc_gbps = n * ITERS / dt / 1e9
    log(f"encode: {ITERS} x {n/1e6:.1f} MB in {dt:.3f}s -> {enc_gbps:.3f} GB/s/chip")

    # FAST_CONFIG point (the documented speed-over-ratio preset).
    fast_gbps = fast_ratio = None
    try:
        from tpu_snappy.config import FAST_CONFIG
        encf = jax.jit(lambda b, l: ops_encode.encode_corpus(
            b, l, FAST_CONFIG, wave=SPEED_WAVE))
        outf, lensf = [np.asarray(x) for x in encf(blocks_d, lens_d)]
        compf = fmt.varint_encode(n) + b"".join(
            outf[i, : lensf[i]].tobytes() for i in range(nblocks))
        fast_rt = golden.uncompress(compf) == data
        for _ in range(2):
            last = encf(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])
        t0 = time.time()
        for _ in range(ITERS):
            last = encf(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])
        fast_gbps = n * ITERS / (time.time() - t0) / 1e9
        fast_ratio = round(len(compf) / gsize, 4)
        log(f"encode FAST_CONFIG: {fast_gbps:.3f} GB/s/chip "
            f"(ratio x{fast_ratio} vs snappy, rt={fast_rt})")
        if not fast_rt:
            fast_gbps = None
    except Exception as e:
        log(f"fast-profile bench unavailable: {e}")

    # TURBO_CONFIG point: the admissible edge at the reference RTL's own
    # ratio trade (its 3.50 cyc/B costs 1.57x software Snappy's size;
    # this preset stays at ~1.07x — see config.TURBO_CONFIG).
    turbo_gbps = turbo_ratio = None
    try:
        from tpu_snappy.config import TURBO_CONFIG
        enct = jax.jit(lambda b, l: ops_encode.encode_corpus(
            b, l, TURBO_CONFIG, wave=SPEED_WAVE))
        outt, lenst = [np.asarray(x) for x in enct(blocks_d, lens_d)]
        compt = fmt.varint_encode(n) + b"".join(
            outt[i, : lenst[i]].tobytes() for i in range(nblocks))
        turbo_rt = golden.uncompress(compt) == data
        for _ in range(2):
            last = enct(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])
        t0 = time.time()
        for _ in range(ITERS):
            last = enct(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])
        turbo_gbps = n * ITERS / (time.time() - t0) / 1e9
        turbo_ratio = round(len(compt) / gsize, 4)
        log(f"encode TURBO_CONFIG: {turbo_gbps:.3f} GB/s/chip = "
            f"{0.94/turbo_gbps:.2f} cyc/B "
            f"(ratio x{turbo_ratio} vs snappy — RTL's point is x1.57 at "
            f"3.50 cyc/B; rt={turbo_rt})")
        if not turbo_rt:
            turbo_gbps = None
    except Exception as e:
        log(f"turbo-profile bench unavailable: {e}")

    # ULTRA_CONFIG point: turbo + stride-2 anchors — the RTL-dominating
    # preset (faster AND smaller than the reference accelerator at its
    # own ratio point; see config.ULTRA_CONFIG).
    ultra_gbps = ultra_ratio = None
    try:
        from tpu_snappy.config import ULTRA_CONFIG
        encu = jax.jit(lambda b, l: ops_encode.encode_corpus(
            b, l, ULTRA_CONFIG, wave=SPEED_WAVE))
        outu, lensu = [np.asarray(x) for x in encu(blocks_d, lens_d)]
        compu = fmt.varint_encode(n) + b"".join(
            outu[i, : lensu[i]].tobytes() for i in range(nblocks))
        ultra_rt = golden.uncompress(compu) == data
        for _ in range(2):
            last = encu(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])
        t0 = time.time()
        for _ in range(ITERS):
            last = encu(blocks_d, lens_d)[1]
        np.asarray(jnp.ravel(last)[0])
        ultra_gbps = n * ITERS / (time.time() - t0) / 1e9
        ultra_ratio = round(len(compu) / gsize, 4)
        log(f"encode ULTRA_CONFIG: {ultra_gbps:.3f} GB/s/chip = "
            f"{0.94/ultra_gbps:.2f} cyc/B "
            f"(ratio x{ultra_ratio} vs snappy — beats the RTL's 3.50 "
            f"cyc/B inside its x1.57 ratio point; rt={ultra_rt})")
        if not ultra_rt:
            ultra_gbps = None
    except Exception as e:
        log(f"ultra-profile bench unavailable: {e}")

    # Sustained (in-graph) rate: one dispatch running R corpus passes in a
    # lax.fori_loop — removes the per-program launch overhead (~48 us/block
    # measured on the tunneled chip) that back-to-back dispatches pay.
    # This is the steady-state number a continuously-fed pipeline sees;
    # the headline above keeps the per-dispatch methodology for
    # round-over-round comparability.
    R = 10

    @jax.jit
    def enc_loop(b, l):
        # Two anti-optimization guards, both verified necessary: the carry
        # feeds a runtime-zero perturbation into the next pass's lengths
        # (else XLA hoists the loop-invariant body — an unguarded version
        # measured one pass instead of R), and the FULL output folds into
        # a checksum (else XLA dead-code-eliminates every stage the
        # returned manifest doesn't depend on).
        def body(_, carry):
            lens_prev, acc = carry
            pert = jnp.min(jnp.where(lens_prev < 0, 1, 0))
            out, lens2 = ops_encode.encode_corpus(
                b, l + pert, DEFAULT_CONFIG, wave=ENC_WAVE)
            return lens2, acc + jnp.sum(out.astype(jnp.uint32))
        return jax.lax.fori_loop(
            0, R, body, (jnp.zeros(b.shape[0], jnp.int32), jnp.uint32(0)))

    for _ in range(2):
        last = enc_loop(blocks_d, lens_d)[1]
    np.asarray(jnp.ravel(last)[0])
    t0 = time.time()
    for _ in range(4):
        last = enc_loop(blocks_d, lens_d)[1]
    np.asarray(jnp.ravel(last)[0])
    sus_gbps = n * 4 * R / (time.time() - t0) / 1e9
    log(f"encode sustained (in-graph x{R}): {sus_gbps:.3f} GB/s/chip")

    # End-to-end: one full pass including device->host fetch and host
    # assembly, through DEVICE-SIDE COMPACTION (ops/encode.py
    # compact_blocks): the device scatters every block's exact bytes to
    # its manifest offset, so the host fetches ONE dense payload buffer
    # (bucketed slice) — no padded-capacity transfer, no per-block join.
    # On the tunneled dev chip the fetch is still link-bound (~20 MB/s),
    # so the net-of-transfer number is also quoted.
    encc = jax.jit(lambda b, l: ops_encode.encode_corpus_compact(
        b, l, DEFAULT_CONFIG, wave=ENC_WAVE))
    BUCKET = 1 << 20

    def e2e_pass():
        dense, _lens, tt = encc(blocks_d, lens_d)
        total = int(tt)
        k = min(-(-total // BUCKET) * BUCKET, dense.shape[0])
        return fmt.varint_encode(n) + np.asarray(dense[:k])[:total].tobytes()

    comp2 = e2e_pass()  # warm (compile) + correctness
    assert comp2 == comp, "compacted stream mismatch"
    t0 = time.time()
    for _ in range(4):
        e2e_pass()
    t_pass = (time.time() - t0) / 4
    e2e_gbps = n / t_pass / 1e9
    t_fetch = t_pass - dt / ITERS  # fetch+assembly tail beyond device rate
    e2e_net_gbps = n / max(1e-9, dt / ITERS + csize / 20e9) / 1e9
    log(f"e2e (compacted): {t_pass*1e3:.1f} ms/pass -> {e2e_gbps:.3f} GB/s "
        f"(fetch+assembly tail {t_fetch*1e3:.1f} ms, tunnel-bound; "
        f"net of a 20 GB/s link the same pass is {e2e_net_gbps:.3f} GB/s)")

    # Decode throughput on our own stream (same wave batching).
    total, start = fmt.varint_decode(comp)
    frags, clens, ulens = ops_decode.fragment_table(comp, start, total)
    frags = frags[:, : ops_decode.frag_width(clens)]
    nf = len(clens)
    nfw = -(-nf // DEC_WAVE)
    pad = nfw * DEC_WAVE - nf
    frags = np.pad(frags, ((0, pad), (0, 0)))
    clens = np.pad(np.asarray(clens, np.int32), (0, pad))
    ulens_p = np.pad(np.asarray(ulens, np.int32), (0, pad))
    dec = jax.jit(lambda f, c, u: ops_decode.decode_corpus(f, c, u, wave=DEC_WAVE))
    fd = jax.device_put(frags)
    cd = jax.device_put(clens)
    ud = jax.device_put(ulens_p)
    t0 = time.time()
    dec_ok = bool(np.asarray(dec(fd, cd, ud)[1])[:nf].all())
    log(f"decode compile+first corpus pass: {time.time()-t0:.1f}s ok={dec_ok}")
    for _ in range(2):  # drain post-compile stragglers (see encode note)
        last = dec(fd, cd, ud)[1]
    np.asarray(jnp.ravel(last)[0])
    t0 = time.time()
    last = None
    for _ in range(ITERS):
        last = dec(fd, cd, ud)[1]
    np.asarray(jnp.ravel(last)[0])
    dt = time.time() - t0
    dec_gbps = n * ITERS / dt / 1e9
    log(f"decode: {dec_gbps:.3f} GB/s/chip")

    @jax.jit
    def dec_loop(f, c, u):
        # Same anti-hoist + anti-DCE guards as enc_loop: without the
        # output checksum XLA eliminates the whole resolve stage (ok does
        # not depend on it) and "sustained decode" measures the parse
        # front only — verified by R-scaling (tools/jobs/s_loopscale).
        def body(_, carry):
            k, acc = carry
            pert = jnp.min(jnp.where(k, 0, 1))
            out, ok = ops_decode.decode_corpus(f, c, u + pert, wave=DEC_WAVE)
            return ok, acc + jnp.sum(out.astype(jnp.uint32))
        return jax.lax.fori_loop(
            0, R, body, (jnp.ones(f.shape[0], jnp.bool_), jnp.uint32(0)))

    for _ in range(2):
        last = dec_loop(fd, cd, ud)[1]
    np.asarray(jnp.ravel(last)[0])
    t0 = time.time()
    for _ in range(4):
        last = dec_loop(fd, cd, ud)[1]
    np.asarray(jnp.ravel(last)[0])
    dec_sus_gbps = n * 4 * R / (time.time() - t0) / 1e9
    log(f"decode sustained (in-graph x{R}): {dec_sus_gbps:.3f} GB/s/chip")

    # Foreign-stream decode: the BASELINE interop bar is google-stream
    # correctness, so the perf story quotes its device throughput too.
    foreign_gbps = None
    try:
        gcomp = golden.compress(data)
        gtotal, gstart = fmt.varint_decode(gcomp)
        gfrags, gclens, gulens = ops_decode.fragment_table(gcomp, gstart,
                                                           gtotal)
        gw = ops_decode.frag_width(gclens)
        gnf = len(gclens)
        gpad = -gnf % DEC_WAVE
        gfd = jax.device_put(np.pad(np.asarray(gfrags)[:, :gw],
                                    ((0, gpad), (0, 0))))
        gcd = jax.device_put(np.pad(np.asarray(gclens, np.int32), (0, gpad)))
        gud = jax.device_put(np.pad(np.asarray(gulens, np.int32), (0, gpad)))
        gok = bool(np.asarray(dec(gfd, gcd, gud)[1])[:gnf].all())
        for _ in range(2):
            last = dec(gfd, gcd, gud)[1]
        np.asarray(jnp.ravel(last)[0])
        t0 = time.time()
        for _ in range(ITERS):
            last = dec(gfd, gcd, gud)[1]
        np.asarray(jnp.ravel(last)[0])
        foreign_gbps = n * ITERS / (time.time() - t0) / 1e9
        log(f"decode (google-encoded stream): {foreign_gbps:.3f} GB/s/chip "
            f"ok={gok}")
    except Exception as e:
        log(f"foreign decode bench unavailable: {e}")

    # Depth-hinted decode (framed 0x81 tpD1 co-design, round 4): the
    # 76-byte per-chunk hint the AUTO policy emits on text (HINT_TILE=
    # 1024) — same decode pipeline, but each tile runs exactly its
    # declared tail rounds (no detect bodies). Bit-identical output;
    # hints cost ~0.3% of stream.
    hinted_gbps = None
    try:
        from tpu_snappy import sidecar as sc_
        deps = np.zeros((nf + pad, ops_decode.OUT // ops_decode.HINT_TILE),
                        np.int32)
        for i in range(nf):
            deps[i] = golden.depth_hints(
                frags[i, : clens[i]].tobytes(), int(ulens[i]),
                ops_decode.TAIL_CAP, ops_decode.HINT_TILE)
        dd_h = jax.device_put(deps)
        dec_h = jax.jit(lambda f, c, u, d: ops_decode.decode_corpus_depth(
            f, c, u, d, wave=DEC_WAVE))
        outs_h, oks_h = dec_h(fd, cd, ud, dd_h)
        hint_exact = bool(np.asarray(oks_h)[:nf].all()) and bool(
            (np.asarray(outs_h)[:nf]
             == np.asarray(dec(fd, cd, ud)[0])[:nf]).all())
        for _ in range(2):
            last = dec_h(fd, cd, ud, dd_h)[1]
        np.asarray(jnp.ravel(last)[0])
        t0 = time.time()
        for _ in range(ITERS):
            last = dec_h(fd, cd, ud, dd_h)[1]
        np.asarray(jnp.ravel(last)[0])
        hinted_gbps = n * ITERS / (time.time() - t0) / 1e9
        log(f"decode depth-hinted (auto-policy 0x81 sidecar): "
            f"{hinted_gbps:.3f} GB/s/chip identical={hint_exact}")
    except Exception as e:
        log(f"depth-hinted decode bench unavailable: {e}")

    # Sidecar fast-decode (framed co-design, sidecar.py): the skippable
    # 0x80 chunk carries the resolved root map, so the device skips parse,
    # transport AND resolve — one windowed scatter + ffill + byte gather.
    # Size overhead is measured and reported (it is the knob's cost).
    sidecar_gbps = sidecar_frac = None
    try:
        from tpu_snappy import sidecar as sc
        jobs = []
        side_bytes = 0
        wrows = sc.PARENT_WROWS[0]
        for i in range(nf):
            elems = frags[i, : clens[i]].tobytes()
            payload = sc.build(elems, int(ulens[i]))
            assert payload is not None
            side_bytes += len(payload) + 4
            s2, vals, wr = sc.prep_parent(*sc.parse(payload), int(ulens[i]))
            wrows = max(wrows, wr)
            jobs.append((elems, int(ulens[i]), s2, vals))
        E, S, V, U = sc.pack_batch(jobs, pad_rows=-nf % DEC_WAVE)
        sfn = jax.jit(lambda e, s, v, u: sc.decode_corpus_sidecar(
            e, s, v, u, wave=DEC_WAVE, wrows=wrows))
        Ed, Sd, Vd, Ud = map(jax.device_put, (E, S, V, U))
        outs, oks = sfn(Ed, Sd, Vd, Ud)
        outs_np, oks_np = np.asarray(outs), np.asarray(oks)
        side_exact = bool(oks_np[:nf].all()) and all(
            outs_np[j, : U[j]].tobytes()
            == data[j * fmt.BLOCK_SIZE: j * fmt.BLOCK_SIZE + U[j]]
            for j in range(nf))
        for _ in range(2):
            last = sfn(Ed, Sd, Vd, Ud)[1]
        np.asarray(jnp.ravel(last)[0])
        t0 = time.time()
        for _ in range(ITERS):
            last = sfn(Ed, Sd, Vd, Ud)[1]
        np.asarray(jnp.ravel(last)[0])
        sidecar_gbps = n * ITERS / (time.time() - t0) / 1e9
        sidecar_frac = side_bytes / csize
        log(f"decode sidecar path: {sidecar_gbps:.3f} GB/s/chip "
            f"exact={side_exact}; sidecar bytes {side_bytes} "
            f"(+{100*sidecar_frac:.0f}% of payload on text — the measured "
            f"cost of the speed knob; ~0% on RLE/incompressible)")
        if not side_exact:
            sidecar_gbps = None
    except Exception as e:
        log(f"sidecar bench unavailable: {e}")

    value = round(enc_gbps, 4)
    print(json.dumps({
        "metric": "encode_GBps_per_chip_mtg"
                  + ("" if (rt_ok and ratio_ok and dec_ok) else "_INVALID"),
        "value": value,
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / 1.0, 4),
        "decode_GBps": round(dec_gbps, 4),
        "ratio_vs_snappy": round(csize / gsize, 4) if ratio_ok is not None else None,
        "roundtrip_ok": bool(rt_ok),
        "roundtrip_vs_real_google_snappy": real_rt,
        "ratio_vs_real_google_snappy": real_ratio,
        "encode_e2e_GBps": round(e2e_gbps, 4),
        "encode_e2e_net20GBps_link": round(e2e_net_gbps, 4),
        "e2e_fetch_tail_ms": round(t_fetch * 1e3, 2),
        "encode_sustained_GBps": round(sus_gbps, 4),
        "decode_sustained_GBps": round(dec_sus_gbps, 4),
        "encode_fast_GBps": round(fast_gbps, 4) if fast_gbps else None,
        "encode_fast_ratio_vs_snappy": fast_ratio,
        "encode_turbo_GBps": round(turbo_gbps, 4) if turbo_gbps else None,
        "encode_turbo_ratio_vs_snappy": turbo_ratio,
        # TURBO is the matched-ratio comparable vs the RTL: its 3.50
        # cyc/B is recorded at x1.57 software Snappy's size; TURBO stays
        # at ~x1.07 (the RTL's ratio bar, not the default presets' bar).
        "encode_turbo_cyc_per_byte": round(0.94e9 / (turbo_gbps * 1e9), 2)
        if turbo_gbps else None,
        "encode_ultra_GBps": round(ultra_gbps, 4) if ultra_gbps else None,
        "encode_ultra_ratio_vs_snappy": ultra_ratio,
        "encode_ultra_cyc_per_byte": round(0.94e9 / (ultra_gbps * 1e9), 2)
        if ultra_gbps else None,
        "ref_hw_size_vs_snappy": 1.5716,
        "decode_foreign_GBps": round(foreign_gbps, 4) if foreign_gbps else None,
        "decode_hinted_GBps": round(hinted_gbps, 4) if hinted_gbps else None,
        "decode_sidecar_GBps": round(sidecar_gbps, 4) if sidecar_gbps else None,
        "sidecar_overhead_vs_payload": round(sidecar_frac, 4)
        if sidecar_frac is not None else None,
        # Cycle-normalized comparable: the reference RTL reports cycles in
        # simulation only (3.50 cyc/B encode steady state,
        # benchmark/hw_results.csv:25; decode unimplemented). v5e ~940 MHz.
        "encode_cyc_per_byte": round(0.94e9 / (enc_gbps * 1e9), 2),
        "ref_hw_encode_cyc_per_byte": 3.50,
    }))


if __name__ == "__main__":
    main()
