"""CPU ratio sweep for interval-set candidate tables (cfg.table, r5
VERDICT item 5): can K < 14 with one (lo, hi) ladder interval hold the
K=14 ratio bars? Run: JAX_PLATFORMS=cpu python tools/interval_sweep.py
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpu_snappy import api
    from tpu_snappy.config import DEFAULT_CONFIG
    from tpu_snappy.native import golden
    from tpu_snappy.utils import corpus

    files = ["fox-in-socks.txt", "alignerTestData.txt", "randomASCII.txt",
             "real-50000.txt", "repeating-50000.txt", "random-50000.txt"]
    gold = {f: len(golden.compress(corpus.load(f))) for f in files}
    mtg = corpus.load("all-mtg-cards.txt")
    gold_mtg = len(golden.compress(mtg))
    base = DEFAULT_CONFIG

    variants = [
        ("K=14 points (baseline)", base),
        ("K=8  iv p=14", dataclasses.replace(base, candidates=8, probes=14,
                                             table="intervals")),
        ("K=8  iv p=16", dataclasses.replace(base, candidates=8, probes=16,
                                             table="intervals")),
        ("K=8  iv p=20", dataclasses.replace(base, candidates=8, probes=20,
                                             table="intervals")),
        ("K=10 iv p=16", dataclasses.replace(base, candidates=10, probes=16,
                                             table="intervals")),
        ("K=10 iv p=20", dataclasses.replace(base, candidates=10, probes=20,
                                             table="intervals")),
        ("K=12 iv p=20", dataclasses.replace(base, candidates=12, probes=20,
                                             table="intervals")),
        ("K=12 iv p=13", dataclasses.replace(base, candidates=12, probes=13,
                                             table="intervals")),
        ("K=12 iv p=14", dataclasses.replace(base, candidates=12, probes=14,
                                             table="intervals")),
        ("K=12 iv p=16", dataclasses.replace(base, candidates=12, probes=16,
                                             table="intervals")),
        ("K=6  iv p=16", dataclasses.replace(base, candidates=6, probes=16,
                                             table="intervals")),
    ]
    for name, cfg in variants:
        import tpu_snappy.ops.encode as e
        e.encode_blocks.clear_cache()
        jax.clear_caches()
        fails = []
        cells = []
        for f in files:
            data = corpus.load(f)
            c = api.compress(data, cfg, small_fastpath=False)
            assert golden.uncompress(c) == data, (name, f)
            d = len(c) - gold[f]
            cells.append(f"{f.split('.')[0][:12]}:{d:+d}")
            if d > (4 if f == "randomASCII.txt" else 0):
                fails.append(f)
        cm = api.compress(mtg, cfg, small_fastpath=False)
        assert golden.uncompress(cm) == mtg, (name, "mtg")
        dm = len(cm) - gold_mtg
        if dm > 0:
            fails.append("mtg")
        verdict = "PASS" if not fails else f"FAIL({','.join(fails)})"
        print(f"{name:24s} mtg:{dm:+7d}  {'  '.join(cells)}  -> {verdict}",
              flush=True)


if __name__ == "__main__":
    main()
