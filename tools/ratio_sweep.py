"""CPU ratio sweep for encode knob variants (K/probes/STICKY_LEVELS).

Checks every BASELINE ratio bar: strict on fox-in-socks/alignerTestData,
aggregate incl. randomASCII, per-file on the 50000 trio, and the mtg
corpus total. Run: JAX_PLATFORMS=cpu python tools/ratio_sweep.py
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpu_snappy import api, format as fmt
    from tpu_snappy.config import DEFAULT_CONFIG
    from tpu_snappy.native import golden
    from tpu_snappy.ops import encode as ops_encode
    from tpu_snappy.utils import corpus

    files = ["fox-in-socks.txt", "alignerTestData.txt", "randomASCII.txt",
             "real-50000.txt", "repeating-50000.txt", "random-50000.txt"]
    gold = {f: len(golden.compress(corpus.load(f))) for f in files}
    mtg = corpus.load("all-mtg-cards.txt")
    gold_mtg = len(golden.compress(mtg))

    def size(data, cfg):
        return len(api.compress(data, cfg, small_fastpath=False))

    variants = [
        ("baseline K=14", DEFAULT_CONFIG, 4),
        ("levels=3", DEFAULT_CONFIG, 3),
        ("K=13 p=20", dataclasses.replace(DEFAULT_CONFIG, candidates=13, probes=20), 4),
        ("K=12 p=20", dataclasses.replace(DEFAULT_CONFIG, candidates=12, probes=20), 4),
        ("K=12 p=24", dataclasses.replace(DEFAULT_CONFIG, candidates=12, probes=24), 4),
        ("K=11 p=24", dataclasses.replace(DEFAULT_CONFIG, candidates=11, probes=24), 4),
        ("flatten=lift", dataclasses.replace(DEFAULT_CONFIG, flatten="lift"), 4),
    ]
    for name, cfg, levels in variants:
        old = ops_encode.STICKY_LEVELS
        ops_encode.STICKY_LEVELS = levels
        try:
            import tpu_snappy.ops.encode as e
            e.encode_blocks.clear_cache()
            e.encode_corpus.clear_cache()
            row = {}
            for f in files:
                row[f] = size(corpus.load(f), cfg) - gold[f]
            dmtg = size(mtg, cfg) - gold_mtg
            agg3 = sum(size(corpus.load(f), cfg) - gold[f]
                       for f in ["fox-in-socks.txt", "alignerTestData.txt",
                                 "randomASCII.txt"])
            bars = (row["fox-in-socks.txt"] <= 0
                    and row["alignerTestData.txt"] <= 0
                    and agg3 <= 0 and dmtg <= 0
                    and row["real-50000.txt"] <= 0
                    and row["repeating-50000.txt"] <= 0
                    and row["random-50000.txt"] <= 1)
            print(f"{name:14s} bars={'PASS' if bars else 'FAIL'} mtg{dmtg:+7d} "
                  + " ".join(f"{f.split('-')[0][:4]}{row[f]:+d}" for f in files),
                  flush=True)
        finally:
            ops_encode.STICKY_LEVELS = old


if __name__ == "__main__":
    main()
