"""Full corpus benchmark sweep — the run-all.sh / hw_results.csv producer.

Runs the device codec over every benchmark/benchmark-data corpus file
(the Test.scala:61-66 selection: no bank-split files), writes
results/tpu_results.csv in the reference schema (+ wall_ns + GB/s), and
prints the csv_scan-style comparison against the reference's recorded
hw_results.csv / sw_results.csv.

Usage: python tools/run_benchmarks.py [--iters N] [--out results/tpu_results.csv]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/tpu_results.csv")
    args = ap.parse_args()

    import jax

    from tpu_snappy import format as fmt
    from tpu_snappy.config import DEFAULT_CONFIG
    from tpu_snappy.ops import encode as ops_encode
    from tpu_snappy.parallel import shard
    from tpu_snappy.utils import corpus, metrics

    enc = jax.jit(lambda b, l: ops_encode.encode_blocks(b, l, DEFAULT_CONFIG))

    rows = []
    for name in corpus.corpus_files():
        data = corpus.load(name)
        typ, _, sz = name.rpartition(".")[0].partition("-")
        typ = "repeat" if typ == "repeating" else typ  # hw_results.csv naming
        nblocks = max(1, -(-len(data) // fmt.BLOCK_SIZE))
        arr, lengths, _ = shard.blocks_of(data, fmt.BLOCK_SIZE, nblocks)
        bd, ld = jax.device_put(arr), jax.device_put(lengths)
        out, lens = enc(bd, ld)
        lens_np = np.asarray(lens)
        csize = int(lens_np.sum()) + fmt.varint_size(len(data))
        t0 = time.perf_counter_ns()
        for _ in range(args.iters):
            _, l = enc(bd, ld)
        np.asarray(l)
        wall = (time.perf_counter_ns() - t0) // args.iters
        rows.append(metrics.Row(typ, len(data), wall, csize))
        print(rows[-1].csv(), file=sys.stderr)

    outp = pathlib.Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    with outp.open("w") as fp:
        metrics.write_csv(rows, fp)

    print(metrics.summary_table(rows))
    hw = corpus.REFERENCE_ROOT / "benchmark" / "hw_results.csv"
    if hw.is_file():
        ref = metrics.parse_reference_csv(hw.read_text())
        print("\nvs reference hw_results.csv (RoCC accelerator, sim cycles):")
        print(metrics.compare(rows, ref))


if __name__ == "__main__":
    main()
