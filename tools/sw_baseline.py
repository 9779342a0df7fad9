"""Software-Snappy baseline timer — the run-all.sh / sw_results.csv analogue.

Runs the C++ golden codec's baseline mode (native/swcompression bench,
which reproduces the reference repo's recorded software-snappy sizes) over
every corpus file on the HOST CPU and writes results/sw_results_host.csv
in the reference schema (type;length;ns;compressed-length — wall ns in
place of Rocket rdcycle counts; the reference measured on a simulated
in-order core, so only the SHAPE is comparable, not the absolute numbers).

Usage: python tools/sw_baseline.py [--runs N] [--out PATH]
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tpu_snappy.utils import corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--out", default="results/sw_results_host.csv")
    args = ap.parse_args()

    from tpu_snappy.native import golden
    exe = golden.swcompression_path()

    rows = ["type;length;ns;compressed-length"]
    for name in corpus.corpus_files():
        path = corpus.BENCH_DATA / name
        out = subprocess.run([str(exe), "bench", str(path), str(args.runs)],
                             capture_output=True, text=True, check=True)
        _, size, ns, csize = out.stdout.strip().rsplit(";", 3)
        typ, _, _ = name.rpartition(".")[0].partition("-")
        typ = "repeat" if typ == "repeating" else typ
        rows.append(f"{typ};{size};{ns};{csize}")
        print(rows[-1], flush=True)

    outp = pathlib.Path(args.out)
    outp.parent.mkdir(exist_ok=True)
    outp.write_text("\n".join(rows) + "\n")
    print(f"wrote {outp}", file=sys.stderr)


if __name__ == "__main__":
    main()
