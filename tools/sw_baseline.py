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


def _timed(fn, data):
    import time
    t0 = time.perf_counter_ns()
    out = fn(data)
    return time.perf_counter_ns() - t0, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--out", default="results/sw_results_host.csv")
    args = ap.parse_args()

    from tpu_snappy.native import golden, realsnappy
    exe = golden.swcompression_path()
    have_real = realsnappy.available()

    # Extra columns vs the reference schema: the REAL google/snappy
    # library's wall time and size on the same host, when present — the
    # honest "software snappy on this machine" number (the golden's
    # baseline mode reproduces the reference's recorded sizes; the real
    # library is the production implementation).
    hdr = "type;length;ns;compressed-length"
    rows = [hdr + (";real-ns;real-compressed-length" if have_real else "")]
    for name in corpus.corpus_files():
        path = corpus.BENCH_DATA / name
        out = subprocess.run([str(exe), "bench", str(path), str(args.runs)],
                             capture_output=True, text=True, check=True)
        _, size, ns, csize = out.stdout.strip().rsplit(";", 3)
        typ, _, _ = name.rpartition(".")[0].partition("-")
        typ = "repeat" if typ == "repeating" else typ
        row = f"{typ};{size};{ns};{csize}"
        if have_real:
            import time
            data = path.read_bytes()
            best = min(
                _timed(realsnappy.compress, data) for _ in range(args.runs))
            rns, rcomp = best
            row += f";{rns};{len(rcomp)}"
        rows.append(row)
        print(rows[-1], flush=True)

    outp = pathlib.Path(args.out)
    outp.parent.mkdir(exist_ok=True)
    outp.write_text("\n".join(rows) + "\n")
    print(f"wrote {outp}", file=sys.stderr)


if __name__ == "__main__":
    main()
