"""Benchmark corpus access and synthesis.

Plays the role of the reference's DataGenerator.scala (corpus synthesis:
random/real/repeating at 12 sizes, seeded random files) plus the loose corpus
files under data/ and benchmark/benchmark-data/. We read the reference corpus
directly when present (it is mounted read-only) and can regenerate
equivalent synthetic data when it is not.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

REFERENCE_ROOT = pathlib.Path(os.environ.get("TPU_SNAPPY_REFERENCE", "/root/reference"))
BENCH_DATA = REFERENCE_ROOT / "benchmark" / "benchmark-data"
DATA = REFERENCE_ROOT / "data"

#: The 12 sizes × 3 types of DataGenerator.scala:24-72.
SIZES = [10, 20, 50, 100, 200, 500, 1000, 2000, 5000, 10000, 20000, 50000]
TYPES = ["random", "real", "repeating"]


def has_reference_corpus() -> bool:
    return BENCH_DATA.is_dir() and DATA.is_dir()


def load(name: str) -> bytes:
    """Load a corpus file by bare name from either corpus directory."""
    for root in (BENCH_DATA, DATA):
        p = root / name
        if p.is_file():
            return p.read_bytes()
    raise FileNotFoundError(name)


def corpus_files() -> list[str]:
    """Benchmark sweep files, mirroring Test.scala:61-66's selection
    (no '_'-suffixed bank splits, size < 5e6)."""
    if not BENCH_DATA.is_dir():
        return []
    out = []
    for p in sorted(BENCH_DATA.iterdir()):
        if "_" in p.name or p.stat().st_size >= 5_000_000:
            continue
        typ = p.name.partition("-")[0]
        if typ not in TYPES or p.stat().st_size == 0:
            continue  # stray/empty fixtures (e.g. the empty alignerTestData)
        out.append(p.name)
    return out


def synth(kind: str, size: int, seed: int = 4444) -> bytes:
    """Synthesize corpus-like data (DataGenerator.scala analogue).

    random  — uniform printable ASCII (RandomFileGenerator, seed 4444)
    repeating — short phrase tiled to size
    real    — natural-language-like text (only a stand-in when the MTG corpus
              is unavailable; prefer load('real-<n>.txt')).
    """
    if kind == "random":
        rng = np.random.default_rng(seed)
        return rng.integers(32, 127, size=size, dtype=np.uint8).tobytes()
    if kind == "repeating":
        phrase = b"All work and no play makes Jack a dull boy. "
        reps = -(-size // len(phrase))
        return (phrase * reps)[:size]
    if kind == "real":
        try:
            data = load("all-mtg-cards.txt")
        except FileNotFoundError:
            data = synth("repeating", size * 4, seed) + synth("random", size, seed)
        return data[:size]
    raise ValueError(kind)
