"""Cross-validation: Python golden codec vs clean-room C++ golden codec.

Two independent implementations agreeing on round-trips across the corpus is
the correctness anchor for everything above (the role the reference assigns
to tests/swcompression.cc + google/snappy)."""

import random
import subprocess

import pytest

from tpu_snappy import reference_codec as ref
from tpu_snappy.native import golden
from tpu_snappy.utils import corpus


@pytest.fixture(scope="module", autouse=True)
def built():
    golden.swcompression_path()


@pytest.mark.parametrize("data", [
    b"", b"a", b"abcd", b"a" * 100,
    b"The quick brown fox jumps over the lazy dog. " * 20,
    bytes(range(256)) * 300,  # crosses the 64 KB block boundary
])
def test_cross_roundtrip(data):
    # C++ decodes Python-compressed, Python decodes C++-compressed.
    assert golden.uncompress(ref.compress(data)) == data
    for mode in (golden.MODE_BASELINE, golden.MODE_DENSE):
        assert ref.decompress(golden.compress(data, mode)) == data


def test_cross_fuzz():
    rng = random.Random(99)
    for _ in range(30):
        n = rng.randrange(0, 5000)
        parts = []
        while sum(map(len, parts)) < n:
            if rng.random() < 0.5:
                parts.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40))))
            else:
                seg = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 8)))
                parts.append(seg * rng.randrange(1, 60))
        data = b"".join(parts)[:n]
        assert golden.uncompress(ref.compress(data)) == data
        assert ref.decompress(golden.compress(data)) == data


@pytest.mark.skipif(not corpus.has_reference_corpus(), reason="no reference corpus")
@pytest.mark.parametrize("name", [
    "fox-in-socks.txt", "randomASCII.txt", "alignerTestData.txt",
    "real-50000.txt", "repeating-50000.txt", "random-50000.txt",
])
def test_corpus_cross(name):
    data = corpus.load(name)
    comp_py = ref.compress(data)
    assert golden.uncompress(comp_py) == data
    comp_cc = golden.compress(data)
    assert ref.decompress(comp_cc) == data
    # Dense parse should not lose much vs baseline (sanity on ratio).
    assert len(comp_py) <= len(comp_cc) * 1.03 + 16


@pytest.mark.skipif(not corpus.has_reference_corpus(), reason="no reference corpus")
def test_cli_roundtrip():
    cli = golden.swcompression_path()
    out = subprocess.run(
        [str(cli), "roundtrip", str(corpus.DATA / "fox-in-socks.txt")],
        capture_output=True, text=True, check=True,
    )
    length, clen = out.stdout.strip().split(";")
    assert int(length) == 4602
    assert int(clen) < 4602


def test_golden_rejects_garbage():
    with pytest.raises(ValueError):
        golden.uncompress(b"\x10\xff\xff\xff")
    with pytest.raises(ValueError):
        golden.uncompress(b"")
