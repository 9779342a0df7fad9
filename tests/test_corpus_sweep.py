"""Full benchmark-corpus round-trip sweep — the CompressionAcceleratorSpec
tier (Test.scala:56-79 iterates every benchmark-data file through the whole
pipeline), with the bit-exactness assertions the reference lacked."""

import pytest

from tpu_snappy import api
from tpu_snappy.native import golden
from tpu_snappy.utils import corpus


@pytest.mark.skipif(not corpus.has_reference_corpus(), reason="no corpus")
def test_all_36_corpus_files_roundtrip():
    files = corpus.corpus_files()
    assert len(files) == 36, files  # 3 types x 12 sizes
    total_ours = total_gold = 0
    for name in files:
        data = corpus.load(name)
        comp = api.compress(data, small_fastpath=False)
        assert golden.uncompress(comp) == data, name
        assert api.decompress(comp, small_fastpath=False) == data, name
        total_ours += len(comp)
        total_gold += len(golden.compress(data))
    # Aggregate ratio across the whole sweep: strictly at-or-below software
    # Snappy (per-file wins/losses are covered elsewhere).
    assert total_ours <= total_gold


@pytest.mark.skipif(not corpus.has_reference_corpus(), reason="no corpus")
def test_data_dir_files_roundtrip():
    for name in ["fox-in-socks.txt", "randomASCII.txt", "all-mtg-cards.txt",
                 "alignerTestData.txt"]:
        data = corpus.load(name)
        if len(data) > 500_000:
            data = data[:500_000]  # keep CPU runtime sane; full file in bench
        comp = api.compress(data, small_fastpath=False)
        assert golden.uncompress(comp) == data, name
