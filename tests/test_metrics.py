"""CSV schema / analysis tests (csv_scan.py parity)."""

import io

from tpu_snappy.utils import corpus, metrics


def test_row_csv_schema():
    r = metrics.Row("real", 50000, 175145, 32683)
    cols = r.csv().split(";")
    # First four columns are the reference hw_results.csv schema.
    assert cols[0] == "real" and cols[1] == "50000"
    assert cols[2] == "175145" and cols[3] == "32683"
    assert abs(r.ratio - 50000 / 32683) < 1e-9


def test_write_and_parse_roundtrip():
    rows = [metrics.Row("random", 1000, 4045, 1020),
            metrics.Row("repeat", 50000, 99382, 2351)]
    buf = io.StringIO()
    metrics.write_csv(rows, buf)
    parsed = metrics.parse_reference_csv(buf.getvalue())
    assert [(r.type, r.length, r.compressed_length) for r in parsed] == \
           [("random", 1000, 1020), ("repeat", 50000, 2351)]


def test_parse_reference_hw_results():
    hw = corpus.REFERENCE_ROOT / "benchmark" / "hw_results.csv"
    if not hw.is_file():
        return
    rows = metrics.parse_reference_csv(hw.read_text())
    assert len(rows) == 36  # 3 types x 12 sizes
    by_key = {(r.type, r.length): r for r in rows}
    # SURVEY.md §6 representative rows.
    assert by_key[("real", 50000)].cycles == 175145
    assert by_key[("real", 50000)].compressed_length == 32683
    # the CSV uses type name "repeat" for the repeating-* files
    assert by_key[("repeat", 50000)].compressed_length == 2351


def test_compare_table():
    ours = [metrics.Row("real", 50000, 10_000_000, 20214)]
    ref = [metrics.Row("real", 50000, 175145, 32683)]
    table = metrics.compare(ours, ref)
    assert "20214" in table and "32683" in table
