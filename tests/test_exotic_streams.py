"""Valid-but-exotic Snappy streams: legal constructs no known encoder emits.

The fragment-parallel decoder must route these to the sequential path and
still produce bit-exact output; genuinely corrupt streams must still raise.
"""

import numpy as np
import pytest

from tpu_snappy import api, format as fmt


def build(total, elements):
    return fmt.varint_encode(total) + b"".join(elements)


def test_cross_fragment_copy():
    # Fragment 2 copies from fragment 1's territory: offset reaches behind
    # the 64 KB boundary. Legal per the format (offset <= output position),
    # but defeats fragment-local decode => sequential fallback.
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, fmt.BLOCK_SIZE, dtype=np.uint8).tobytes()
    stream = build(
        fmt.BLOCK_SIZE + 64 + 10,
        [fmt.literal_header(fmt.BLOCK_SIZE), a,
         # fragment 2: copy 64 bytes from 1000 bytes back (crosses boundary)
         fmt.copy_element(1000, 64),
         fmt.literal_header(10), b"0123456789"])
    expect = a + a[fmt.BLOCK_SIZE - 1000: fmt.BLOCK_SIZE - 1000 + 64] + b"0123456789"
    assert api.decompress(stream, small_fastpath=False) == expect


def test_copy4_large_offset():
    # copy4 tags (5-byte offsets) never come from 64K-window encoders but
    # must decode; here the offset still fits the fragment, exercising the
    # tag form itself on the parallel path.
    data = b"x" * 70000
    stream = build(
        70000 + 64,
        [fmt.literal_header(65536), data[:65536],
         fmt.literal_header(70000 - 65536), data[65536:],
         bytes([(63 << 2) | 3, 0x10, 0x27, 0, 0])])  # copy4 len 64 off 10000
    out = api.decompress(stream, small_fastpath=False)
    assert out == data + data[70000 - 10000: 70000 - 10000 + 64]


def test_corrupt_still_raises():
    stream = build(100, [fmt.literal_header(4), b"abcd",
                         fmt.copy_element(5000, 64)])  # offset > written
    with pytest.raises(ValueError):
        api.decompress(stream, small_fastpath=False)


def test_tiny_copy_lengths():
    # copy2 with length < 4 is legal-but-silly; decoder must honor it.
    stream = build(7, [fmt.literal_header(4), b"abcd",
                       bytes([(2 << 2) | 2, 3, 0])])  # copy2 len 3 off 3
    assert api.decompress(stream, small_fastpath=False) == b"abcdbcd"


@pytest.mark.parametrize("period,runlen", [
    (1, 5000),      # pure RLE
    (3, 4997),      # period not dividing run length
    (64, 6400),     # period == max copy len (non-overlapping elements, same offset)
    (61, 6100),     # barely self-overlapping elements
])
def test_periodic_runs_parallel_decode(period, runlen):
    """Maximal same-offset copy runs: the decoder's arithmetic periodic-run
    collapse must be exact for any period/length, including run tails."""
    from tpu_snappy import reference_codec
    head = bytes(range(max(4, period)))[:max(4, period)]
    nfull, rest = divmod(runlen, 64)
    els = [fmt.literal_header(len(head)), head]
    els += [fmt.copy_element(period, 64)] * nfull
    if rest >= 4:
        els.append(fmt.copy_element(period, rest))
    else:
        runlen -= rest
    total = len(head) + runlen
    stream = build(total, els)
    got = api.decompress(stream, small_fastpath=False)
    assert got == reference_codec.decompress(stream)


def test_same_offset_runs_split_by_literal():
    # Two same-offset runs with a literal between them: the second run's
    # head must reset (its periodic base is local, not the first run's).
    els = [fmt.literal_header(8), b"abcdefgh",
           fmt.copy_element(4, 16),            # run 1: period 4
           fmt.literal_header(4), b"WXYZ",
           fmt.copy_element(4, 16)]            # run 2: same offset, new base
    stream = build(8 + 16 + 4 + 16, els)
    from tpu_snappy import reference_codec
    assert api.decompress(stream, small_fastpath=False) == reference_codec.decompress(stream)


def test_offset_change_mid_run():
    # Adjacent copy elements with DIFFERENT offsets must not be fused into
    # one periodic run.
    els = [fmt.literal_header(16), b"0123456789abcdef",
           fmt.copy_element(3, 9),
           fmt.copy_element(7, 21),
           fmt.copy_element(2, 8),
           fmt.copy_element(2, 64)]
    stream = build(16 + 9 + 21 + 8 + 64, els)
    from tpu_snappy import reference_codec
    assert api.decompress(stream, small_fastpath=False) == reference_codec.decompress(stream)


def test_copy_chain_into_periodic_run():
    # A later copy sources from inside an earlier periodic run: doubling
    # must resolve through the collapsed run correctly.
    els = [fmt.literal_header(5), b"hello",
           fmt.copy_element(5, 60),            # periodic run, period 5
           fmt.literal_header(4), b"####",
           fmt.copy_element(40, 24)]           # plain copy into run interior
    stream = build(5 + 60 + 4 + 24, els)
    from tpu_snappy import reference_codec
    assert api.decompress(stream, small_fastpath=False) == reference_codec.decompress(stream)
