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
    assert api.decompress(stream) == expect


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
    out = api.decompress(stream)
    assert out == data + data[70000 - 10000: 70000 - 10000 + 64]


def test_corrupt_still_raises():
    stream = build(100, [fmt.literal_header(4), b"abcd",
                         fmt.copy_element(5000, 64)])  # offset > written
    with pytest.raises(ValueError):
        api.decompress(stream)


def test_tiny_copy_lengths():
    # copy2 with length < 4 is legal-but-silly; decoder must honor it.
    stream = build(7, [fmt.literal_header(4), b"abcd",
                       bytes([(2 << 2) | 2, 3, 0])])  # copy2 len 3 off 3
    assert api.decompress(stream) == b"abcdbcd"
