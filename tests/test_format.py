"""Tier-1 tests: format math with golden vectors recomputed in the test
(the CopyCompressSpec.scala:99-113 model — independent bit-pattern math)."""

import random

import pytest

from tpu_snappy import format as fmt


def test_varint_golden():
    # Golden vectors from the public varint definition.
    assert fmt.varint_encode(0) == b"\x00"
    assert fmt.varint_encode(1) == b"\x01"
    assert fmt.varint_encode(127) == b"\x7f"
    assert fmt.varint_encode(128) == b"\x80\x01"
    assert fmt.varint_encode(300) == b"\xac\x02"
    assert fmt.varint_encode(64 * 1024) == b"\x80\x80\x04"
    assert fmt.varint_encode(2**32 - 1) == b"\xff\xff\xff\xff\x0f"


@pytest.mark.parametrize("value", [0, 1, 59, 60, 61, 127, 128, 300, 65535, 65536, 2**24, 2**32 - 1])
def test_varint_roundtrip(value):
    enc = fmt.varint_encode(value)
    assert len(enc) == fmt.varint_size(value)
    dec, pos = fmt.varint_decode(enc)
    assert dec == value and pos == len(enc)


def test_literal_header_forms():
    # 1-byte tag for len <= 60
    assert fmt.literal_header(1) == bytes([0b000000_00])
    assert fmt.literal_header(60) == bytes([59 << 2])
    # tag-60: one extra length byte
    assert fmt.literal_header(61) == bytes([60 << 2, 60])
    assert fmt.literal_header(256) == bytes([60 << 2, 255])
    # tag-61: two extra bytes
    assert fmt.literal_header(257) == bytes([61 << 2, 0, 1])
    assert fmt.literal_header(65536) == bytes([61 << 2, 0xFF, 0xFF])
    # tag-62/63
    assert fmt.literal_header(65537) == bytes([62 << 2, 0, 0, 1])
    assert fmt.literal_header(2**24 + 1) == bytes([63 << 2, 0, 0, 0, 1])


def _golden_copy(offset, length):
    """Recompute copy bit patterns independently (different formulation)."""
    if 4 <= length <= 11 and offset < 2048:
        hi, lo = divmod(offset, 256)
        return bytes([(hi << 5) + ((length - 4) << 2) + 1, lo])
    if offset < 65536:
        return bytes([((length - 1) << 2) + 2]) + offset.to_bytes(2, "little")
    return bytes([((length - 1) << 2) + 3]) + offset.to_bytes(4, "little")


def test_copy_element_randomized():
    # 100 randomized cases x 3 offset classes, as CopyCompressSpec does.
    rng = random.Random(4444)
    for _ in range(100):
        for lo, hi in [(1, 2047), (2048, 65535), (65536, 2**31)]:
            offset = rng.randint(lo, hi)
            length = rng.randint(1, 64) if lo > 1 else rng.randint(4, 64)
            assert fmt.copy_element(offset, length) == _golden_copy(offset, length)


def test_copy_element_boundaries():
    assert fmt.copy_element(1, 4) == bytes([0b000_000_01, 1])
    assert fmt.copy_element(2047, 11) == _golden_copy(2047, 11)
    assert fmt.copy_element(2048, 4) == bytes([(3 << 2) | 2, 0, 8])
    assert len(fmt.copy_element(65535, 64)) == 3
    assert len(fmt.copy_element(65536, 64)) == 5


def test_copy_fragment_lengths():
    assert fmt.copy_fragment_lengths(4) == [4]
    assert fmt.copy_fragment_lengths(64) == [64]
    assert fmt.copy_fragment_lengths(65) == [60, 5]
    assert fmt.copy_fragment_lengths(67) == [60, 7]
    assert fmt.copy_fragment_lengths(68) == [64, 4]
    assert fmt.copy_fragment_lengths(128) == [64, 64]
    assert fmt.copy_fragment_lengths(130) == [64, 60, 6]
    for total in range(4, 400):
        frags = fmt.copy_fragment_lengths(total)
        assert sum(frags) == total
        assert all(4 <= f <= 64 for f in frags)


def test_hash_matches_reference_constant():
    # HashTable.scala:51-53 — hash(x) = (x * 0x1e35a7bd)[31:32-bits]
    assert fmt.snappy_hash(0, 32 - 9) == 0
    x = 0x64636261  # 'abcd' little-endian
    assert fmt.snappy_hash(x, 32 - 9) == ((x * 0x1E35A7BD) % 2**32) >> 23


def test_hash_table_bits():
    assert fmt.hash_table_bits(10) == 8
    assert fmt.hash_table_bits(256) == 8
    assert fmt.hash_table_bits(257) == 9
    assert fmt.hash_table_bits(65536) == 14
