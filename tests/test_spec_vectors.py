"""Spec-literal test vectors: streams built byte-by-byte FROM THE FORMAT
SPEC TEXT, with expected outputs derived by hand — never by running either
golden codec. This is the mitigation for the shared-misreading risk: our
two goldens (native/snappy_ref.cc, reference_codec.py) are independently
written but certified against each other; these vectors pin the wire format
itself (every tag form x boundary length x boundary offset).

Spec (format_description.txt of the public Snappy format):
  preamble   varint uncompressed length (7 bits/byte, LE, msb = continue)
  literal    tag = (len-1)<<2       for len <= 60
             tag = 60..63 <<2, then 1..4 extra LE bytes holding len-1
  copy1 (01) tag = 1 | (len-4)<<2 | (off>>8)<<5; byte2 = off & 0xFF
             len 4..11, off < 2048
  copy2 (10) tag = 2 | (len-1)<<2; 2-byte LE offset.  len 1..64
  copy4 (11) tag = 3 | (len-1)<<2; 4-byte LE offset.  len 1..64
  copies may overlap their own output (offset < length => RLE semantics)
"""

import pytest

from tpu_snappy import api, reference_codec
from tpu_snappy.native import golden


def check(stream: bytes, expected: bytes):
    assert reference_codec.decompress(stream) == expected
    assert golden.uncompress(stream) == expected
    assert api.decompress(stream, small_fastpath=False) == expected
    # And through the host fast-path for small streams.
    assert api.decompress(stream) == expected


# --- sidecar wire vectors: root maps derived BY HAND ------------------------

def test_sidecar_wire_hand_derived():
    """Stream: literal 'abcd' + copy1(len 4, off 2) + literal 'Z'.
    Output 'abcdcdcdZ'. Root map into the ELEMENT bytes, by hand:
    out0-3 <- elems 1-4; the copy RLEs out2-3 twice (roots 3,4,3,4 —
    two slope-1 pieces); out8 <- elems 8. Wire = magic 'tpS1', P=4,
    starts [0,4,6,8], roots [1,3,3,8], slopes bitset 0xF0."""
    from tpu_snappy import sidecar
    elems = bytes([0x0C]) + b"abcd" + bytes([0x01, 0x02, 0x00]) + b"Z"
    expected = b"abcd" + b"cdcd" + b"Z"
    check(fmt_varint(9) + elems, expected)
    starts, roots, slopes = golden.root_map(elems, 9)
    assert starts.tolist() == [0, 4, 6, 8]
    assert roots.tolist() == [1, 3, 3, 8]
    assert slopes.tolist() == [1, 1, 1, 1]
    wire = sidecar.build(elems, 9)
    assert wire == (b"tpS1" + (4).to_bytes(4, "little")
                    + b"\x00\x00\x04\x00\x06\x00\x08\x00"   # starts u16 LE
                    + b"\x01\x00\x03\x00\x03\x00\x08\x00"   # roots u16 LE
                    + b"\xf0")                              # slope bits
    # python fallback agrees bit-for-bit
    a = sidecar._root_pieces_py(elems, 9)
    assert ([x.tolist() for x in a]
            == [starts.tolist(), roots.tolist(), slopes.tolist()])


def test_sidecar_wire_rle_slope0():
    """Literal 'x' + copy1(len 7, off 1) = 'x'*8: every byte (including
    the literal head — its own root) roots at elems[1], a constant, so the
    greedy extractor emits ONE slope-0 piece covering the whole output:
    out[i] = elems[1 + 0*(i-0)] = 'x'."""
    from tpu_snappy import sidecar
    elems = bytes([0x00]) + b"x" + bytes([0x01 | (3 << 2), 0x01])
    check(fmt_varint(8) + elems, b"x" * 8)
    starts, roots, slopes = golden.root_map(elems, 8)
    assert starts.tolist() == [0]
    assert roots.tolist() == [1]
    assert slopes.tolist() == [0]
    wire = sidecar.build(elems, 8)
    parsed = sidecar.parse(wire)
    assert [x.tolist() for x in parsed] == [[0], [1], [0]]


def fmt_varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


# --- literals: every header form at its boundaries -------------------------

def test_literal_1_byte():
    # tag (1-1)<<2 = 0x00
    check(b"\x01" + b"\x00" + b"A", b"A")


def test_literal_60_max_1byte_header():
    # len 60: tag (60-1)<<2 = 236 = 0xEC
    data = bytes(range(60))
    check(b"\x3c" + b"\xec" + data, data)


def test_literal_61_first_2byte_header():
    # len 61: code 60 => tag 0xF0, one extra byte = len-1 = 60 = 0x3C
    data = bytes(i & 0xFF for i in range(61))
    check(b"\x3d" + b"\xf0\x3c" + data, data)


def test_literal_256_max_2byte_header():
    # len 256: extra byte 0xFF
    data = bytes(i & 0xFF for i in range(256))
    check(b"\x80\x02" + b"\xf0\xff" + data, data)


def test_literal_257_first_3byte_header():
    # len 257: code 61 => tag 0xF4, extra LE bytes 0x00 0x01 (= 256)
    data = bytes(i & 0xFF for i in range(257))
    check(b"\x81\x02" + b"\xf4\x00\x01" + data, data)


def test_literal_65536_3byte_header():
    # len 65536: code 61, extra LE 0xFF 0xFF (= 65535)
    data = bytes(i & 0xFF for i in range(65536))
    check(b"\x80\x80\x04" + b"\xf4\xff\xff" + data, data)


def test_literal_4byte_header():
    # len 65537: code 62 => tag 0xF8, extra LE 0x00 0x00 0x01
    data = bytes(i & 0xFF for i in range(65537))
    check(b"\x81\x80\x04" + b"\xf8\x00\x00\x01" + data, data)


# --- varint preamble boundaries --------------------------------------------

def test_varint_boundaries():
    # 127 -> 0x7F; 128 -> 0x80 0x01; 16384 -> 0x80 0x80 0x01
    d = bytes(i & 0xFF for i in range(127))
    check(b"\x7f" + b"\xf0\x7e" + d, d)
    d = bytes(i & 0xFF for i in range(128))
    check(b"\x80\x01" + b"\xf0\x7f" + d, d)
    d = bytes(i & 0xFF for i in range(16384))
    check(b"\x80\x80\x01" + b"\xf4\xff\x3f" + d, d)


# --- copy1: length and offset boundaries ------------------------------------

def test_copy1_min_len4():
    # "abcd" + copy len 4 off 4: tag = 1 | (4-4)<<2 | (4>>8)<<5 = 0x01
    check(b"\x08" + b"\x0c" + b"abcd" + b"\x01\x04", b"abcdabcd")


def test_copy1_max_len11():
    # 11 literal bytes, copy len 11 off 11: tag = 1 | 7<<2 | 0<<5 = 0x1D
    data = b"ABCDEFGHIJK"
    check(b"\x16" + b"\x28" + data + b"\x1d\x0b", data + data)


def test_copy1_max_offset_2047():
    # 2047 'x's + copy len 8 off 2047: tag = 1 | (8-4)<<2 | (2047>>8)<<5
    #   = 1 | 16 | 7<<5 = 0xF1; byte2 = 2047 & 0xFF = 0xFF
    lit = b"x" * 2047
    stream = (b"\x87\x10"            # varint 2055 = 0x807 -> 0x87 0x10
              + b"\xf4\xfe\x07" + lit  # literal 2047: code 61, LE 2046
              + b"\xf1\xff")
    check(stream, lit + b"x" * 8)


def test_copy1_rle_overlap():
    # "abc" + copy len 7 off 3 (overlaps): tag = 1 | 3<<2 | 0<<5 = 0x0D
    check(b"\x0a" + b"\x08" + b"abc" + b"\x0d\x03", b"abcabcabca")


# --- copy2 ------------------------------------------------------------------

def test_copy2_rle_len64_off1():
    # 'x' + copy len 64 off 1: tag = 2 | 63<<2 = 0xFE, offset 0x0001 LE
    check(b"\x41" + b"\x00x" + b"\xfe\x01\x00", b"x" * 65)


def test_copy2_len1_legal():
    # len-1 copy2 (no encoder emits it; the spec allows it): tag = 0x02
    check(b"\x05" + b"\x0c" + b"abcd" + b"\x02\x03\x00", b"abcdb")


def test_copy2_offset_65535():
    # 65535 bytes of literal + copy2 len 4 off 65535 -> bytes [0:4)
    lit = bytes(i & 0xFF for i in range(65535))
    stream = (b"\x83\x80\x04"           # varint 65539
              + b"\xf4\xfe\xff" + lit   # literal 65535 (extra LE 65534)
              + b"\x0e\xff\xff")        # tag = 2 | 3<<2 = 0x0E
    check(stream, lit + lit[:4])


# --- copy4 ------------------------------------------------------------------

def test_copy4_basic():
    # "abcde" + copy4 len 5 off 5: tag = 3 | (5-1)<<2 = 0x13
    check(b"\x0a" + b"\x10" + b"abcde" + b"\x13\x05\x00\x00\x00",
          b"abcdeabcde")


def test_copy4_large_offset_exact():
    # 70000 literal bytes then copy4 len 64 off 70000 (> 2^16)
    lit = bytes((i * 7) & 0xFF for i in range(70000))
    stream = (b"\xb0\xa3\x04"                       # varint 70064
              + b"\xf4\x6f\x11" + lit[:4464]        # literal 4464 (LE 4463)
              + b"\xf4\xff\xff" + lit[4464:70000]   # literal 65536
              + b"\xff\x70\x11\x01\x00")            # tag 3|63<<2, off 70000
    check(stream, lit + lit[:64])


# --- mixed element chain (every tag class in one stream) --------------------

def test_mixed_chain():
    # "0123" | copy1 len4 off4 | literal "ab" | copy2 len6 off6 | copy4 len4 off16
    out = b"0123" + b"0123" + b"ab" + b"0123ab" + b"0123"
    stream = (bytes([len(out)])
              + b"\x0c" + b"0123"
              + b"\x01\x04"
              + b"\x04" + b"ab"
              + b"\x16\x06\x00"          # tag = 2 | 5<<2 = 0x16
              + b"\x0f\x10\x00\x00\x00")  # tag = 3 | 3<<2 = 0x0F
    check(stream, out)


def test_copy4_len1_legal():
    # len-1 copy4 (spec-legal, no encoder emits it): tag = 3 | 0<<2 = 0x03
    check(b"\x05" + b"\x0c" + b"abcd" + b"\x03\x02\x00\x00\x00", b"abcdc")


# --- exact fragment boundary: hand-built TWO-fragment stream ----------------

def test_two_fragment_stream_device_path():
    # Fragment 1 fills output positions [0, 65536) exactly:
    #   literal "x"*16          tag (16-1)<<2 = 0x3C
    #   1023 x copy2 len64 off16  tag 2 | 63<<2 = 0xFE, off LE 0x10 0x00
    #   copy2 len48 off16         tag 2 | 47<<2 = 0xBE
    # 16 + 1023*64 + 48 = 65536. Fragment 2 restarts (offsets stay local,
    # as every known encoder's 64 KB blocking guarantees):
    #   literal "abcd" (0x0C) + copy1 len4 off4 (0x01 0x04)
    out = b"x" * 65536 + b"abcdabcd"
    stream = (b"\x88\x80\x04"                     # varint 65544
              + b"\x3c" + b"x" * 16
              + (b"\xfe\x10\x00" * 1023)
              + b"\xbe\x10\x00"
              + b"\x0c" + b"abcd" + b"\x01\x04")
    check(stream, out)


# --- varint preamble edge forms ---------------------------------------------

def test_empty_stream():
    check(b"\x00", b"")


def test_varint_non_canonical_zero_padding():
    # 1 encoded as 0x81 0x00 (non-canonical but decodable 7-bit LE).
    check(b"\x81\x00" + b"\x00A", b"A")


# --- malformed streams must raise everywhere --------------------------------

@pytest.mark.parametrize("bad", [
    b"\x04" + b"\x0c" + b"ab",                    # truncated literal payload
    b"\x08" + b"\x0c" + b"abcd" + b"\x01",        # truncated copy1
    b"\x08" + b"\x0c" + b"abcd" + b"\x0d\x08",    # offset 8 > written 4
    b"\x08" + b"\x0c" + b"abcd" + b"\x01\x00",    # offset 0
    b"\x09" + b"\x0c" + b"abcd" + b"\x01\x04",    # preamble length mismatch
    b"\x05" + b"\x0c" + b"abcd" + b"\x02\x00\x00",  # copy2 offset 0
    b"\x05" + b"\x0c" + b"abcd" + b"\x03\x00\x00\x00\x00",  # copy4 offset 0
    b"\x80",                                      # truncated varint preamble
    b"\x04" + b"\x0c" + b"abcd" + b"\x00",        # trailing byte after chain
])
def test_malformed_raise(bad):
    with pytest.raises(ValueError):
        reference_codec.decompress(bad)
    with pytest.raises(ValueError):
        api.decompress(bad, small_fastpath=False)
    with pytest.raises((ValueError, RuntimeError)):
        golden.uncompress(bad)
