// Clean-room Snappy codec implementation. See snappy_ref.h.
//
// Written from the public wire-format description; independent of both
// google/snappy's source and this repo's JAX codec (two-implementation
// cross-validation is the point).

#include "snappy_ref.h"

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

constexpr size_t kBlockSize = 1u << 16;
constexpr uint32_t kHashMul = 0x1e35a7bd;
constexpr int kMaxHashBits = 14;

inline uint32_t Load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, sizeof(v));
  return v;  // little-endian hosts only (x86/ARM); fine for this image.
}

inline uint32_t Hash(uint32_t v, int shift) { return (v * kHashMul) >> shift; }

inline uint8_t* EmitVarint(uint8_t* op, uint64_t v) {
  while (v >= 0x80) {
    *op++ = static_cast<uint8_t>(v) | 0x80;
    v >>= 7;
  }
  *op++ = static_cast<uint8_t>(v);
  return op;
}

uint8_t* EmitLiteral(uint8_t* op, const uint8_t* lit, size_t len) {
  size_t n = len - 1;
  if (n < 60) {
    *op++ = static_cast<uint8_t>(n << 2);
  } else if (n < (1u << 8)) {
    *op++ = 60 << 2;
    *op++ = static_cast<uint8_t>(n);
  } else if (n < (1u << 16)) {
    *op++ = 61 << 2;
    *op++ = static_cast<uint8_t>(n);
    *op++ = static_cast<uint8_t>(n >> 8);
  } else if (n < (1u << 24)) {
    *op++ = 62 << 2;
    *op++ = static_cast<uint8_t>(n);
    *op++ = static_cast<uint8_t>(n >> 8);
    *op++ = static_cast<uint8_t>(n >> 16);
  } else {
    *op++ = 63 << 2;
    *op++ = static_cast<uint8_t>(n);
    *op++ = static_cast<uint8_t>(n >> 8);
    *op++ = static_cast<uint8_t>(n >> 16);
    *op++ = static_cast<uint8_t>(n >> 24);
  }
  std::memcpy(op, lit, len);
  return op + len;
}

uint8_t* EmitCopyOne(uint8_t* op, size_t offset, size_t len) {
  // len in [4, 64], offset >= 1 (< 64K inside a block).
  if (len <= 11 && offset < 2048) {
    *op++ = static_cast<uint8_t>(0x01 | ((len - 4) << 2) | ((offset >> 8) << 5));
    *op++ = static_cast<uint8_t>(offset);
  } else {
    *op++ = static_cast<uint8_t>(0x02 | ((len - 1) << 2));
    *op++ = static_cast<uint8_t>(offset);
    *op++ = static_cast<uint8_t>(offset >> 8);
  }
  return op;
}

uint8_t* EmitCopy(uint8_t* op, size_t offset, size_t len) {
  // Software Snappy's splitting: keep the final element >= 4 bytes.
  while (len >= 68) {
    op = EmitCopyOne(op, offset, 64);
    len -= 64;
  }
  if (len > 64) {
    op = EmitCopyOne(op, offset, 60);
    len -= 60;
  }
  return EmitCopyOne(op, offset, len);
}

int TableBits(size_t block_len) {
  int bits = 8;
  while ((size_t{1} << bits) < block_len && bits < kMaxHashBits) bits++;
  return bits;
}

uint8_t* CompressBlock(const uint8_t* base, size_t len, uint8_t* op, int mode) {
  if (len < 4) {
    if (len) op = EmitLiteral(op, base, len);
    return op;
  }
  const int bits = TableBits(len);
  const int shift = 32 - bits;
  std::vector<int32_t> table(size_t{1} << bits, -1);

  const size_t limit = len - 4;  // last index with a full 4-byte load
  size_t pos = 0;
  size_t next_emit = 0;
  uint32_t skip = 32;

  while (pos <= limit) {
    const uint32_t cur = Load32(base + pos);
    const uint32_t h = Hash(cur, shift);
    const int32_t cand = table[h];
    table[h] = static_cast<int32_t>(pos);
    if (cand >= 0 && Load32(base + cand) == cur) {
      if (pos > next_emit) op = EmitLiteral(op, base + next_emit, pos - next_emit);
      size_t matched = 4;
      while (pos + matched < len &&
             base[cand + matched] == base[pos + matched]) {
        matched++;
      }
      op = EmitCopy(op, pos - static_cast<size_t>(cand), matched);
      pos += matched;
      next_emit = pos;
      skip = 32;
      // Seed the table with the position just before the continuation point
      // so immediately-repeating patterns keep chaining (software Snappy
      // does the same after a match).
      if (pos >= 1 && pos <= limit) {
        uint32_t prev = Load32(base + pos - 1);
        table[Hash(prev, shift)] = static_cast<int32_t>(pos - 1);
      }
    } else {
      pos += (mode == SR_MODE_DENSE) ? 1 : (skip++ >> 5);
    }
  }
  if (next_emit < len) op = EmitLiteral(op, base + next_emit, len - next_emit);
  return op;
}

int ReadVarint(const uint8_t* in, size_t n, size_t* pos, uint64_t* value) {
  uint64_t v = 0;
  for (int i = 0; i < 5; i++) {
    if (*pos >= n) return SR_ERR_TRUNCATED;
    uint8_t b = in[(*pos)++];
    v |= static_cast<uint64_t>(b & 0x7f) << (7 * i);
    if (!(b & 0x80)) {
      *value = v;
      return SR_OK;
    }
  }
  return SR_ERR_BAD_VARINT;
}

}  // namespace

extern "C" {

size_t sr_max_compressed_length(size_t n) { return 32 + n + n / 6; }

size_t sr_compress(const uint8_t* in, size_t n, uint8_t* out, int mode) {
  uint8_t* op = EmitVarint(out, n);
  for (size_t start = 0; start < n; start += kBlockSize) {
    const size_t blen = (n - start < kBlockSize) ? n - start : kBlockSize;
    op = CompressBlock(in + start, blen, op, mode);
  }
  return static_cast<size_t>(op - out);
}

int sr_uncompressed_length(const uint8_t* in, size_t n, uint64_t* result) {
  size_t pos = 0;
  return ReadVarint(in, n, &pos, result);
}

int sr_uncompress(const uint8_t* in, size_t n, uint8_t* out, size_t out_cap,
                  uint64_t* out_len) {
  size_t ip = 0;
  uint64_t expected = 0;
  int rc = ReadVarint(in, n, &ip, &expected);
  if (rc != SR_OK) return rc;
  if (expected > out_cap) return SR_ERR_CAPACITY;

  size_t op = 0;
  while (ip < n) {
    const uint8_t tag = in[ip];
    const unsigned kind = tag & 3;
    if (kind == 0) {  // literal
      size_t llen;
      if ((tag >> 2) < 60) {
        llen = (tag >> 2) + 1;
        ip += 1;
      } else {
        const unsigned extra = (tag >> 2) - 59;  // 1..4 bytes
        if (ip + 1 + extra > n) return SR_ERR_TRUNCATED;
        uint64_t v = 0;
        for (unsigned i = 0; i < extra; i++) {
          v |= static_cast<uint64_t>(in[ip + 1 + i]) << (8 * i);
        }
        llen = static_cast<size_t>(v) + 1;
        ip += 1 + extra;
      }
      if (ip + llen > n) return SR_ERR_TRUNCATED;
      if (op + llen > expected) return SR_ERR_LENGTH_MISMATCH;
      std::memcpy(out + op, in + ip, llen);
      ip += llen;
      op += llen;
    } else {
      size_t clen, offset;
      if (kind == 1) {
        if (ip + 2 > n) return SR_ERR_TRUNCATED;
        clen = ((tag >> 2) & 0x7) + 4;
        offset = (static_cast<size_t>(tag >> 5) << 8) | in[ip + 1];
        ip += 2;
      } else if (kind == 2) {
        if (ip + 3 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = in[ip + 1] | (static_cast<size_t>(in[ip + 2]) << 8);
        ip += 3;
      } else {
        if (ip + 5 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = in[ip + 1] | (static_cast<size_t>(in[ip + 2]) << 8) |
                 (static_cast<size_t>(in[ip + 3]) << 16) |
                 (static_cast<size_t>(in[ip + 4]) << 24);
        ip += 5;
      }
      if (offset == 0 || offset > op) return SR_ERR_BAD_OFFSET;
      if (op + clen > expected) return SR_ERR_LENGTH_MISMATCH;
      // Byte loop honors overlapping-copy (RLE) semantics.
      for (size_t i = 0; i < clen; i++) {
        out[op + i] = out[op - offset + i];
      }
      op += clen;
    }
  }
  if (op != expected) return SR_ERR_LENGTH_MISMATCH;
  *out_len = op;
  return SR_OK;
}

int sr_root_map(const uint8_t* elems, size_t n, uint64_t expected_out,
                uint16_t* piece_start, uint16_t* piece_root,
                uint8_t* piece_slope, size_t max_pieces,
                uint32_t* num_pieces) {
  // Root map of one element stream (<= 64 KB output, NO varint preamble):
  // for every output byte, the index INTO `elems` of the literal byte that
  // ultimately supplies it (copies resolved transitively), returned as
  // maximal affine pieces with slope 0 or 1:
  //   output[i] == elems[root[p] + slope[p] * (i - start[p])]
  // for start[p] <= i < start[p+1]. Slope 1 covers literal runs and
  // non-overlapping copies; slope 0 covers offset-1 RLE runs (constant
  // root). This is the encoder half of the framed sidecar co-design (the
  // decode side skips parse+resolve and runs one gather); the reference
  // co-designed its emission with its datapath the same way
  // (CompressionAccelerator.scala:230-285).
  if (expected_out > kBlockSize || n > 0xffff) return SR_ERR_CAPACITY;
  std::vector<uint32_t> root(static_cast<size_t>(expected_out));
  size_t ip = 0;
  size_t op = 0;
  while (ip < n) {
    const uint8_t tag = elems[ip];
    const unsigned kind = tag & 3;
    if (kind == 0) {  // literal: payload bytes root themselves
      size_t llen, hdr;
      if ((tag >> 2) < 60) {
        llen = (tag >> 2) + 1;
        hdr = 1;
      } else {
        const unsigned extra = (tag >> 2) - 59;
        if (ip + 1 + extra > n) return SR_ERR_TRUNCATED;
        uint64_t v = 0;
        for (unsigned i = 0; i < extra; i++)
          v |= static_cast<uint64_t>(elems[ip + 1 + i]) << (8 * i);
        llen = static_cast<size_t>(v) + 1;
        hdr = 1 + extra;
      }
      if (ip + hdr + llen > n) return SR_ERR_TRUNCATED;
      if (op + llen > expected_out) return SR_ERR_LENGTH_MISMATCH;
      for (size_t i = 0; i < llen; i++)
        root[op + i] = static_cast<uint32_t>(ip + hdr + i);
      ip += hdr + llen;
      op += llen;
    } else {
      size_t clen, offset;
      if (kind == 1) {
        if (ip + 2 > n) return SR_ERR_TRUNCATED;
        clen = ((tag >> 2) & 0x7) + 4;
        offset = (static_cast<size_t>(tag >> 5) << 8) | elems[ip + 1];
        ip += 2;
      } else if (kind == 2) {
        if (ip + 3 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = elems[ip + 1] | (static_cast<size_t>(elems[ip + 2]) << 8);
        ip += 3;
      } else {
        if (ip + 5 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = elems[ip + 1] | (static_cast<size_t>(elems[ip + 2]) << 8) |
                 (static_cast<size_t>(elems[ip + 3]) << 16) |
                 (static_cast<size_t>(elems[ip + 4]) << 24);
        ip += 5;
      }
      if (offset == 0 || offset > op) return SR_ERR_BAD_OFFSET;
      if (op + clen > expected_out) return SR_ERR_LENGTH_MISMATCH;
      for (size_t i = 0; i < clen; i++)  // byte loop: RLE semantics
        root[op + i] = root[op - offset + i];
      op += clen;
    }
  }
  if (op != expected_out) return SR_ERR_LENGTH_MISMATCH;
  // Greedy maximal pieces: a piece's slope is fixed by its second byte
  // (first delta in {0, 1}); any other delta starts a new piece.
  size_t np_ = 0;
  size_t i = 0;
  while (i < op) {
    if (np_ >= max_pieces) return SR_ERR_CAPACITY;
    piece_start[np_] = static_cast<uint16_t>(i);
    piece_root[np_] = static_cast<uint16_t>(root[i]);
    uint8_t slope = 1;
    size_t j = i + 1;
    if (j < op) {
      const uint32_t d = root[j] - root[i];  // wraps if negative: != 0/1
      if (d <= 1) {
        slope = static_cast<uint8_t>(d);
        while (j < op && root[j] == root[j - 1] + slope) j++;
      }
    }
    piece_slope[np_] = slope;
    np_++;
    i = j;
  }
  *num_pieces = static_cast<uint32_t>(np_);
  return SR_OK;
}

// One-step collapsed source map over the FULL padded 64 KB domain —
// parse_transport's semantics (tpu_snappy/ops/decode.py: element walk,
// run-head collapse with modular RLE addressing, and the forward-filled
// final element extending over the padding). Shared by both depth-hint
// builders below. Values satisfy src[p] <= p (roots: src[p] == p), so a
// single ascending pass can compute chain properties.
static int sr_build_onestep_map(const uint8_t* elems, size_t n,
                                uint64_t expected_out, uint16_t* src) {
  constexpr uint32_t kOut = 1u << 16;
  size_t ip = 0, op = 0;
  // run_start tracks the head of the current contiguous same-offset
  // copy-element run (decode.py's run_head/rs_f forward-fill,
  // element-granular here).
  size_t run_start = 0, last_off = 0;
  bool last_copy = false;
  size_t tail_off = 0;  // final element's copy offset (0 = literal)
  while (ip < n) {
    const uint8_t tag = elems[ip];
    const unsigned kind = tag & 3;
    if (kind == 0) {
      size_t llen, hdr;
      if ((tag >> 2) < 60) {
        llen = (tag >> 2) + 1;
        hdr = 1;
      } else {
        const unsigned extra = (tag >> 2) - 59;
        if (ip + 1 + extra > n) return SR_ERR_TRUNCATED;
        uint64_t v = 0;
        for (unsigned i = 0; i < extra; i++)
          v |= static_cast<uint64_t>(elems[ip + 1 + i]) << (8 * i);
        llen = static_cast<size_t>(v) + 1;
        hdr = 1 + extra;
      }
      if (ip + hdr + llen > n) return SR_ERR_TRUNCATED;
      if (op + llen > expected_out) return SR_ERR_LENGTH_MISMATCH;
      for (size_t i = 0; i < llen; i++)
        src[op + i] = static_cast<uint16_t>(op + i);
      ip += hdr + llen;
      op += llen;
      last_copy = false;
      tail_off = 0;
    } else {
      size_t clen, offset;
      if (kind == 1) {
        if (ip + 2 > n) return SR_ERR_TRUNCATED;
        clen = ((tag >> 2) & 0x7) + 4;
        offset = (static_cast<size_t>(tag >> 5) << 8) | elems[ip + 1];
        ip += 2;
      } else if (kind == 2) {
        if (ip + 3 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = elems[ip + 1] | (static_cast<size_t>(elems[ip + 2]) << 8);
        ip += 3;
      } else {
        if (ip + 5 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = elems[ip + 1] | (static_cast<size_t>(elems[ip + 2]) << 8) |
                 (static_cast<size_t>(elems[ip + 3]) << 16) |
                 (static_cast<size_t>(elems[ip + 4]) << 24);
        ip += 5;
      }
      if (offset == 0 || offset > op) return SR_ERR_BAD_OFFSET;
      if (op + clen > expected_out) return SR_ERR_LENGTH_MISMATCH;
      if (!last_copy || offset != last_off) run_start = op;
      const size_t base = run_start - offset;
      const size_t end = op + clen;
      // plain >= run_start splits at the fixed boundary
      // p == run_start + offset: below it the fill is the affine
      // p - offset (vectorizable); above it run-collapse modular
      // addressing applies, tracked incrementally (one div per element).
      size_t b = run_start + offset;
      if (b > end) b = end;
      size_t p = op;
      for (; p < b; p++) src[p] = static_cast<uint16_t>(p - offset);
      if (p < end) {
        size_t m = (p - base) % offset;
        for (; p < end; p++) {
          src[p] = static_cast<uint16_t>(m + base);
          if (++m == offset) m = 0;
        }
      }
      op += clen;
      last_copy = true;
      last_off = offset;
      tail_off = offset;
    }
  }
  if (op != expected_out) return SR_ERR_LENGTH_MISMATCH;
  // Padding positions [ulen, 64K): the decoder's forward-filled element
  // descriptors extend the FINAL element over the padded domain; these
  // lanes participate in the moving counts and tile depths.
  if (tail_off == 0) {
    for (size_t p = op; p < kOut; p++) src[p] = static_cast<uint16_t>(p);
  } else {
    const size_t base = run_start - tail_off;
    size_t b = run_start + tail_off;
    if (b < op) b = op;
    if (b > kOut) b = kOut;
    size_t p = op;
    for (; p < b; p++) src[p] = static_cast<uint16_t>(p - tail_off);
    if (p < kOut) {
      size_t m = (p - base) % tail_off;
      for (; p < kOut; p++) {
        src[p] = static_cast<uint16_t>(m + base);
        if (++m == tail_off) m = 0;
      }
    }
  }
  return SR_OK;
}

int sr_depth_hints_sim(const uint8_t* elems, size_t n, uint64_t expected_out,
                       uint32_t tail_cap, uint32_t tile, uint8_t* depths) {
  // Brute-force reference: mirrors tpu_snappy/ops/decode.py operation by
  // operation (the dense while-loop's cond and tiledres' per-tile local
  // rounds) — kept as the cross-check oracle for the analytic
  // sr_depth_hints below (tests compare them on corpus + fuzz streams).
  constexpr uint32_t kOut = 1u << 16;
  if (expected_out == 0 || expected_out > kBlockSize || n > 0xffff)
    return SR_ERR_CAPACITY;
  if (tile == 0 || (kOut % tile) != 0 || (tile % 128) != 0)
    return SR_ERR_CAPACITY;
  std::vector<uint16_t> src(kOut);
  if (int rc = sr_build_onestep_map(elems, n, expected_out, src.data()))
    return rc;
  // Dense doubling rounds: decode.py's cond is
  //   (cnt > tail_cap) & (it < 16), cnt initialized above 64 K.
  {
    std::vector<uint16_t> nxt(kOut);
    uint32_t cnt = kOut + 1;
    for (int it = 0; cnt > tail_cap && it < 16; it++) {
      cnt = 0;
      for (size_t p = 0; p < kOut; p++) {
        nxt[p] = src[src[p]];
        cnt += (nxt[p] != src[p]);
      }
      src.swap(nxt);
    }
  }
  // Per-tile local rounds to each tile's local fixpoint (tiledres
  // semantics: only lanes whose pointer is inside the tile advance, and
  // they gather from the tile's own current state).
  const size_t nt = kOut / tile;
  std::vector<uint16_t> s(tile), g(tile);
  for (size_t t = 0; t < nt; t++) {
    const uint32_t base = static_cast<uint32_t>(t * tile);
    for (size_t i = 0; i < tile; i++) s[i] = src[base + i];
    uint8_t rounds = 0;
    for (;;) {
      bool changed = false;
      for (size_t i = 0; i < tile; i++) {
        g[i] = s[i] >= base ? s[s[i] - base] : s[i];
        changed |= (g[i] != s[i]);
      }
      if (!changed) break;
      s.swap(g);
      rounds++;
    }
    depths[t] = rounds;
  }
  return SR_OK;
}

int sr_depth_hints(const uint8_t* elems, size_t n, uint64_t expected_out,
                   uint32_t tail_cap, uint32_t tile, uint8_t* depths) {
  // Analytic form of sr_depth_hints_sim — bit-identical (cross-checked
  // in tests/test_sidecar.py: five stream classes x {4 caps} x {4 tiles}
  // plus 40 random mixed-structure fuzz streams) at a fraction of the
  // host work, because both doubling phases are determined by per-lane
  // chain depths computable WITHOUT simulation:
  //  - Simultaneous pointer doubling moves a lane in round r (1-indexed)
  //    iff its plain chain depth to root D > 2^(r-1), so the sim's moving
  //    count after round r is #{D > 2^(r-1)}: threshold counts over D fix
  //    the executed dense round count R.
  //  - The per-tile phase is doubling on the post-dense graph whose edges
  //    are 2^R plain steps (saturated at roots). A lane reaches its tile
  //    terminal — the first chain value below the tile base, or the
  //    in-tile global root (chains are monotone decreasing, so a chain
  //    whose root lies in the tile never leaves it) — in
  //    L = ceil(S / 2^R) graph steps, where S is the plain-step distance
  //    to that terminal, and stops changing after ceil(log2(L)) doubling
  //    iterations (its changes occupy iterations 1..ceil(log2(L))).
  //    The tile's simulated round count is the lane max, and since
  //    ceil/log2 are monotone that is ceil(log2(ceil(maxS / 2^R))).
  // The walk writes D (depth to root), root (root position) and T (plain
  // steps to the first value below the lane's tile base) directly,
  // element by element: a copy's per-byte parents are the contiguous
  // earlier span p - offset (or the modular run-collapse window), so the
  // recurrences read CONTIGUOUS just-written memory — no random access
  // and no separate chain-walk pass.
  constexpr uint32_t kOut = 1u << 16;
  if (expected_out == 0 || expected_out > kBlockSize || n > 0xffff)
    return SR_ERR_CAPACITY;
  if (tile == 0 || (kOut % tile) != 0 || (tile % 128) != 0)
    return SR_ERR_CAPACITY;
  const uint32_t tmask = tile - 1;
  // Reused across calls (every lane is written before it is read, so no
  // state leaks between chunks); saves ~0.07 ms/chunk of alloc+zero.
  static thread_local std::vector<uint16_t> D(kOut), RT(kOut), T(kOut);
  size_t ip = 0, op = 0;
  size_t run_start = 0, last_off = 0;
  bool last_copy = false;
  size_t tail_off = 0;
  // Plain copy span [beg, end) with source span [beg-offset, end-offset)
  // entirely disjoint (offset >= end-beg): the three recurrences are
  // straight span ops the compiler vectorizes. T needs tile-segmenting:
  // within a tile (base fixed), p < base+offset means the source is in a
  // lower tile (T=1); the rest copies T+1 from in-tile sources, which
  // precede beg because offset >= the span length.
  auto fill_plain_vec = [&](size_t beg, size_t end, size_t offset) {
    const size_t len = end - beg;
    {
      const uint16_t* __restrict s = D.data() + (beg - offset);
      uint16_t* __restrict d = D.data() + beg;
      for (size_t i = 0; i < len; i++)
        d[i] = static_cast<uint16_t>(s[i] + 1);
    }
    std::memcpy(RT.data() + beg, RT.data() + (beg - offset), len * 2);
    size_t p = beg;
    while (p < end) {
      const size_t base = p & ~static_cast<size_t>(tmask);
      const size_t send = std::min(end, base + tile);
      size_t b1 = base + offset;
      if (b1 < p) b1 = p;
      if (b1 > send) b1 = send;
      for (size_t q = p; q < b1; q++) T[q] = 1;
      if (b1 < send) {
        const uint16_t* __restrict s = T.data() + (b1 - offset);
        uint16_t* __restrict d = T.data() + b1;
        const size_t l2 = send - b1;
        for (size_t i = 0; i < l2; i++)
          d[i] = static_cast<uint16_t>(s[i] + 1);
      }
      p = send;
    }
  };
  // Fill [beg, end) as copy bytes with the given offset/run_start —
  // shared by copy elements and the padding tail.
  auto fill_copy = [&](size_t beg, size_t end, size_t offset,
                       size_t rstart) {
    const size_t base0 = rstart - offset;
    size_t b = rstart + offset;  // plain/modular boundary
    if (b < beg) b = beg;
    if (b > end) b = end;
    if (b - beg >= 32 && offset >= b - beg) {
      // long span: vector path (short spans lose to its call overhead)
      fill_plain_vec(beg, b, offset);
    } else {
      for (size_t p = beg; p < b; p++) {  // plain span: parent = p-offset
        const size_t s = p - offset;
        D[p] = static_cast<uint16_t>(D[s] + 1);
        RT[p] = RT[s];
        T[p] = s < (p & ~static_cast<size_t>(tmask))
                   ? 1
                   : static_cast<uint16_t>(T[s] + 1);
      }
    }
    if (b < end) {  // modular span: parent cycles [base0, base0+offset)
      size_t m = (b - base0) % offset;
      for (size_t p = b; p < end; p++) {
        const size_t s = m + base0;
        D[p] = static_cast<uint16_t>(D[s] + 1);
        RT[p] = RT[s];
        T[p] = s < (p & ~static_cast<size_t>(tmask))
                   ? 1
                   : static_cast<uint16_t>(T[s] + 1);
        if (++m == offset) m = 0;
      }
    }
  };
  while (ip < n) {
    const uint8_t tag = elems[ip];
    const unsigned kind = tag & 3;
    if (kind == 0) {
      size_t llen, hdr;
      if ((tag >> 2) < 60) {
        llen = (tag >> 2) + 1;
        hdr = 1;
      } else {
        const unsigned extra = (tag >> 2) - 59;
        if (ip + 1 + extra > n) return SR_ERR_TRUNCATED;
        uint64_t v = 0;
        for (unsigned i = 0; i < extra; i++)
          v |= static_cast<uint64_t>(elems[ip + 1 + i]) << (8 * i);
        llen = static_cast<size_t>(v) + 1;
        hdr = 1 + extra;
      }
      if (ip + hdr + llen > n) return SR_ERR_TRUNCATED;
      if (op + llen > expected_out) return SR_ERR_LENGTH_MISMATCH;
      // literal: self-root (memset only pays off on long runs)
      if (llen >= 32) {
        std::memset(D.data() + op, 0, llen * 2);
        std::memset(T.data() + op, 0, llen * 2);
        uint16_t* __restrict r = RT.data() + op;
        for (size_t i = 0; i < llen; i++)
          r[i] = static_cast<uint16_t>(op + i);
      } else {
        for (size_t p = op; p < op + llen; p++) {
          D[p] = 0;
          RT[p] = static_cast<uint16_t>(p);
          T[p] = 0;
        }
      }
      ip += hdr + llen;
      op += llen;
      last_copy = false;
      tail_off = 0;
    } else {
      size_t clen, offset;
      if (kind == 1) {
        if (ip + 2 > n) return SR_ERR_TRUNCATED;
        clen = ((tag >> 2) & 0x7) + 4;
        offset = (static_cast<size_t>(tag >> 5) << 8) | elems[ip + 1];
        ip += 2;
      } else if (kind == 2) {
        if (ip + 3 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = elems[ip + 1] | (static_cast<size_t>(elems[ip + 2]) << 8);
        ip += 3;
      } else {
        if (ip + 5 > n) return SR_ERR_TRUNCATED;
        clen = (tag >> 2) + 1;
        offset = elems[ip + 1] | (static_cast<size_t>(elems[ip + 2]) << 8) |
                 (static_cast<size_t>(elems[ip + 3]) << 16) |
                 (static_cast<size_t>(elems[ip + 4]) << 24);
        ip += 5;
      }
      if (offset == 0 || offset > op) return SR_ERR_BAD_OFFSET;
      if (op + clen > expected_out) return SR_ERR_LENGTH_MISMATCH;
      if (!last_copy || offset != last_off) run_start = op;
      fill_copy(op, op + clen, offset, run_start);
      op += clen;
      last_copy = true;
      last_off = offset;
      tail_off = offset;
    }
  }
  if (op != expected_out) return SR_ERR_LENGTH_MISMATCH;
  // Padding positions [ulen, 64K): the decoder's forward-filled element
  // descriptors extend the FINAL element over the padded domain.
  if (tail_off == 0) {
    std::memset(D.data() + op, 0, (kOut - op) * 2);
    std::memset(T.data() + op, 0, (kOut - op) * 2);
    uint16_t* __restrict r = RT.data();
    for (size_t p = op; p < kOut; p++) r[p] = static_cast<uint16_t>(p);
  } else {
    fill_copy(op, kOut, tail_off, run_start);
  }
  // Executed dense rounds (sim: cnt starts at kOut+1, runs while
  // cnt > tail_cap, at most 16; after round r, cnt = #{D > 2^(r-1)}),
  // via one vectorizable threshold-count pass per executed round.
  uint32_t R = 0;
  if (kOut + 1 > tail_cap) {
    R = 1;
    while (R < 16) {
      const uint16_t thr = static_cast<uint16_t>(
          (1u << (R - 1)) > 0xffff ? 0xffff : (1u << (R - 1)));
      uint32_t cnt = 0;
      for (uint32_t p = 0; p < kOut; p++) cnt += (D[p] > thr);
      if (cnt > tail_cap)
        R++;
      else
        break;
    }
  }
  // Per-tile rounds from the plain terminal distances
  // S = (root in tile) ? D : T, maxed over the tile.
  const size_t nt = kOut / tile;
  for (size_t t = 0; t < nt; t++) {
    const uint32_t base = static_cast<uint32_t>(t * tile);
    uint32_t maxS = 0;
    for (uint32_t p = base; p < base + tile; p++) {
      const uint32_t S = RT[p] >= base ? D[p] : T[p];
      if (S > maxS) maxS = S;
    }
    const uint32_t L = (maxS + (1u << R) - 1) >> R;
    depths[t] =
        L >= 2 ? static_cast<uint8_t>(32 - __builtin_clz(L - 1)) : 0;
  }
  return SR_OK;
}

int sr_scan_index(const uint8_t* in, size_t n, size_t start,
                  uint64_t expected_out, uint32_t* comp_off,
                  uint32_t* out_len, size_t max_frags, uint32_t* num_frags) {
  constexpr uint64_t kFrag = 1u << 16;
  size_t ip = start;
  uint64_t op = 0;
  size_t frag = 0;
  size_t frag_ip = ip;
  uint64_t frag_op = 0;
  while (ip < n) {
    const uint8_t tag = in[ip];
    const unsigned kind = tag & 3;
    size_t esize, outbytes;
    if (kind == 0) {
      const unsigned code = tag >> 2;
      if (code < 60) {
        outbytes = code + 1;
        esize = 1 + outbytes;
      } else {
        const unsigned extra = code - 59;
        if (ip + 1 + extra > n) return SR_ERR_TRUNCATED;
        uint64_t v = 0;
        for (unsigned i = 0; i < extra; i++) {
          v |= static_cast<uint64_t>(in[ip + 1 + i]) << (8 * i);
        }
        outbytes = v + 1;
        esize = 1 + extra + outbytes;
      }
    } else {
      esize = (kind == 1) ? 2 : (kind == 2) ? 3 : 5;
      outbytes = (kind == 1) ? ((tag >> 2) & 0x7) + 4 : (tag >> 2) + 1;
    }
    if (ip + esize > n) return SR_ERR_TRUNCATED;
    ip += esize;
    op += outbytes;
    // Fragment boundary: output hit a 64 KB multiple (or stream end).
    if (op % kFrag == 0 || ip >= n) {
      if (frag >= max_frags) return SR_ERR_CAPACITY;
      if (op - frag_op > kFrag) return SR_ERR_BAD_OFFSET;  // giant element
      comp_off[frag] = static_cast<uint32_t>(frag_ip);
      out_len[frag] = static_cast<uint32_t>(op - frag_op);
      frag++;
      frag_ip = ip;
      frag_op = op;
    } else if (op / kFrag != (op - outbytes) / kFrag) {
      return SR_ERR_BAD_OFFSET;  // element straddles a fragment boundary
    }
  }
  if (op != expected_out) return SR_ERR_LENGTH_MISMATCH;
  *num_frags = static_cast<uint32_t>(frag);
  return SR_OK;
}

}  // extern "C"

// ---- Framing format (framing_format.txt): CRC-32C + chunk layer ----

namespace {

struct Crc32cTables {
  uint32_t t[8][256];
  Crc32cTables() {
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t c = i;
      for (int k = 0; k < 8; k++)
        c = (c & 1) ? (c >> 1) ^ 0x82f63b78u : c >> 1;
      t[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; i++)
      for (int j = 1; j < 8; j++)
        t[j][i] = (t[j - 1][i] >> 8) ^ t[0][t[j - 1][i] & 0xff];
  }
};
const Crc32cTables kCrc;

inline uint32_t MaskCrc(uint32_t c) {
  return ((c >> 15) | (c << 17)) + 0xa282ead8u;
}

inline void Store32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }

constexpr uint8_t kStreamId[10] = {0xff, 0x06, 0x00, 0x00,
                                   's',  'N',  'a',  'P',  'p', 'Y'};

}  // namespace

extern "C" {

uint32_t sr_crc32c(const uint8_t* in, size_t n) {
  uint32_t c = 0xffffffffu;
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {  // slice-by-8
    uint32_t lo = Load32(in + i) ^ c;
    uint32_t hi = Load32(in + i + 4);
    c = kCrc.t[7][lo & 0xff] ^ kCrc.t[6][(lo >> 8) & 0xff] ^
        kCrc.t[5][(lo >> 16) & 0xff] ^ kCrc.t[4][lo >> 24] ^
        kCrc.t[3][hi & 0xff] ^ kCrc.t[2][(hi >> 8) & 0xff] ^
        kCrc.t[1][(hi >> 16) & 0xff] ^ kCrc.t[0][hi >> 24];
  }
  for (; i < n; i++) c = (c >> 8) ^ kCrc.t[0][(c ^ in[i]) & 0xff];
  return c ^ 0xffffffffu;
}

size_t sr_max_framed_length(size_t n) {
  // Stream id + per-chunk (4-byte header + 4-byte CRC), all-uncompressed.
  return sizeof(kStreamId) + n + 8 * (n / kBlockSize + 1) + 8;
}

size_t sr_compress_framed(const uint8_t* in, size_t n, uint8_t* out,
                          int mode) {
  uint8_t* op = out;
  std::memcpy(op, kStreamId, sizeof(kStreamId));
  op += sizeof(kStreamId);
  std::vector<uint8_t> scratch(sr_max_compressed_length(kBlockSize));
  for (size_t start = 0; start < n || (n == 0 && start == 0);
       start += kBlockSize) {
    if (n == 0) break;  // empty input: stream id only
    const size_t blen = (n - start < kBlockSize) ? n - start : kBlockSize;
    const uint32_t crc = MaskCrc(sr_crc32c(in + start, blen));
    const size_t csize =
        sr_compress(in + start, blen, scratch.data(), mode);
    if (csize < blen) {  // compressed data chunk (type 0x00)
      op[0] = 0x00;
      const uint32_t len = static_cast<uint32_t>(csize + 4);
      op[1] = len & 0xff; op[2] = (len >> 8) & 0xff; op[3] = (len >> 16) & 0xff;
      Store32(op + 4, crc);
      std::memcpy(op + 8, scratch.data(), csize);
      op += 8 + csize;
    } else {  // uncompressed chunk (type 0x01)
      op[0] = 0x01;
      const uint32_t len = static_cast<uint32_t>(blen + 4);
      op[1] = len & 0xff; op[2] = (len >> 8) & 0xff; op[3] = (len >> 16) & 0xff;
      Store32(op + 4, crc);
      std::memcpy(op + 8, in + start, blen);
      op += 8 + blen;
    }
  }
  return static_cast<size_t>(op - out);
}

int sr_uncompress_framed(const uint8_t* in, size_t n, uint8_t* out,
                         size_t out_cap, uint64_t* out_len) {
  if (n < sizeof(kStreamId) ||
      std::memcmp(in, kStreamId, sizeof(kStreamId)) != 0)
    return SR_ERR_BAD_CHUNK;
  size_t ip = sizeof(kStreamId);
  uint64_t op = 0;
  std::vector<uint8_t> scratch(kBlockSize);
  while (ip < n) {
    if (ip + 4 > n) return SR_ERR_TRUNCATED;
    const uint8_t type = in[ip];
    const uint32_t len = in[ip + 1] | (in[ip + 2] << 8) | (in[ip + 3] << 16);
    ip += 4;
    if (ip + len > n) return SR_ERR_TRUNCATED;
    if (type == 0xff) {  // repeated stream identifier
      if (len != 6 || std::memcmp(in + ip, kStreamId + 4, 6) != 0)
        return SR_ERR_BAD_CHUNK;
    } else if (type == 0x00) {  // compressed data
      if (len < 4) return SR_ERR_BAD_CHUNK;
      const uint32_t want = Load32(in + ip);
      uint64_t ulen = 0;
      int rc = sr_uncompress(in + ip + 4, len - 4, scratch.data(),
                             scratch.size(), &ulen);
      if (rc != SR_OK) return rc;
      if (ulen > kBlockSize) return SR_ERR_BAD_CHUNK;
      if (MaskCrc(sr_crc32c(scratch.data(), ulen)) != want)
        return SR_ERR_CRC;
      if (op + ulen > out_cap) return SR_ERR_CAPACITY;
      std::memcpy(out + op, scratch.data(), ulen);
      op += ulen;
    } else if (type == 0x01) {  // uncompressed data
      if (len < 4 || len - 4 > kBlockSize) return SR_ERR_BAD_CHUNK;
      const uint32_t want = Load32(in + ip);
      if (MaskCrc(sr_crc32c(in + ip + 4, len - 4)) != want)
        return SR_ERR_CRC;
      if (op + (len - 4) > out_cap) return SR_ERR_CAPACITY;
      std::memcpy(out + op, in + ip + 4, len - 4);
      op += len - 4;
    } else if (type == 0xfe || type >= 0x80) {
      // padding / reserved skippable: ignore
    } else {
      return SR_ERR_BAD_CHUNK;  // 0x02-0x7f reserved unskippable
    }
    ip += len;
  }
  *out_len = op;
  return SR_OK;
}

}  // extern "C"
