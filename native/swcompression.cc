// CLI golden harness: compress / decompress / round-trip files, with timing.
//
// Role parity with the reference's native software path:
//   * tests/swcompression.cc — snappy::Compress + snappy::Uncompress
//     round-trip checks
//   * workloads/snappy/overlay/root/compress.cc — the timed software
//     baseline (20 runs per input) behind sw_results.csv
//
// Usage:
//   swcompression roundtrip <file> [baseline|dense]
//   swcompression compress  <file> <out> [baseline|dense]
//   swcompression uncompress <file> <out>
//   swcompression bench     <file> [runs]          # CSV: name;length;ns;compressed-length
//
// Exit status 0 on success; non-zero plus a message on any failure.

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "snappy_ref.h"

namespace {

std::vector<uint8_t> ReadFile(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(2);
  }
  return std::vector<uint8_t>(std::istreambuf_iterator<char>(f),
                              std::istreambuf_iterator<char>());
}

void WriteFile(const char* path, const std::vector<uint8_t>& data) {
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char*>(data.data()),
          static_cast<std::streamsize>(data.size()));
}

int ModeArg(int argc, char** argv, int idx) {
  if (argc > idx && std::strcmp(argv[idx], "dense") == 0) return SR_MODE_DENSE;
  return SR_MODE_BASELINE;
}

std::vector<uint8_t> Compress(const std::vector<uint8_t>& in, int mode) {
  std::vector<uint8_t> out(sr_max_compressed_length(in.size()));
  const size_t clen = sr_compress(in.data(), in.size(), out.data(), mode);
  out.resize(clen);
  return out;
}

int Uncompress(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  uint64_t ulen = 0;
  if (int rc = sr_uncompressed_length(in.data(), in.size(), &ulen)) return rc;
  out->resize(ulen);
  uint64_t got = 0;
  return sr_uncompress(in.data(), in.size(), out->data(), out->size(), &got);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s {roundtrip|compress|uncompress|bench} <file> ...\n",
                 argv[0]);
    return 2;
  }
  const std::string cmd = argv[1];
  std::vector<uint8_t> input = ReadFile(argv[2]);

  if (cmd == "roundtrip") {
    const int mode = ModeArg(argc, argv, 3);
    std::vector<uint8_t> comp = Compress(input, mode);
    std::vector<uint8_t> back;
    if (int rc = Uncompress(comp, &back)) {
      std::fprintf(stderr, "uncompress error %d\n", rc);
      return 1;
    }
    if (back != input) {
      std::fprintf(stderr, "round-trip mismatch\n");
      return 1;
    }
    std::printf("%zu;%zu\n", input.size(), comp.size());
    return 0;
  }
  if (cmd == "compress") {
    if (argc < 4) return 2;
    WriteFile(argv[3], Compress(input, ModeArg(argc, argv, 4)));
    return 0;
  }
  if (cmd == "uncompress") {
    if (argc < 4) return 2;
    std::vector<uint8_t> out;
    if (int rc = Uncompress(input, &out)) {
      std::fprintf(stderr, "uncompress error %d\n", rc);
      return 1;
    }
    WriteFile(argv[3], out);
    return 0;
  }
  if (cmd == "bench") {
    const int runs = argc > 3 ? std::atoi(argv[3]) : 20;
    std::vector<uint8_t> comp;
    // Warmup + timed runs (compress.cc's 20-run scheme, ns instead of rdcycle).
    comp = Compress(input, SR_MODE_BASELINE);
    long long best = -1;
    for (int i = 0; i < runs; i++) {
      auto t0 = std::chrono::steady_clock::now();
      comp = Compress(input, SR_MODE_BASELINE);
      auto t1 = std::chrono::steady_clock::now();
      long long ns =
          std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0).count();
      if (best < 0 || ns < best) best = ns;
    }
    std::printf("%s;%zu;%lld;%zu\n", argv[2], input.size(), best, comp.size());
    return 0;
  }
  std::fprintf(stderr, "unknown command %s\n", cmd.c_str());
  return 2;
}
