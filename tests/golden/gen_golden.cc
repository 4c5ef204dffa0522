// Golden-data generator for quantization parity tests.
//
// Compiles against the READ-ONLY reference headers (not vendored here) and
// dumps, for each block quant format: the fp16 input bits, the raw quantized
// block bytes, and the float dequantization result.  The committed .bin
// outputs in tests/golden/data/ are what the python tests compare against;
// this program only needs re-running if the goldens are regenerated.
//
// Build (see tests/golden/README.md):
//   g++ -O2 -std=c++17 -I /root/reference/src -I /root/reference/3rd_party \
//       gen_golden.cc -o gen_golden && ./gen_golden data/
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include "common/quantization.h"

using namespace inferflow;
using std::string;
using std::vector;

static uint64_t g_state = 0x243F6A8885A308D3ULL;
static float NextFloat() {
  // xorshift64* — deterministic across platforms
  g_state ^= g_state >> 12;
  g_state ^= g_state << 25;
  g_state ^= g_state >> 27;
  uint64_t r = g_state * 0x2545F4914F6CDD1DULL;
  return ((r >> 11) * (1.0f / 9007199254740992.0f)) * 4.0f - 2.0f;
}

static void WriteFile(const string &path, const void *data, size_t bytes) {
  FILE *f = fopen(path.c_str(), "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
  fwrite(data, 1, bytes, f);
  fclose(f);
}

template <typename BlockType>
struct Harness {
  template <typename QuantFn, typename DequantFn>
  static void Run(const string &dir, const string &name, int n,
                  int capacity, QuantFn quant, DequantFn dequant) {
    vector<inferflow_fp16> src(n);
    for (int i = 0; i < n; i++) src[i] = (inferflow_fp16)NextFloat();

    int nb = n / capacity;
    vector<BlockType> blocks(nb);
    bool ok = quant(blocks.data(), nb, src.data(), n);
    if (!ok) { fprintf(stderr, "quant failed: %s\n", name.c_str()); exit(1); }

    vector<float> deq(n);
    for (int b = 0; b < nb; b++) dequant(deq.data() + b * capacity, &blocks[b]);

    WriteFile(dir + "/" + name + ".input.f16.bin", src.data(), n * 2);
    WriteFile(dir + "/" + name + ".blocks.bin", blocks.data(),
              nb * sizeof(BlockType));
    WriteFile(dir + "/" + name + ".dequant.f32.bin", deq.data(), n * 4);
    printf("%s: n=%d block_bytes=%zu\n", name.c_str(), n, sizeof(BlockType));
  }
};

int main(int argc, char **argv) {
  string dir = argc > 1 ? argv[1] : "data";
  const int N = 512;
  typedef inferflow_fp16 F16;

  Harness<BlockQ8_B32T1>::Run(dir, "Q8_B32T1", N, Q8B32_CAPACITY,
      [](BlockQ8_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q8_B32T1(b, nb, s, n); },
      [](float *t, const BlockQ8_B32T1 *b) {
        Quantization::DequantizeQ8_B32T1(t, b); });

  Harness<BlockQ8_B32T2>::Run(dir, "Q8_B32T2", N, Q8B32_CAPACITY,
      [](BlockQ8_B32T2 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q8_B32T2(b, nb, s, n); },
      [](float *t, const BlockQ8_B32T2 *b) {
        Quantization::DequantizeQ8_B32T2(t, b); });

  Harness<BlockQ6_B64T1>::Run(dir, "Q6_B64T1", N, Q6_B64_CAPACITY,
      [](BlockQ6_B64T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q6_B64T1(b, nb, s, n); },
      [](float *t, const BlockQ6_B64T1 *b) {
        Quantization::DequantizeQ6_B64T1(t, b); });

  Harness<BlockQ5_B64T1>::Run(dir, "Q5_B64T1", N, Q5_B64_CAPACITY,
      [](BlockQ5_B64T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q5_B64T1(b, nb, s, n); },
      [](float *t, const BlockQ5_B64T1 *b) {
        Quantization::DequantizeQ5_B64T1(t, b); });

  Harness<BlockQ5_B32T1>::Run(dir, "Q5_B32T1", N, Q5B32_CAPACITY,
      [](BlockQ5_B32T1 *b, int nb, const F16 *s, int n) {
        (void)nb; return Quantization::QuantizeQ5Row(b, s, n); },
      [](float *t, const BlockQ5_B32T1 *b) {
        Quantization::DequantizeQ5Block(t, b); });

  Harness<BlockQ4_B64T1>::Run(dir, "Q4_B64T1", N, Q4_B64_CAPACITY,
      [](BlockQ4_B64T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q4_B64T1(b, nb, s, n); },
      [](float *t, const BlockQ4_B64T1 *b) {
        Quantization::DequantizeQ4_B64T1(t, b); });

  Harness<BlockQ4_B32T1>::Run(dir, "Q4_B32T1A", N, Q4B32_CAPACITY,
      [](BlockQ4_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q4_B32T1A(b, nb, s, n); },
      [](float *t, const BlockQ4_B32T1 *b) {
        Quantization::DequantizeQ4_B32T1(t, b); });

  Harness<BlockQ4_B32T1>::Run(dir, "Q4_B32T1B", N, Q4B32_CAPACITY,
      [](BlockQ4_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q4_B32T1B(b, nb, s, n); },
      [](float *t, const BlockQ4_B32T1 *b) {
        Quantization::DequantizeQ4_B32T1(t, b); });

  Harness<BlockQ4_B16>::Run(dir, "Q4_B16", N, Q4B16_CAPACITY,
      [](BlockQ4_B16 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q4B16(b, nb, s, n); },
      [](float *t, const BlockQ4_B16 *b) {
        Quantization::DequantizeQ4_B16(t, b); });

  Harness<BlockQ3H_B64T1>::Run(dir, "Q3H_B64T1", N, Q3H_B64_CAPACITY,
      [](BlockQ3H_B64T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q3H_B64T1(b, nb, s, n); },
      [](float *t, const BlockQ3H_B64T1 *b) {
        Quantization::DequantizeQ3H_B64T1(t, b); });

  Harness<BlockQ3_B32T1>::Run(dir, "Q3_B32T1A", N, Q3B32_CAPACITY,
      [](BlockQ3_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q3_B32T1A(b, nb, s, n); },
      [](float *t, const BlockQ3_B32T1 *b) {
        Quantization::DequantizeQ3_B32T1(t, b); });

  Harness<BlockQ3_B32T1>::Run(dir, "Q3_B32T1B", N, Q3B32_CAPACITY,
      [](BlockQ3_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q3_B32T1B(b, nb, s, n); },
      [](float *t, const BlockQ3_B32T1 *b) {
        Quantization::DequantizeQ3_B32T1(t, b); });

  Harness<BlockQ2_B32T1>::Run(dir, "Q2_B32T1A", N, Q2B32_CAPACITY,
      [](BlockQ2_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q2_B32T1A(b, nb, s, n); },
      [](float *t, const BlockQ2_B32T1 *b) {
        Quantization::DequantizeQ2_B32T1(t, b); });

  Harness<BlockQ2_B32T1>::Run(dir, "Q2_B32T1B", N, Q2B32_CAPACITY,
      [](BlockQ2_B32T1 *b, int nb, const F16 *s, int n) {
        return Quantization::QuantizeRow_Q2_B32T1B(b, nb, s, n); },
      [](float *t, const BlockQ2_B32T1 *b) {
        Quantization::DequantizeQ2_B32T1(t, b); });

  return 0;
}
