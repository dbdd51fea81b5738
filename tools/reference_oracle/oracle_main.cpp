// CLI: decode a .brotlig container with the REFERENCE decoder.
// usage: reference_oracle <in.brotlig> <out.bin>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "BrotliG.h"
#include "BrotligDecoder.h"

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s in.brotlig out.bin\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) return 2;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> in(sz + 16, 0);  // slack for 64-bit loads
  if (std::fread(in.data(), 1, sz, f) != (size_t)sz) return 2;
  std::fclose(f);

  uint32_t out_size = BrotliG::DecompressedSize(in.data());
  std::vector<uint8_t> out(out_size ? out_size : 1);
  uint32_t got = out_size;
  BROTLIG_ERROR rc = BrotliG::DecodeCPU((uint32_t)sz, in.data(), &got,
                                        out.data(), nullptr);
  if (rc != BROTLIG_OK) {
    std::fprintf(stderr, "decode error %d\n", (int)rc);
    return 1;
  }
  FILE* g = std::fopen(argv[2], "wb");
  std::fwrite(out.data(), 1, got, g);
  std::fclose(g);
  return 0;
}
