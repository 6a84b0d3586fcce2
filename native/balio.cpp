// Fast BAL-file tokenizer for the TPU bundle-adjustment framework.
//
// Native-runtime counterpart of the reference's iostream-based parser
// (/root/reference/src/bundle_adjustment_large.cpp:59-108): instead of
// `ifstream >>` token-by-token extraction, the whole file is read in one
// syscall and scanned with strtod, which is ~20x faster on the larger BAL
// problems. Exposed to Python via a single C ABI entry point (ctypes).
//
// Build: make -C native   (produces libbalio.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Tokenize `path` into out[0..cap). Returns the number of tokens written,
// or -1 on I/O error, -2 if the token count exceeds `cap`.
long long balio_tokenize(const char* path, double* out, long long cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, 0, SEEK_END) != 0) { std::fclose(f); return -1; }
  long size = std::ftell(f);
  if (size < 0) { std::fclose(f); return -1; }
  std::rewind(f);
  std::string buf;
  buf.resize(static_cast<size_t>(size) + 1);
  size_t got = std::fread(&buf[0], 1, static_cast<size_t>(size), f);
  std::fclose(f);
  buf.resize(got);
  buf.push_back('\0');

  const char* p = buf.c_str();
  char* end = nullptr;
  long long n = 0;
  while (true) {
    double v = std::strtod(p, &end);
    if (end == p) {
      // Skip any non-numeric garbage byte and retry until end of buffer.
      if (*p == '\0') break;
      ++p;
      continue;
    }
    if (n >= cap) return -2;
    out[n++] = v;
    p = end;
  }
  return n;
}

}  // extern "C"
