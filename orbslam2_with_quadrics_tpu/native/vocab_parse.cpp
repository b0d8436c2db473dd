// Fast parser for the DBoW2 text vocabulary format.
//
// TPU-native counterpart of the reference's slowest init step
// (TemplatedVocabulary::loadFromTextFile, reference
// Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338-1422, invoked at
// src/System.cc:64-71): the standard ORBvoc.txt is ~140 MB / ~1M lines;
// iostream-based parsing takes ~10 s in the reference. This reads the file
// in one I/O pass and scans digits with strtol/strtod into flat arrays the
// Python side reshapes — no per-line stringstreams.
//
// Format (one node per line after the "k L scoring weighting" header):
//   parent_id is_leaf d0 .. d31 weight

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct FileBuf {
  char* data = nullptr;
  long size = 0;
  bool read(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    data = static_cast<char*>(std::malloc(size + 1));
    if (!data || std::fread(data, 1, size, f) != static_cast<size_t>(size)) {
      std::fclose(f);
      std::free(data);
      data = nullptr;
      return false;
    }
    data[size] = '\0';
    std::fclose(f);
    return true;
  }
  ~FileBuf() { std::free(data); }
};

}  // namespace

extern "C" {

// First pass: header + node count. Returns node count (>=0) or -1 on error.
// header4 receives {k, L, scoring, weighting}.
long slam_vocab_scan(const char* path, int* header4) {
  FileBuf fb;
  if (!fb.read(path)) return -1;
  char* p = fb.data;
  for (int i = 0; i < 4; ++i) header4[i] = static_cast<int>(std::strtol(p, &p, 10));
  // count remaining non-empty lines by counting value groups of 35
  long values = 0;
  while (*p) {
    while (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t') ++p;
    if (!*p) break;
    while (*p && *p != ' ' && *p != '\n' && *p != '\r' && *p != '\t') ++p;
    ++values;
  }
  if (values % 35 != 0) return -1;
  return values / 35;
}

// Second pass: fill caller-allocated arrays (parent [M] int32,
// is_leaf [M] uint8, desc [M*32] uint8, weight [M] double).
// Returns number of nodes parsed, or -1 on error.
long slam_vocab_parse(const char* path, long max_nodes, int* parent,
                      unsigned char* is_leaf, unsigned char* desc,
                      double* weight) {
  FileBuf fb;
  if (!fb.read(path)) return -1;
  char* p = fb.data;
  int hdr;
  for (int i = 0; i < 4; ++i) hdr = static_cast<int>(std::strtol(p, &p, 10));
  (void)hdr;
  long n = 0;
  while (n < max_nodes) {
    while (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t') ++p;
    if (!*p) break;
    parent[n] = static_cast<int>(std::strtol(p, &p, 10));
    is_leaf[n] = static_cast<unsigned char>(std::strtol(p, &p, 10));
    unsigned char* d = desc + n * 32;
    for (int i = 0; i < 32; ++i)
      d[i] = static_cast<unsigned char>(std::strtol(p, &p, 10));
    weight[n] = std::strtod(p, &p);
    ++n;
  }
  return n;
}

}  // extern "C"
