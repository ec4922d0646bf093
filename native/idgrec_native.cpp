// Native host-side data kernels for idgrec_tpu.
//
// The reference parses its train/test files with a per-line Python
// loop (reference utility/utility_data/data_loader.py:48-70); at
// yelp2018 scale (1.24M interactions) that is seconds of host time per
// run. This library provides the host-side hot paths as C++:
//
//   * ratings-file parsing (mmap + single-pass integer scan) for the
//     reference format: one line per user, "uid iid iid ...";
//   * CSR construction (counting sort by user);
//   * dense int8 count-matrix fill (the dense/fused propagation
//     backends' [U, I] operand);
//   * row-major bit-packing (the bitpack backend's operand).
//
// Exposed as a plain C ABI consumed via ctypes
// (idgrec_tpu/data/native.py); every entry point is also implemented
// in Python/numpy as a fallback, and tests assert equivalence.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open_file(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      fd = -1;
      return st.st_size == 0;  // empty file is valid
    }
    size = static_cast<size_t>(st.st_size);
    data = static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    if (data == MAP_FAILED) {
      data = nullptr;
      ::close(fd);
      fd = -1;
      return false;
    }
    return true;
  }

  ~Mapped() {
    if (data != nullptr) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// Scan the reference ratings format. For each line the FIRST integer
// is the user id, the rest are item ids. Emits (user, item) per pair.
// Returns the number of pairs, or -1 on open failure. When users/items
// are null, only counts (first pass).
int64_t scan_ratings(const char* path, int64_t* users, int64_t* items) {
  Mapped m;
  if (!m.open_file(path)) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  int64_t count = 0;
  while (p < end) {
    // one line
    int64_t user = -1;
    bool first = true;
    while (p < end && *p != '\n') {
      // skip non-digit separators (space, \r, tabs)
      while (p < end && (*p == ' ' || *p == '\r' || *p == '\t')) ++p;
      if (p >= end || *p == '\n') break;
      int64_t v = 0;
      bool got = false;
      while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
        got = true;
      }
      if (!got) {  // malformed character; skip it
        ++p;
        continue;
      }
      if (first) {
        user = v;
        first = false;
      } else {
        if (users != nullptr) {
          users[count] = user;
          items[count] = v;
        }
        ++count;
      }
    }
    if (p < end) ++p;  // consume '\n'
  }
  return count;
}

}  // namespace

extern "C" {

// First pass: number of (user, item) pairs in the file; -1 if unreadable.
int64_t idg_count_ratings(const char* path) { return scan_ratings(path, nullptr, nullptr); }

// Second pass: fill caller-allocated users/items arrays (size from
// idg_count_ratings). Returns pairs written, -1 on failure.
int64_t idg_parse_ratings(const char* path, int64_t* users, int64_t* items) {
  return scan_ratings(path, users, items);
}

// Maximum ids seen (for num_users/num_items inference). Arrays may be
// empty; returns 0 and writes -1 maxima then.
void idg_max_ids(const int64_t* users, const int64_t* items, int64_t n,
                 int64_t* max_user, int64_t* max_item) {
  int64_t mu = -1, mi = -1;
  for (int64_t k = 0; k < n; ++k) {
    if (users[k] > mu) mu = users[k];
    if (items[k] > mi) mi = items[k];
  }
  *max_user = mu;
  *max_item = mi;
}

// Counting-sort CSR build: row_ptr [num_users+1], col_idx/vals [n].
// Duplicate (u, i) pairs are kept (summed later by the caller if
// needed) and columns within a row are sorted ascending.
void idg_build_csr(const int64_t* users, const int64_t* items, int64_t n,
                   int64_t num_users, int64_t* row_ptr, int32_t* col_idx,
                   float* vals) {
  memset(row_ptr, 0, sizeof(int64_t) * (num_users + 1));
  for (int64_t k = 0; k < n; ++k) ++row_ptr[users[k] + 1];
  for (int64_t u = 0; u < num_users; ++u) row_ptr[u + 1] += row_ptr[u];
  // stable fill (input is usually already grouped by user)
  int64_t* cursor = new int64_t[num_users];
  for (int64_t u = 0; u < num_users; ++u) cursor[u] = row_ptr[u];
  for (int64_t k = 0; k < n; ++k) {
    int64_t u = users[k];
    col_idx[cursor[u]] = static_cast<int32_t>(items[k]);
    vals[cursor[u]] = 1.0f;
    ++cursor[u];
  }
  // insertion-sort columns within each row (rows are short; input is
  // typically pre-sorted so this is near-linear)
  for (int64_t u = 0; u < num_users; ++u) {
    int64_t lo = row_ptr[u], hi = row_ptr[u + 1];
    for (int64_t a = lo + 1; a < hi; ++a) {
      int32_t c = col_idx[a];
      int64_t b = a;
      while (b > lo && col_idx[b - 1] > c) {
        col_idx[b] = col_idx[b - 1];
        --b;
      }
      col_idx[b] = c;
    }
  }
  delete[] cursor;
}

// Dense int8 count matrix [num_users, num_items] from CSR (saturates
// at 127). out must be zero-initialised by the caller.
void idg_fill_count_matrix(const int64_t* row_ptr, const int32_t* col_idx,
                           int64_t num_users, int64_t num_items, int8_t* out) {
  for (int64_t u = 0; u < num_users; ++u) {
    int8_t* row = out + u * num_items;
    for (int64_t k = row_ptr[u]; k < row_ptr[u + 1]; ++k) {
      int8_t& c = row[col_idx[k]];
      if (c < 127) ++c;
    }
  }
}

// Row-major bit packing: bit k of out[g, c] = (m[8g+k, c] != 0).
// m is int8 [rows, cols]; out is uint8 [rows_pad/8, cols_pad], zeroed
// by the caller; rows_pad/cols_pad are multiples of 8/1.
void idg_pack_rows(const int8_t* m, int64_t rows, int64_t cols,
                   int64_t cols_pad, uint8_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const int8_t* src = m + r * cols;
    uint8_t* dst = out + (r / 8) * cols_pad;
    const uint8_t bit = static_cast<uint8_t>(1u << (r % 8));
    for (int64_t c = 0; c < cols; ++c) {
      if (src[c] != 0) dst[c] |= bit;
    }
  }
}

}  // extern "C"
