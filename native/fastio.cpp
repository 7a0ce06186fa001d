// fastio — native host-side table/raster ingest for ransac_tpu.
//
// The reference delegates all parsing to Python's csv module row-by-row
// (/root/reference/main_v1.py:689-762).  At survey scale (hundreds of
// rows) that is fine; at framework scale (millions of candidate cameras /
// observation rows for distributed BA) host ingest becomes the bottleneck
// feeding the device, so the numeric path is native: a single-pass,
// zero-allocation-per-cell CSV parser exposed through a C ABI consumed via
// ctypes (no pybind11 dependency).  Python remains the fallback when the
// shared library has not been built.
//
// Build: make -C native   (produces native/libfastio.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Read the whole file; caller frees.  Returns nullptr on failure.
char* read_file(const char* path, long* size_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  char* buf = static_cast<char*>(std::malloc(size + 1));
  if (!buf) {
    std::fclose(f);
    return nullptr;
  }
  long got = static_cast<long>(std::fread(buf, 1, size, f));
  std::fclose(f);
  buf[got] = '\0';
  *size_out = got;
  return buf;
}

// True when a field is empty or whitespace-only — the row-skip predicate
// shared by both parsers (must match the Python fallback, which drops rows
// whose first cell is blank: io/tables.py).
int blank_field(const char* s, long len) {
  for (long i = 0; i < len; ++i)
    if (s[i] != ' ' && s[i] != '\t' && s[i] != '\r') return 0;
  return 1;
}

// Skip a UTF-8 BOM if present.
const char* skip_bom(const char* p) {
  if (static_cast<unsigned char>(p[0]) == 0xEF &&
      static_cast<unsigned char>(p[1]) == 0xBB &&
      static_cast<unsigned char>(p[2]) == 0xBF)
    return p + 3;
  return p;
}

// Parse one CSV field starting at *p; advances *p past the field and its
// trailing delimiter.  Sets (start, len) to the field bytes (no unquoting
// beyond stripping outer quotes).  Returns 1 if the field ended a row.
int next_field(const char** p, const char** start, long* len) {
  const char* s = *p;
  if (*s == '"') {
    ++s;
    *start = s;
    while (*s && !(*s == '"' && s[1] != '"')) ++s;
    *len = s - *start;
    if (*s == '"') ++s;
  } else {
    *start = s;
    while (*s && *s != ',' && *s != '\n' && *s != '\r') ++s;
    *len = s - *start;
  }
  int row_end = 0;
  if (*s == ',') {
    ++s;
  } else {
    while (*s == '\r') ++s;
    if (*s == '\n') {
      ++s;
      row_end = 1;
    } else if (*s == '\0') {
      row_end = 1;
    }
  }
  *p = s;
  return row_end;
}

}  // namespace

extern "C" {

// Count data rows (excluding the header).  Returns -1 on IO error.
long fastio_count_rows(const char* path) {
  long size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  long rows = 0;
  for (long i = 0; i < size; ++i)
    if (buf[i] == '\n') ++rows;
  if (size > 0 && buf[size - 1] != '\n') ++rows;
  std::free(buf);
  return rows > 0 ? rows - 1 : 0;  // minus header
}

// Parse selected numeric columns of a headered CSV.
//   col_idx[n_cols]: zero-based column indices to extract
//   out: row-major [max_rows, n_cols]; empty/invalid cells -> fill_value
// Returns number of data rows parsed, or -1 on error.
long fastio_read_numeric(const char* path, const int32_t* col_idx,
                         int32_t n_cols, double* out, long max_rows,
                         double fill_value) {
  long size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const char* p = skip_bom(buf);

  int32_t max_col = 0;
  for (int32_t c = 0; c < n_cols; ++c)
    if (col_idx[c] > max_col) max_col = col_idx[c];

  // Skip header row.
  {
    const char* s;
    long l;
    while (!next_field(&p, &s, &l)) {
    }
  }

  long row = 0;
  while (*p && row < max_rows) {
    // Parse the row once, remembering the fields we need.
    const char* starts[256];
    long lens[256];
    int32_t col = 0;
    int row_end = 0;
    while (!row_end) {
      const char* s;
      long l;
      row_end = next_field(&p, &s, &l);
      if (col <= max_col && col < 256) {
        starts[col] = s;
        lens[col] = l;
      }
      ++col;
    }
    if (blank_field(starts[0], lens[0])) continue;  // blank first cell
    for (int32_t c = 0; c < n_cols; ++c) {
      double v = fill_value;
      int32_t ci = col_idx[c];
      if (ci < col && ci < 256 && lens[ci] > 0) {
        char tmp[64];
        long l = lens[ci] < 63 ? lens[ci] : 63;
        std::memcpy(tmp, starts[ci], l);
        tmp[l] = '\0';
        char* end = nullptr;
        double parsed = std::strtod(tmp, &end);
        // Reject NaN (e.g. "nan-ish" prefixes) — the ingest contract is
        // empty/invalid -> fill_value.
        if (end && end != tmp && parsed == parsed) v = parsed;
      }
      out[row * n_cols + c] = v;
    }
    ++row;
  }
  std::free(buf);
  return row;
}

// Extract one string column into fixed-width utf-8 slots
// (out[max_rows * width], zero-padded).  Returns rows parsed or -1.
long fastio_read_strings(const char* path, int32_t col, char* out,
                         long max_rows, int32_t width) {
  long size = 0;
  char* buf = read_file(path, &size);
  if (!buf) return -1;
  const char* p = skip_bom(buf);
  {
    const char* s;
    long l;
    while (!next_field(&p, &s, &l)) {
    }
  }
  long row = 0;
  while (*p && row < max_rows) {
    int32_t c = 0;
    int row_end = 0;
    const char* first_s = nullptr;
    long first_l = 0;
    while (!row_end) {
      const char* s;
      long l;
      row_end = next_field(&p, &s, &l);
      if (c == 0) {
        first_s = s;
        first_l = l;
      }
      if (c == col) {
        long n = l < width - 1 ? l : width - 1;
        std::memcpy(out + row * width, s, n);
        std::memset(out + row * width + n, 0, width - n);
      }
      ++c;
    }
    if (blank_field(first_s, first_l)) continue;  // keep in sync w/ numeric
    ++row;
  }
  std::free(buf);
  return row;
}

}  // extern "C"
