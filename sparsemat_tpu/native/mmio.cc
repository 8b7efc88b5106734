// Native MatrixMarket parser — the data-loader component of the runtime.
//
// The reference has no file I/O at all (SURVEY.md §5: "no MatrixMarket
// reader!"); the benchmark configs require loading SuiteSparse matrices, and
// numpy's loadtxt-based parsing is 20-50x slower than a strtod loop.  This
// reads coordinate-format files (real/integer/pattern ×
// general/symmetric/skew-symmetric), expanding symmetry on the fly.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <charconv>
#include <string>
#include <thread>
#include <vector>

namespace {

struct MtxResult {
  std::vector<int64_t> rows, cols;
  std::vector<double> vals;
  int64_t n_rows = 0, n_cols = 0;
  std::string error;
};

bool iprefix(const char* s, const char* prefix) {
  while (*prefix) {
    if (tolower(*s++) != *prefix++) return false;
  }
  return true;
}

MtxResult* parse(const char* path) {
  auto* res = new MtxResult();
  FILE* f = fopen(path, "rb");
  if (!f) {
    res->error = "cannot open file";
    return res;
  }
  char line[4096];
  if (!fgets(line, sizeof line, f)) {
    res->error = "empty file";
    fclose(f);
    return res;
  }
  if (!iprefix(line, "%%matrixmarket")) {
    res->error = "not a MatrixMarket file";
    fclose(f);
    return res;
  }
  bool pattern = strstr(line, "pattern") || strstr(line, "PATTERN");
  bool symmetric = strstr(line, "symmetric") || strstr(line, "SYMMETRIC");
  bool skew = strstr(line, "skew-symmetric") || strstr(line, "SKEW");
  bool coordinate = strstr(line, "coordinate") || strstr(line, "COORDINATE");
  bool complex_field = strstr(line, "complex") || strstr(line, "COMPLEX");
  if (!coordinate) {
    res->error = "only coordinate layout supported natively";
    fclose(f);
    return res;
  }
  // skip comments
  do {
    if (!fgets(line, sizeof line, f)) {
      res->error = "missing size line";
      fclose(f);
      return res;
    }
  } while (line[0] == '%');
  int64_t nr, nc, nnz;
  if (sscanf(line, "%ld %ld %ld", &nr, &nc, &nnz) != 3) {
    res->error = "bad size line";
    fclose(f);
    return res;
  }
  res->n_rows = nr;
  res->n_cols = nc;
  uint64_t reserve = symmetric || skew ? nnz * 2 : nnz;
  res->rows.reserve(reserve);
  res->cols.reserve(reserve);
  res->vals.reserve(reserve);

  // slurp the rest of the file for strtod-speed parsing
  long data_start = ftell(f);
  fseek(f, 0, SEEK_END);
  long end = ftell(f);
  fseek(f, data_start, SEEK_SET);
  std::vector<char> buf(end - data_start + 1);
  size_t got = fread(buf.data(), 1, end - data_start, f);
  buf[got] = '\0';
  fclose(f);

  char* p = buf.data();
  for (int64_t k = 0; k < nnz; ++k) {
    char* q;
    long i = strtol(p, &q, 10);
    if (q == p) {
      res->error = "truncated entry list";
      return res;
    }
    p = q;
    long j = strtol(p, &q, 10);
    p = q;
    double v = 1.0;
    if (!pattern) {
      v = strtod(p, &q);
      p = q;
      if (complex_field) (void)strtod(p, &q), p = q;  // drop imaginary part
    }
    --i;
    --j;
    res->rows.push_back(i);
    res->cols.push_back(j);
    res->vals.push_back(v);
    if ((symmetric || skew) && i != j) {
      res->rows.push_back(j);
      res->cols.push_back(i);
      res->vals.push_back(skew ? -v : v);
    }
  }
  return res;
}

}  // namespace

extern "C" {

void* smt_mtx_parse(const char* path) { return parse(path); }

// Write a coordinate/real/general MatrixMarket file (1-based indices).
// Returns 0 on success.  Formatting (snprintf %.Ng dominates, ~0.5 us/line)
// is parallelized across threads into per-chunk buffers written in order —
// the writer half of the data-loader runtime component (the reference has
// no file I/O at all, SURVEY.md §5).  ``digits``: significant digits (9
// round-trips float32 exactly, 17 for float64).
int smt_mtx_write(const char* path, int64_t n_rows, int64_t n_cols,
                  uint64_t nnz, const int64_t* rows, const int64_t* cols,
                  const double* vals, int32_t digits) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  setvbuf(f, nullptr, _IOFBF, 1 << 22);
  fprintf(f, "%%%%MatrixMarket matrix coordinate real general\n");
  fprintf(f, "%ld %ld %lu\n", (long)n_rows, (long)n_cols,
          (unsigned long)nnz);
  if (digits < 1 || digits > 17) digits = 17;
  unsigned nt = std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  uint64_t chunk = (nnz + nt - 1) / nt;
  std::vector<std::string> bufs(nt);
  std::vector<std::thread> workers;
  for (unsigned t = 0; t < nt; ++t) {
    workers.emplace_back([&, t]() {
      uint64_t lo = t * chunk, hi = std::min(nnz, (t + 1) * chunk);
      if (lo >= hi) return;
      std::string& out = bufs[t];
      out.reserve((hi - lo) * 28);
      // std::to_chars is ~10x snprintf — this loop is the save_mtx
      // bottleneck on the 2-core bench host
      char line[96];
      for (uint64_t k = lo; k < hi; ++k) {
        char* p = line;
        p = std::to_chars(p, line + sizeof line, rows[k] + 1).ptr;
        *p++ = ' ';
        p = std::to_chars(p, line + sizeof line, cols[k] + 1).ptr;
        *p++ = ' ';
        p = std::to_chars(p, line + sizeof line, vals[k],
                          std::chars_format::general, digits).ptr;
        *p++ = '\n';
        out.append(line, p - line);
      }
    });
  }
  for (auto& w : workers) w.join();
  for (auto& b : bufs) {
    if (!b.empty() && fwrite(b.data(), 1, b.size(), f) != b.size()) {
      fclose(f);
      return 2;
    }
  }
  return fclose(f) ? 3 : 0;
}

const char* smt_mtx_error(void* h) {
  auto* r = static_cast<MtxResult*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

uint64_t smt_mtx_nnz(void* h) { return static_cast<MtxResult*>(h)->rows.size(); }
int64_t smt_mtx_n_rows(void* h) { return static_cast<MtxResult*>(h)->n_rows; }
int64_t smt_mtx_n_cols(void* h) { return static_cast<MtxResult*>(h)->n_cols; }

void smt_mtx_export(void* h, int64_t* rows_out, int64_t* cols_out,
                    double* vals_out) {
  auto* r = static_cast<MtxResult*>(h);
  std::memcpy(rows_out, r->rows.data(), r->rows.size() * sizeof(int64_t));
  std::memcpy(cols_out, r->cols.data(), r->cols.size() * sizeof(int64_t));
  std::memcpy(vals_out, r->vals.data(), r->vals.size() * sizeof(double));
}

void smt_mtx_free(void* h) { delete static_cast<MtxResult*>(h); }

}  // extern "C"
