// Fast Criteo TSV parser — the native data-plane component.
//
// TPU-native counterpart of the reference's native readers
// (core/kernels/data/parquet_dataset_ops.cc / CSV pipelines): the Python
// input path must sustain >10M examples/s to keep the TPU training engine
// fed (bench.py), which pure-Python csv parsing cannot.  This parser turns
// Criteo-format TSV bytes (label \t I1..I13 \t C1..C26 hex) into dense
// numpy-compatible buffers in one pass, multi-line, branch-light.
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image).
//
// Build: see deeprec_tpu/data/native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline const char* parse_int(const char* p, const char* end, int32_t* out,
                             bool* missing) {
  if (p >= end || *p == '\t' || *p == '\n') {
    *out = 0;
    *missing = true;
    return (p < end && *p != '\n') ? p + 1 : p;
  }
  *missing = false;
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  *out = static_cast<int32_t>(neg ? -v : v);
  return (p < end && *p != '\n') ? p + 1 : p;  // skip delimiter
}

inline const char* parse_hex32(const char* p, const char* end, uint32_t* out,
                               bool* missing) {
  if (p >= end || *p == '\t' || *p == '\n') {
    *out = 0;
    *missing = true;
    return (p < end && *p != '\n') ? p + 1 : p;
  }
  *missing = false;
  uint32_t v = 0;
  while (p < end) {
    char c = *p;
    uint32_t d;
    if (c >= '0' && c <= '9') d = c - '0';
    else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
    else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
    else break;
    v = (v << 4) | d;
    ++p;
  }
  *out = v;
  return (p < end && *p != '\n') ? p + 1 : p;
}

}  // namespace

extern "C" {

// Parse up to max_rows Criteo TSV rows from buf[0:len).
// Outputs:
//   labels   [max_rows]        float32
//   dense    [max_rows * 13]   float32  (log1p-normalized, missing -> 0)
//   cats     [max_rows * 26]   int32    (hex id, missing -> 0; masked to 31 bits)
// Returns number of rows parsed; *consumed = bytes consumed (whole lines only).
int64_t criteo_parse(const char* buf, int64_t len, int64_t max_rows,
                     float* labels, float* dense, int32_t* cats,
                     int64_t* consumed) {
  const char* p = buf;
  const char* end = buf + len;
  int64_t rows = 0;
  while (rows < max_rows) {
    // find end of line to ensure a complete row
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    if (nl == nullptr) break;
    // field-count validation (round-5 review): a blank or truncated line
    // (double newline, corrupted row) used to parse as a phantom label-0
    // example whose 26 categorical ids all hit id 0 — skewing the label
    // prior and training id 0 on garbage.  A well-formed row has exactly
    // 39 tabs (label + 13 dense + 26 cats); anything else is skipped.
    int tabs = 0;
    for (const char* t = p; t < nl; ++t) tabs += (*t == '\t');
    if (tabs != 39) {
      p = nl + 1;
      continue;
    }
    const char* q = p;
    bool miss;
    int32_t lab = 0;
    q = parse_int(q, nl + 1, &lab, &miss);
    labels[rows] = miss ? 0.f : static_cast<float>(lab);
    float* drow = dense + rows * 13;
    for (int i = 0; i < 13; ++i) {
      int32_t v;
      q = parse_int(q, nl + 1, &v, &miss);
      if (miss) {
        drow[i] = 0.f;
      } else {
        // log1p normalization (the standard Criteo transform); negatives -> 0
        float f = v > 0 ? static_cast<float>(v) : 0.f;
        drow[i] = __builtin_logf(1.f + f);
      }
    }
    int32_t* crow = cats + rows * 26;
    for (int i = 0; i < 26; ++i) {
      uint32_t v;
      q = parse_hex32(q, nl + 1, &v, &miss);
      crow[i] = static_cast<int32_t>(v & 0x7FFFFFFFu);
    }
    p = nl + 1;
    ++rows;
  }
  *consumed = p - buf;
  return rows;
}

// Multi-threaded variant: splits whole lines across nthreads workers.
// Output rows are written contiguously in file order.
int64_t criteo_parse_mt(const char* buf, int64_t len, int64_t max_rows,
                        int32_t nthreads,
                        float* labels, float* dense, int32_t* cats,
                        int64_t* consumed) {
  if (nthreads <= 1 || len < (1 << 16)) {
    return criteo_parse(buf, len, max_rows, labels, dense, cats, consumed);
  }
  // trim to the last complete line
  const char* end = buf + len;
  while (end > buf && end[-1] != '\n') --end;
  int64_t usable = end - buf;
  *consumed = usable;
  if (usable == 0) return 0;

  // chunk boundaries aligned to newlines
  std::vector<const char*> starts(nthreads + 1);
  starts[0] = buf;
  starts[nthreads] = end;
  for (int t = 1; t < nthreads; ++t) {
    const char* p = buf + usable * t / nthreads;
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    starts[t] = nl ? nl + 1 : end;
  }
  // count rows per chunk (parallel memchr scans)
  std::vector<int64_t> rows_in(nthreads, 0);
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; ++t) {
      ts.emplace_back([&, t] {
        const char* p = starts[t];
        const char* e = starts[t + 1];
        int64_t c = 0;
        while (p < e) {
          const char* nl = static_cast<const char*>(
              memchr(p, '\n', static_cast<size_t>(e - p)));
          if (!nl) break;
          ++c;
          p = nl + 1;
        }
        rows_in[t] = c;
      });
    }
    for (auto& th : ts) th.join();
  }
  std::vector<int64_t> offset(nthreads + 1, 0);
  for (int t = 0; t < nthreads; ++t) offset[t + 1] = offset[t] + rows_in[t];
  int64_t total = offset[nthreads] < max_rows ? offset[nthreads] : max_rows;

  // parallel parse into disjoint output ranges
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; ++t) {
      ts.emplace_back([&, t] {
        int64_t base = offset[t];
        if (base >= total) return;
        int64_t quota = (offset[t + 1] < total ? offset[t + 1] : total) - base;
        int64_t dummy;
        criteo_parse(starts[t],
                     static_cast<int64_t>(starts[t + 1] - starts[t]), quota,
                     labels + base, dense + base * 13, cats + base * 26,
                     &dummy);
      });
    }
    for (auto& th : ts) th.join();
  }
  if (total < offset[nthreads]) {
    // didn't fit: report consumption up to the last fully-parsed chunk line.
    // (callers size max_rows from len, so this path is cold)
    int64_t rows_done = 0;
    const char* p = buf;
    while (rows_done < total) {
      const char* nl = static_cast<const char*>(
          memchr(p, '\n', static_cast<size_t>(end - p)));
      if (!nl) break;
      ++rows_done;
      p = nl + 1;
    }
    *consumed = p - buf;
  }
  return total;
}

}  // extern "C"
