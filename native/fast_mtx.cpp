// Fast MatrixMarket coordinate-body parser.
//
// Native counterpart of the reference's C parser stack (src/mmio.cpp NIST
// reader + the fscanf entry loop in src/sparse_matrix.cpp:50-62), redesigned
// for throughput: one read of the whole body, branch-light inline integer /
// float scanning, no per-line stdio. Exposed as a C ABI consumed from Python
// via ctypes (formats/native_io.py); the NumPy path remains the behavioural
// reference and fallback.
//
// Build: native/Makefile -> libfastmtx.so

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
    ++p;
  return p;
}

inline const char *parse_i32(const char *p, const char *end, int32_t *out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  int64_t v = 0;
  const char *start = p;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
  }
  if (p == start) return nullptr;
  *out = static_cast<int32_t>(neg ? -v : v);
  return p;
}

// Fast decimal float: mantissa/exponent scan; falls back to strtod for
// anything unusual (hex, inf, nan) to stay bit-compatible with libc.
inline const char *parse_f64(const char *p, const char *end, double *out) {
  p = skip_ws(p, end);
  const char *start = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  int64_t mant = 0;
  int digits = 0, frac = 0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9' && digits < 18) {
    mant = mant * 10 + (*p - '0');
    ++digits;
    ++p;
    any = true;
  }
  if (digits >= 18) {  // precision edge: defer to strtod
    char *e;
    *out = strtod(start, &e);
    return e > start ? e : nullptr;
  }
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') {
      if (digits < 18) {
        mant = mant * 10 + (*p - '0');
        ++digits;
        ++frac;
      }
      ++p;
      any = true;
    }
  }
  if (!any) return nullptr;
  int exp10 = 0;
  if (p < end && (*p == 'e' || *p == 'E' || *p == 'd' || *p == 'D')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) {
      eneg = (*p == '-');
      ++p;
    }
    int ev = 0;
    const char *estart = p;
    while (p < end && *p >= '0' && *p <= '9') {
      ev = ev * 10 + (*p - '0');
      ++p;
    }
    if (p == estart) return nullptr;
    exp10 = eneg ? -ev : ev;
  }
  static const double pow10[] = {1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,
                                 1e7,  1e8,  1e9,  1e10, 1e11, 1e12, 1e13,
                                 1e14, 1e15, 1e16, 1e17, 1e18};
  int e = exp10 - frac;
  if (digits > 15 || e < -18 || e > 18) {
    // >15 digits: mant may exceed 2^53, so double(mant) already rounded
    // and the scale step would double-round (1 ulp off vs libc on %.17g
    // round-trip files). ≤15 digits + one exact pow10 op is the standard
    // single-rounding exactness criterion; defer the rest to strtod.
    // (strtod re-reads from `start`, sign included — do NOT re-negate.)
    char *endp;
    *out = strtod(start, &endp);
    return endp > start ? endp : nullptr;
  }
  double v = static_cast<double>(mant);
  v = e >= 0 ? v * pow10[e] : v / pow10[-e];
  *out = neg ? -v : v;
  return p;
}

}  // namespace

extern "C" {

// Parse `nnz` coordinate entries starting at byte `offset` of `path`.
// pattern != 0 -> two columns (values filled with 1.0).
// rows/cols are 0-based on output. Returns number parsed, or -errno-ish:
//   -1 file open/read failure, -2 malformed entry.
int64_t fastmtx_parse(const char *path, int64_t offset, int64_t nnz,
                      int pattern, int32_t *rows, int32_t *cols,
                      double *vals) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  if (offset > size) {
    fclose(f);
    return -1;
  }
  fseek(f, offset, SEEK_SET);
  long body = size - offset;
  char *buf = static_cast<char *>(malloc(body + 1));
  if (!buf) {
    fclose(f);
    return -1;
  }
  long got = static_cast<long>(fread(buf, 1, body, f));
  fclose(f);
  buf[got] = '\0';
  const char *p = buf;
  const char *end = buf + got;
  int64_t i = 0;
  for (; i < nnz; ++i) {
    int32_t r, c;
    p = parse_i32(p, end, &r);
    if (!p) break;
    p = parse_i32(p, end, &c);
    if (!p) break;
    double v = 1.0;
    if (!pattern) {
      p = parse_f64(p, end, &v);
      if (!p) break;
    }
    rows[i] = r - 1;
    cols[i] = c - 1;
    vals[i] = v;
  }
  free(buf);
  return i;
}

// Row-sorted CSR encode: counts + prefix sum + stable scatter.
// Native counterpart of calculate_ellpack's histogram+fill
// (src/sparse_matrix.cpp:72-120) without the byte packing.
void fastmtx_csr_encode(int64_t nnz, int32_t n_rows, const int32_t *rows,
                        const int32_t *cols, const double *vals,
                        int32_t *indptr /* n_rows+1 */,
                        int32_t *out_cols /* nnz */,
                        float *out_vals /* nnz */) {
  memset(indptr, 0, sizeof(int32_t) * (n_rows + 1));
  for (int64_t i = 0; i < nnz; ++i) ++indptr[rows[i] + 1];
  for (int32_t r = 0; r < n_rows; ++r) indptr[r + 1] += indptr[r];
  int32_t *cursor = static_cast<int32_t *>(
      malloc(sizeof(int32_t) * n_rows));
  memcpy(cursor, indptr, sizeof(int32_t) * n_rows);
  for (int64_t i = 0; i < nnz; ++i) {
    int32_t at = cursor[rows[i]]++;
    out_cols[at] = cols[i];
    out_vals[at] = static_cast<float>(vals[i]);
  }
  free(cursor);
}

}  // extern "C"

// ---------------------------------------------------------------- RCM
// Native reverse Cuthill-McKee over a symmetrized, de-duplicated,
// diagonal-free CSR pattern. Bit-identical ordering to the NumPy
// reference (formats/reorder.py rcm_permutation): seeds in stable
// (degree, id) order, George-Liu pseudo-peripheral refinement, and
// within a BFS level nodes grouped by first-discovering parent and
// sorted by (degree, id). The traversal is the Python-loop-bound part
// of RCM; everything around it stays vectorized NumPy.

namespace {

struct BfsScratch {
  std::vector<int32_t> stamp;   // epoch-stamped "seen" (no per-call memset)
  std::vector<int32_t> frontier, next;
  int32_t epoch = 0;
};

// Level BFS from seed avoiding `visited`; returns eccentricity and sets
// *cand to the min-(degree, id) node of the deepest level.
static int32_t bfs_ecc(int32_t seed, const int32_t *indptr,
                       const int32_t *indices, const int32_t *deg,
                       const uint8_t *visited, BfsScratch &s,
                       int32_t *cand) {
  const int32_t epoch = ++s.epoch;
  s.frontier.clear();
  s.frontier.push_back(seed);
  s.stamp[seed] = epoch;
  int32_t ecc = 0;
  for (;;) {
    s.next.clear();
    for (int32_t u : s.frontier) {
      for (int32_t j = indptr[u]; j < indptr[u + 1]; ++j) {
        int32_t v = indices[j];
        if (s.stamp[v] == epoch || visited[v]) continue;
        s.stamp[v] = epoch;
        s.next.push_back(v);
      }
    }
    if (s.next.empty()) break;
    s.frontier.swap(s.next);
    ++ecc;
  }
  int32_t best = s.frontier[0];
  for (int32_t u : s.frontier) {
    if (deg[u] < deg[best] || (deg[u] == deg[best] && u < best)) best = u;
  }
  *cand = best;
  return ecc;
}

}  // namespace

extern "C" {

// Symmetrized, de-duplicated, diagonal-free CSR pattern from COO edges:
// the RCM preprocessing step (NumPy reference: reorder._sym_pattern_csr).
// indices_out must have room for 2*nnz entries; returns the symmetrized
// count, or -1 on allocation failure. Counting-sort by row then per-row
// sort+unique — O(nnz log deg) instead of one global O(nnz log nnz) sort.
int64_t fastmtx_sym_pattern(int32_t n, int64_t nnz, const int32_t *rows,
                            const int32_t *cols, int32_t *indptr_out,
                            int32_t *indices_out) try {
  std::vector<int64_t> count(static_cast<size_t>(n) + 1, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    if (rows[i] == cols[i]) continue;
    ++count[rows[i] + 1];
    ++count[cols[i] + 1];
  }
  for (int32_t r = 0; r < n; ++r) count[r + 1] += count[r];
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  std::vector<int32_t> scratch(count[n]);
  for (int64_t i = 0; i < nnz; ++i) {
    if (rows[i] == cols[i]) continue;
    scratch[cursor[rows[i]]++] = cols[i];
    scratch[cursor[cols[i]]++] = rows[i];
  }
  int64_t out = 0;
  indptr_out[0] = 0;
  for (int32_t r = 0; r < n; ++r) {
    int32_t *b = scratch.data() + count[r];
    int32_t *e = scratch.data() + count[r + 1];
    std::sort(b, e);
    int32_t prev = -1;
    for (int32_t *p = b; p < e; ++p) {
      if (*p != prev) {
        indices_out[out++] = *p;
        prev = *p;
      }
    }
    indptr_out[r + 1] = static_cast<int32_t>(out);
  }
  return out;
} catch (...) {
  return -1;
}

// perm[i] = old index of new row i (new -> old), already reversed.
void fastmtx_rcm(int32_t n, const int32_t *indptr, const int32_t *indices,
                 int32_t *perm) {
  if (n <= 0) return;
  std::vector<int32_t> deg(n);
  for (int32_t i = 0; i < n; ++i) deg[i] = indptr[i + 1] - indptr[i];

  // stable counting sort of nodes by degree (np.argsort kind="stable")
  int32_t max_deg = 0;
  for (int32_t i = 0; i < n; ++i) max_deg = std::max(max_deg, deg[i]);
  std::vector<int32_t> count(max_deg + 2, 0), seeds(n);
  for (int32_t i = 0; i < n; ++i) ++count[deg[i] + 1];
  for (int32_t d = 0; d <= max_deg; ++d) count[d + 1] += count[d];
  for (int32_t i = 0; i < n; ++i) seeds[count[deg[i]]++] = i;

  std::vector<uint8_t> visited(n, 0);
  std::vector<int32_t> order;
  order.reserve(n);
  BfsScratch scratch;
  scratch.stamp.assign(n, 0);
  std::vector<int32_t> nbrs;

  for (int32_t si = 0; si < n; ++si) {
    int32_t s = seeds[si];
    if (visited[s]) continue;
    if (deg[s] > 0) {
      // George-Liu: re-seed at the deepest level's min-degree node until
      // the eccentricity stops growing (<= 4 sweeps) — mirrors the NumPy
      // _pseudo_peripheral control flow exactly.
      int32_t cand;
      int32_t ecc = bfs_ecc(s, indptr, indices, deg.data(), visited.data(),
                            scratch, &cand);
      for (int sweep = 0; sweep < 4; ++sweep) {
        int32_t ecc2 = bfs_ecc(s, indptr, indices, deg.data(),
                               visited.data(), scratch, &cand);
        if (ecc2 <= ecc && cand != s && ecc2 < ecc) break;
        int32_t cand2;
        int32_t ecc_c = bfs_ecc(cand, indptr, indices, deg.data(),
                                visited.data(), scratch, &cand2);
        if (ecc_c <= ecc2) break;
        s = cand;
        ecc = ecc_c;
      }
    }
    // Cuthill-McKee from s: queue order == level order grouped by
    // first-discovering parent; each parent's new neighbours append
    // sorted by (degree, id).
    visited[s] = 1;
    size_t head = order.size();
    order.push_back(s);
    while (head < order.size()) {
      int32_t u = order[head++];
      nbrs.clear();
      for (int32_t j = indptr[u]; j < indptr[u + 1]; ++j) {
        int32_t v = indices[j];
        if (!visited[v]) {
          visited[v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(), [&](int32_t a, int32_t b) {
        return deg[a] != deg[b] ? deg[a] < deg[b] : a < b;
      });
      order.insert(order.end(), nbrs.begin(), nbrs.end());
    }
  }
  for (int32_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

// Two-shelf interval packer for the sell2 builder — the native
// counterpart of ops/pallas_sell2.py:_twoshelf_pack, bit-identical by
// construction (same stable demand-desc order, hole policy, first-free
// ascending pile placement) so the Python and native paths produce the
// same layout. The packer is ~58% of sell2 build time in NumPy; the
// encode path is the reference's native layer (src/sparse_matrix.cpp
// cl_encode), so it is native here too.
//
// cnt:      nb x 128 per-(block, row-lane) pile heights, row-major
// bind0/1:  cap entries (cap = sum(max-lane demand) + max_push + 1),
//           per-sublane block id per shelf, -1 = uncovered
// way:      nb, shelf bit per block
// flat_sub: sum(cnt) sublane ids in (block, lane, pile-pos) order
// returns n_sub (sublanes used)
void sell2_twoshelf_pack(const int64_t *cnt, int64_t nb, int64_t max_push,
                         int64_t max_holes, int64_t hole_tries,
                         int64_t *bind0, int64_t *bind1, int8_t *way,
                         int64_t *flat_sub, int64_t *n_sub_out) {
  const int L = 128;
  std::vector<int64_t> demand(nb);
  int64_t dsum = 0;
  for (int64_t b = 0; b < nb; ++b) {
    int64_t d = 0;
    for (int l = 0; l < L; ++l) d = std::max(d, cnt[b * L + l]);
    demand[b] = d;
    dsum += d;
  }
  std::vector<int64_t> order;
  order.reserve(nb);
  for (int64_t b = 0; b < nb; ++b)
    if (demand[b] > 0) order.push_back(b);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return demand[a] > demand[b];
  });
  const int64_t cap = dsum + max_push + 1;
  std::vector<uint8_t> occ((size_t)cap * L, 0);
  std::fill(bind0, bind0 + cap, (int64_t)-1);
  std::fill(bind1, bind1 + cap, (int64_t)-1);
  std::fill(way, way + nb, (int8_t)0);
  std::vector<int64_t> pstart((size_t)nb * L + 1, 0);
  for (int64_t i = 0; i < nb * L; ++i) pstart[i + 1] = pstart[i] + cnt[i];

  auto fits = [&](int64_t o, int64_t d, const int64_t *h) {
    for (int l = 0; l < L; ++l) {
      if (!h[l]) continue;
      int64_t freec = 0;
      for (int64_t r = 0; r < d && freec < h[l]; ++r)
        freec += !occ[(size_t)(o + r) * L + l];
      if (freec < h[l]) return false;
    }
    return true;
  };
  auto place = [&](int64_t bi, int sh, int64_t o, int64_t d) {
    const int64_t *h = cnt + bi * L;
    for (int l = 0; l < L; ++l) {
      int64_t need = h[l];
      if (!need) continue;
      int64_t *dst = flat_sub + pstart[bi * L + l];
      for (int64_t r = 0; r < d && need; ++r) {
        uint8_t &c = occ[(size_t)(o + r) * L + l];
        if (!c) {
          c = 1;
          *dst++ = o + r;
          --need;
        }
      }
    }
    int64_t *bd = sh == 0 ? bind0 : bind1;
    for (int64_t r = o; r < o + d; ++r) bd[r] = bi;
    way[bi] = (int8_t)sh;
  };

  int64_t frontier[2] = {0, 0};
  std::vector<std::pair<int64_t, int64_t>> holes[2];
  for (int64_t bi : order) {
    const int64_t *h = cnt + bi * L;
    const int64_t d = demand[bi];
    bool placed = false;
    for (int sh = 0; sh < 2 && !placed; ++sh) {
      auto &hl = holes[sh];
      for (size_t k = 0; k < hl.size(); ++k) {
        const int64_t h0 = hl[k].first, h1 = hl[k].second;
        if (h1 - h0 < d) continue;
        int64_t o = h0, tries = 0;
        bool found = false;
        while (o + d <= h1 && tries < hole_tries) {
          if (fits(o, d, h)) {
            found = true;
            break;
          }
          ++o;
          ++tries;
        }
        if (!found) continue;
        place(bi, sh, o, d);
        std::vector<std::pair<int64_t, int64_t>> repl;
        if (o > h0) repl.push_back({h0, o});
        if (o + d < h1) repl.push_back({o + d, h1});
        hl.erase(hl.begin() + k);
        hl.insert(hl.begin() + k, repl.begin(), repl.end());
        placed = true;
        break;
      }
    }
    if (placed) continue;
    const int sh = frontier[0] <= frontier[1] ? 0 : 1;
    int64_t o = frontier[sh], pushes = 0;
    bool found = false;
    while (pushes < max_push) {
      if (fits(o, d, h)) {
        found = true;
        break;
      }
      ++o;
      ++pushes;
    }
    if (!found) o = std::max(frontier[0], frontier[1]);
    if (o > frontier[sh] && (int64_t)holes[sh].size() < max_holes)
      holes[sh].push_back({frontier[sh], o});
    place(bi, sh, o, d);
    frontier[sh] = o + d;
  }
  *n_sub_out = std::max(frontier[0], frontier[1]);
}

}  // extern "C"
