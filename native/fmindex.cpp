// Suffix-array exact substring locator for DNA sequences.
//
// Native counterpart of the reference's vendored C++ FM-index
// (reference: external/fm-index.cpp, SDSL csa_wt over the true assembly,
// used by check-results for exact contig anchoring, checkResults.d:513).
// Same role, self-contained implementation: SA-IS suffix array
// construction (linear time) + binary-search locate.  Exposed as a C ABI
// for ctypes (pybind11 is not available in this image).
//
// Build: make -C native   (produces libdentistnative.so)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// SA-IS: linear-time suffix array construction.
// s: values in [0, K); out sa of length n.
void sais(const int32_t* s, int32_t* sa, int32_t n, int32_t K,
          std::vector<int32_t>& workspace) {
  if (n == 0) return;
  if (n == 1) { sa[0] = 0; return; }

  std::vector<uint8_t> t(n);  // type: 1 = S, 0 = L
  t[n - 1] = 1;
  for (int32_t i = n - 2; i >= 0; --i)
    t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  auto is_lms = [&](int32_t i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<int32_t> bkt(K + 1);
  auto get_buckets = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int32_t i = 0; i < n; ++i) ++bkt[s[i]];
    int32_t sum = 0;
    for (int32_t k = 0; k <= K; ++k) {
      sum += bkt[k];
      bkt[k] = end ? sum : sum - bkt[k];
    }
  };

  auto induce = [&](const std::vector<int32_t>& lms) {
    std::fill(sa, sa + n, -1);
    get_buckets(true);
    for (int32_t i = (int32_t)lms.size() - 1; i >= 0; --i)
      sa[--bkt[s[lms[i]]]] = lms[i];
    get_buckets(false);
    for (int32_t i = 0; i < n; ++i) {
      int32_t j = sa[i] - 1;
      if (j >= 0 && !t[j]) sa[bkt[s[j]]++] = j;
    }
    get_buckets(true);
    for (int32_t i = n - 1; i >= 0; --i) {
      int32_t j = sa[i] - 1;
      if (j >= 0 && t[j]) sa[--bkt[s[j]]] = j;
    }
  };

  std::vector<int32_t> lms;
  for (int32_t i = 1; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);
  induce(lms);

  // name LMS substrings
  std::vector<int32_t> name(n, -1);
  int32_t n_names = 0, prev = -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t pos = sa[i];
    if (pos <= 0 || !is_lms(pos)) continue;
    if (prev >= 0) {
      bool same = true;
      for (int32_t d = 0;; ++d) {
        if (s[prev + d] != s[pos + d] || t[prev + d] != t[pos + d]) { same = false; break; }
        if (d > 0 && (is_lms(prev + d) || is_lms(pos + d))) {
          same = same && is_lms(prev + d) && is_lms(pos + d);
          break;
        }
      }
      if (!same) ++n_names;
    }
    name[pos] = n_names;
    if (prev < 0) name[pos] = n_names;  // first LMS gets 0
    prev = pos;
  }

  std::vector<int32_t> s1(lms.size());
  for (size_t i = 0; i < lms.size(); ++i) s1[i] = name[lms[i]];
  std::vector<int32_t> sa1(lms.size());
  if ((int32_t)lms.size() > 0 && n_names + 1 < (int32_t)lms.size()) {
    sais(s1.data(), sa1.data(), (int32_t)s1.size(), n_names + 1, workspace);
  } else {
    for (size_t i = 0; i < s1.size(); ++i) sa1[s1[i]] = (int32_t)i;
  }
  std::vector<int32_t> lms_sorted(lms.size());
  for (size_t i = 0; i < lms.size(); ++i) lms_sorted[i] = lms[sa1[i]];
  induce(lms_sorted);
}

struct Index {
  std::vector<int32_t> text;  // codes 0..3 (+4 separator), terminated by 0-sentinel
  std::vector<int32_t> sa;
};

}  // namespace

extern "C" {

// Build an index over `n` bytes of 2-bit codes (values 0..4; 4 = separator).
// Returns an opaque handle.
void* dentist_sa_build(const uint8_t* codes, int64_t n) {
  Index* idx = new Index();
  idx->text.resize(n + 1);
  for (int64_t i = 0; i < n; ++i) idx->text[i] = codes[i] + 1;  // reserve 0
  idx->text[n] = 0;  // sentinel
  idx->sa.resize(n + 1);
  std::vector<int32_t> ws;
  sais(idx->text.data(), idx->sa.data(), (int32_t)(n + 1), 6, ws);
  return idx;
}

// Locate up to `max_out` exact occurrences of `pattern` (length m).
// Returns the total number of occurrences (may exceed max_out).
int64_t dentist_sa_locate(void* handle, const uint8_t* pattern, int64_t m,
                          int64_t* out, int64_t max_out) {
  Index* idx = static_cast<Index*>(handle);
  const int32_t n = (int32_t)idx->sa.size();
  auto cmp_at = [&](int32_t pos) {
    // compare text[pos..] vs pattern: -1 text<pat, 0 prefix-match, 1 text>pat
    for (int64_t d = 0; d < m; ++d) {
      int32_t c = (pos + d < n - 1) ? idx->text[pos + d] : 0;
      int32_t p = pattern[d] + 1;
      if (c < p) return -1;
      if (c > p) return 1;
    }
    return 0;
  };
  // lower bound
  int32_t lo = 0, hi = n;
  while (lo < hi) {
    int32_t mid = lo + (hi - lo) / 2;
    if (cmp_at(idx->sa[mid]) < 0) lo = mid + 1; else hi = mid;
  }
  int32_t begin = lo;
  hi = n;
  while (lo < hi) {
    int32_t mid = lo + (hi - lo) / 2;
    if (cmp_at(idx->sa[mid]) <= 0) lo = mid + 1; else hi = mid;
  }
  int64_t count = lo - begin;
  int64_t emit = count < max_out ? count : max_out;
  for (int64_t i = 0; i < emit; ++i) out[i] = idx->sa[begin + i];
  return count;
}

void dentist_sa_free(void* handle) { delete static_cast<Index*>(handle); }

// Fast 2-bit packing: 4 codes per byte, first base in the HIGH bits of each
// byte, the Dazzler .bps layout (DAZZ_DB Compress_Read), so packed arrays
// diff cleanly against reference-produced .bps files.
void dentist_pack_2bit(const uint8_t* codes, int64_t n, uint8_t* out) {
  int64_t nb = (n + 3) / 4;
  int64_t full = n / 4;
  // word-wise: 4 codes per 32-bit load (little-endian); auto-vectorizes
  for (int64_t b = 0; b < full; ++b) {
    uint32_t x;
    std::memcpy(&x, codes + 4 * b, 4);
    out[b] = (uint8_t)(((x & 3u) << 6) | (((x >> 8) & 3u) << 4) |
                       (((x >> 16) & 3u) << 2) | ((x >> 24) & 3u));
  }
  if (full < nb) {
    out[full] = 0;
    for (int64_t i = 4 * full; i < n; ++i)
      out[i >> 2] |= (codes[i] & 0x3) << ((3 - (i & 0x3)) << 1);
  }
}

void dentist_unpack_2bit(const uint8_t* packed, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = (packed[i >> 2] >> ((3 - (i & 0x3)) << 1)) & 0x3;
}

}  // extern "C"
