// Canonical k-mer class construction for the canonical-class CHD
// (index/chd.py build_canonical_chd): class key = min(kmer, rc(kmer)); for
// each distinct class, the table row of the class key itself (fwd_row) and of
// its reverse complement (rc_row), -1 when that orientation is absent.
//
// Replaces the numpy pipeline (key64/rc vector ops + argsort + scatters),
// whose large uint64 temporaries hit pathological page-fault stalls on this
// VM (3-10 s per op at 20 M keys). Here: OpenMP key/rc pass, gnu parallel
// sort of (class, row) pairs, and one sequential grouping walk.

#include <algorithm>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define TQM_SORT __gnu_parallel::sort
#else
#define TQM_SORT std::sort
#endif

namespace {

static inline uint64_t rc_key64(uint64_t x, int32_t k) {
  const int nb = 2 * k;
  const uint64_t mask = (nb == 64) ? ~0ull : ((1ull << nb) - 1ull);
  x = (~x) & mask;
  x = ((x & 0x3333333333333333ull) << 2) | ((x >> 2) & 0x3333333333333333ull);
  x = ((x & 0x0f0f0f0f0f0f0f0full) << 4) | ((x >> 4) & 0x0f0f0f0f0f0f0f0full);
  x = ((x & 0x00ff00ff00ff00ffull) << 8) | ((x >> 8) & 0x00ff00ff00ff00ffull);
  x = ((x & 0x0000ffff0000ffffull) << 16) | ((x >> 16) & 0x0000ffff0000ffffull);
  x = (x << 32) | (x >> 32);
  return (nb < 64) ? (x >> (64 - nb)) : x;
}

struct ClsRow {
  uint64_t cls;
  int32_t row;
};

}  // namespace

// out_cls_hi/lo, out_fwd, out_rc must hold n entries; returns n_cls (<= n).
extern "C" int64_t tqm_canonical_classes(const uint32_t* hi, const uint32_t* lo,
                                         int64_t n, int32_t k,
                                         uint32_t* out_cls_hi, uint32_t* out_cls_lo,
                                         int32_t* out_fwd, int32_t* out_rc) {
  if (n <= 0 || k < 1 || k > 32) return -1;
  std::vector<ClsRow> v(n);
  std::vector<uint8_t> is_can(n);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; i++) {
    const uint64_t key = ((uint64_t)hi[i] << 32) | lo[i];
    const uint64_t rc = rc_key64(key, k);
    v[i].cls = key <= rc ? key : rc;
    v[i].row = (int32_t)i;
    is_can[i] = key <= rc;  // palindromes count as canonical
  }
  TQM_SORT(v.begin(), v.end(), [](const ClsRow& a, const ClsRow& b) {
    return a.cls < b.cls || (a.cls == b.cls && a.row < b.row);
  });
  int64_t ng = -1;
  uint64_t cur = 0;
  for (int64_t i = 0; i < n; i++) {
    if (ng < 0 || v[i].cls != cur) {
      cur = v[i].cls;
      ng++;
      out_cls_hi[ng] = (uint32_t)(cur >> 32);
      out_cls_lo[ng] = (uint32_t)cur;
      out_fwd[ng] = -1;
      out_rc[ng] = -1;
    }
    const int32_t r = v[i].row;
    if (is_can[r]) {
      out_fwd[ng] = r;
      // palindromic class (key == rc): the same row serves both orientations
      const uint64_t key = ((uint64_t)hi[r] << 32) | lo[r];
      if (rc_key64(key, k) == key) out_rc[ng] = r;
    } else {
      out_rc[ng] = r;
    }
  }
  return ng + 1;
}
