// Native forest core: Morton codes, neighbor lookup, face enumeration,
// 2:1 flag balancing.
//
// C++ replacement for the host-side t8code forest work of the reference
// (t8_forest_leaf_face_neighbors walk in
// t8gpu/mesh/mesh_manager.inl:332-481 — "the #1 CPU bottleneck", and the
// adapt/balance commits of mesh_manager.inl:207-212).  The Python layer
// (t8gpu_tpu/mesh/forest.py) mirrors these algorithms in NumPy and uses
// this library when built (t8gpu_tpu/mesh/_native.py); outputs are
// bit-identical by construction, enforced by tests/test_native.py.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)
// ABI: plain C functions over caller-allocated arrays (ctypes-friendly).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t part_bits2(uint64_t x) {
  x &= 0x00000000FFFFFFFFull;
  x = (x | (x << 16)) & 0x0000FFFF0000FFFFull;
  x = (x | (x << 8)) & 0x00FF00FF00FF00FFull;
  x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0Full;
  x = (x | (x << 2)) & 0x3333333333333333ull;
  x = (x | (x << 1)) & 0x5555555555555555ull;
  return x;
}

inline uint64_t part_bits3(uint64_t x) {
  x &= 0x00000000001FFFFFull;
  x = (x | (x << 32)) & 0x001F00000000FFFFull;
  x = (x | (x << 16)) & 0x001F0000FF0000FFull;
  x = (x | (x << 8)) & 0x100F00F00F00F00Full;
  x = (x | (x << 4)) & 0x10C30C30C30C30C3ull;
  x = (x | (x << 2)) & 0x1249249249249249ull;
  return x;
}

inline uint64_t morton(const int64_t* a, int dim) {
  uint64_t code = 0;
  if (dim == 2) {
    code = part_bits2((uint64_t)a[0]) | (part_bits2((uint64_t)a[1]) << 1);
  } else {
    code = part_bits3((uint64_t)a[0]) | (part_bits3((uint64_t)a[1]) << 1) |
           (part_bits3((uint64_t)a[2]) << 2);
  }
  return code;
}

// leaf containing the anchor-resolution point q (codes sorted ascending)
inline int64_t locate(const uint64_t* codes, int64_t n, uint64_t q) {
  int64_t j = (int64_t)(std::upper_bound(codes, codes + n, q) - codes) - 1;
  if (j < 0) j = 0;
  if (j >= n) j = n - 1;
  return j;
}

}  // namespace

extern "C" {

void t8f_morton_encode(const int64_t* anchor, int64_t n, int dim,
                       uint64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = morton(anchor + i * dim, dim);
}

// Face enumeration with the reference dedup rule
// (mesh_manager.inl:396-424): the finer side emits; equal level -> the
// lower-SFC-index side emits (>= keeps the self-periodic face).
// Outputs are caller-allocated with capacity 2*dim*n entries.
// counts[0] = interior faces, counts[1] = boundary faces.
void t8f_build_faces(const int64_t* anchor, const int8_t* level,
                     const uint64_t* codes, int64_t n, int dim, int L,
                     int periodic, int32_t* f_left, int32_t* f_right,
                     int8_t* f_axis, int8_t* f_sign, int8_t* f_ldiff,
                     int64_t* f_offset, int32_t* b_elem, int8_t* b_axis,
                     int8_t* b_sign, int64_t* counts) {
  const int64_t ext = (int64_t)1 << L;
  int64_t nf = 0, nb = 0;
  int64_t q[3];
  // iteration order matches the NumPy core: (axis, sign) outer, element
  // inner, so downstream padding/bucketing sees identical layouts.
  for (int axis = 0; axis < dim; ++axis) {
    for (int s = 0; s < 2; ++s) {
      const int sign = s == 0 ? 1 : -1;
      for (int64_t e = 0; e < n; ++e) {
        const int64_t size = (int64_t)1 << (L - level[e]);
        for (int d = 0; d < dim; ++d) q[d] = anchor[e * dim + d];
        q[axis] += sign > 0 ? size : -1;
        const bool outside = q[axis] < 0 || q[axis] >= ext;
        if (outside) {
          if (!periodic) {
            b_elem[nb] = (int32_t)e;
            b_axis[nb] = (int8_t)axis;
            b_sign[nb] = (int8_t)sign;
            ++nb;
            continue;
          }
          q[axis] = ((q[axis] % ext) + ext) % ext;
        }
        const int64_t j = locate(codes, n, morton(q, dim));
        const int8_t nb_lv = level[j];
        if (nb_lv < level[e] || (nb_lv == level[e] && j >= e)) {
          f_left[nf] = (int32_t)e;
          f_right[nf] = (int32_t)j;
          f_axis[nf] = (int8_t)axis;
          f_sign[nf] = (int8_t)sign;
          f_ldiff[nf] = (int8_t)(level[e] - nb_lv);
          for (int d = 0; d < dim; ++d)
            f_offset[nf * dim + d] = q[d] - anchor[j * dim + d];
          ++nf;
        }
      }
    }
  }
  counts[0] = nf;
  counts[1] = nb;
}

// 2:1 flag balancing (in place), mirroring Forest.balance_flags:
// fixpoint on tentative levels lv+flag over quarter-resolution face
// probes; cancel whole coarsening families first, then promote
// keep->refine.  Requires the input forest balanced.
void t8f_balance_flags(const int64_t* anchor, const int8_t* level,
                       const uint64_t* codes, int64_t n, int dim, int L,
                       int periodic, int8_t* flags) {
  const int64_t ext = (int64_t)1 << L;
  const int k = 1 << dim;

  // family heads: k consecutive elements, same level, same parent anchor,
  // head anchor == parent anchor (mirrors Forest.family_heads)
  std::vector<int64_t> heads;
  std::vector<int32_t> head_of(n, -1);
  for (int64_t e = 0; e + k <= n; ++e) {
    if (level[e] <= 0) continue;
    const int64_t size = (int64_t)1 << (L - level[e]);
    const int64_t pmask = ~(2 * size - 1);
    bool ok = true;
    for (int d = 0; d < dim && ok; ++d)
      ok = (anchor[e * dim + d] & pmask) == anchor[e * dim + d];
    for (int m = 1; m < k && ok; ++m) {
      if (level[e + m] != level[e]) { ok = false; break; }
      for (int d = 0; d < dim; ++d)
        if ((anchor[(e + m) * dim + d] & pmask) != anchor[e * dim + d]) {
          ok = false;
          break;
        }
    }
    if (ok) {
      heads.push_back(e);
      for (int m = 0; m < k; ++m) head_of[e + m] = (int32_t)heads.size() - 1;
    }
  }

  // sanitize stray coarsen flags: only complete families with every member
  // flagged -1 may coarsen (mirrors Forest.balance_flags / adapt())
  {
    std::vector<uint8_t> keep(n, 0);
    for (int64_t h = 0; h < (int64_t)heads.size(); ++h) {
      bool full = true;
      for (int m = 0; m < k; ++m)
        if (flags[heads[h] + m] != -1) full = false;
      if (full)
        for (int m = 0; m < k; ++m) keep[heads[h] + m] = 1;
    }
    for (int64_t e = 0; e < n; ++e)
      if (flags[e] == -1 && !keep[e]) flags[e] = 0;
  }

  std::vector<int8_t> tentative(n);
  const int n_probe_1d = 4;
  int64_t q[3];
  for (int iter = 0; iter < 64; ++iter) {
    for (int64_t e = 0; e < n; ++e) tentative[e] = (int8_t)(level[e] + flags[e]);
    bool any_cancel = false, any_refine = false;
    std::vector<uint8_t> viol(n, 0);
    for (int64_t e = 0; e < n; ++e) {
      const int64_t size = (int64_t)1 << (L - level[e]);
      const int64_t quarter = std::max<int64_t>(size / 4, 1);
      int8_t nb_max = -1;
      for (int axis = 0; axis < dim; ++axis) {
        for (int s = 0; s < 2; ++s) {
          const int sign = s == 0 ? 1 : -1;
          const int n_t = dim - 1;
          const int n_combo = n_t == 1 ? n_probe_1d : n_probe_1d * n_probe_1d;
          for (int c = 0; c < n_combo; ++c) {
            for (int d = 0; d < dim; ++d) q[d] = anchor[e * dim + d];
            q[axis] += sign > 0 ? size : -1;
            int cc = c, ti = 0;
            for (int d = 0; d < dim; ++d) {
              if (d == axis) continue;
              // match NumPy meshgrid(indexing="ij") combo order: first
              // tangent axis varies slowest
              int step = (ti == 0 && n_t == 2) ? (cc / n_probe_1d)
                                               : (cc % n_probe_1d);
              q[d] += step * quarter;
              ++ti;
            }
            bool valid = true;
            if (q[axis] < 0 || q[axis] >= ext) {
              if (!periodic) { valid = false; q[axis] = std::min(std::max(q[axis], (int64_t)0), ext - 1); }
              else q[axis] = ((q[axis] % ext) + ext) % ext;
            }
            if (!valid) continue;
            const int64_t j = locate(codes, n, morton(q, dim));
            if (tentative[j] > nb_max) nb_max = tentative[j];
          }
        }
      }
      if (nb_max > tentative[e] + 1) viol[e] = 1;
    }
    // cancel coarsening for families with a violating member
    for (int64_t h = 0; h < (int64_t)heads.size(); ++h) {
      const int64_t e0 = heads[h];
      bool cancel = false;
      for (int m = 0; m < k; ++m)
        if (viol[e0 + m] && flags[e0 + m] == -1) cancel = true;
      if (cancel) {
        for (int m = 0; m < k; ++m)
          if (flags[e0 + m] == -1) flags[e0 + m] = 0;
        any_cancel = true;
      }
    }
    if (any_cancel) continue;
    for (int64_t e = 0; e < n; ++e)
      if (viol[e] && flags[e] == 0) {
        flags[e] = 1;
        any_refine = true;
      }
    if (!any_refine) break;
  }
}

// Face-record matching for the non-brick forests (prism shell, planar
// tri, tet) — the hot core of PrismForest._match_records
// (t8gpu_tpu/mesh/shell_forest.py).  Replaces the reference's
// t8_forest_leaf_face_neighbors walk for non-brick element classes
// (mesh_manager.inl:332-481, "the #1 CPU bottleneck") with an O(N)
// hash match instead of the NumPy sort-based grouping.
//
// Inputs are the stacked face records as 4 int64 key columns (row-major
// [4, n]): own-granularity records and one-level-finer quarter records.
// Outputs reproduce the NumPy implementation's order EXACTLY:
//   eq pairs sorted by key (the lexsort-adjacency order), first = lower
//   stacked index; hang/rest in ascending own stacked index; hang
//   partner = the lowest-index sub row with an equal key.
// Returns 0, or -1 if any key is shared by >2 own rows (broken mesh).
int t8f_match_records(const int64_t* k, int64_t n_own,
                      const int64_t* sk, int64_t n_sub,
                      int64_t* eq_a, int64_t* eq_b, int64_t* n_eq,
                      int64_t* hang_own, int64_t* hang_sub, int64_t* n_hang,
                      int64_t* rest_idx, int64_t* n_rest) {
  const int64_t* k1 = k;
  const int64_t* k2 = k + n_own;
  const int64_t* g1 = k + 2 * n_own;
  const int64_t* g2 = k + 3 * n_own;
  const int64_t* s1 = sk;
  const int64_t* s2 = sk + n_sub;
  const int64_t* t1 = sk + 2 * n_sub;
  const int64_t* t2 = sk + 3 * n_sub;

  uint64_t cap = 16;
  while (cap < (uint64_t)(2 * n_own + 2)) cap <<= 1;
  const uint64_t mask = cap - 1;
  std::vector<int64_t> slot_idx(cap, -1);   // first own row with this key
  std::vector<int8_t> slot_n(cap, 0);       // 1 = single, 2 = paired
  std::vector<int64_t> slot_cand(cap, INT64_MAX);  // lowest matching sub row
  std::vector<uint64_t> own_slot(n_own);

  auto mix = [](uint64_t x) {
    x += 0x9e3779b97f4a7c15ull;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
    return x ^ (x >> 31);
  };
  auto hash4 = [&](int64_t a, int64_t b, int64_t c, int64_t d) {
    return mix((uint64_t)a ^ mix((uint64_t)b ^ mix((uint64_t)c ^
                                                   mix((uint64_t)d))));
  };

  // phase 1: insert own rows, detect equal-key pairs
  std::vector<std::pair<int64_t, int64_t>> pairs;
  pairs.reserve((size_t)(n_own / 2 + 1));
  for (int64_t i = 0; i < n_own; ++i) {
    uint64_t h = hash4(k1[i], k2[i], g1[i], g2[i]) & mask;
    for (;;) {
      int64_t j = slot_idx[h];
      if (j < 0) {
        slot_idx[h] = i;
        slot_n[h] = 1;
        break;
      }
      if (k1[j] == k1[i] && k2[j] == k2[i] && g1[j] == g1[i] &&
          g2[j] == g2[i]) {
        if (slot_n[h] >= 2) return -1;  // key shared by >2 leaves
        slot_n[h] = 2;
        pairs.emplace_back(j, i);       // first-seen = lower index
        break;
      }
      h = (h + 1) & mask;
    }
    own_slot[i] = h;
  }
  // eq pairs in global key-sorted order (keys unique per pair)
  std::sort(pairs.begin(), pairs.end(),
            [&](const std::pair<int64_t, int64_t>& x,
                const std::pair<int64_t, int64_t>& y) {
              const int64_t a = x.first, b = y.first;
              if (k1[a] != k1[b]) return k1[a] < k1[b];
              if (k2[a] != k2[b]) return k2[a] < k2[b];
              if (g1[a] != g1[b]) return g1[a] < g1[b];
              return g2[a] < g2[b];
            });
  *n_eq = (int64_t)pairs.size();
  for (size_t p = 0; p < pairs.size(); ++p) {
    eq_a[p] = pairs[p].first;
    eq_b[p] = pairs[p].second;
  }

  // phase 2: probe sub rows against unmatched own rows; ascending sub
  // index, first hit wins (== NumPy's stable-argsort + searchsorted)
  for (int64_t s = 0; s < n_sub; ++s) {
    uint64_t h = hash4(s1[s], s2[s], t1[s], t2[s]) & mask;
    for (;;) {
      int64_t j = slot_idx[h];
      if (j < 0) break;
      if (k1[j] == s1[s] && k2[j] == s2[s] && g1[j] == t1[s] &&
          g2[j] == t2[s]) {
        if (slot_n[h] == 1 && slot_cand[h] == INT64_MAX) slot_cand[h] = s;
        break;
      }
      h = (h + 1) & mask;
    }
  }

  // phase 3: emit hang / rest in ascending own stacked index
  int64_t nh = 0, nr = 0;
  for (int64_t i = 0; i < n_own; ++i) {
    const uint64_t h = own_slot[i];
    if (slot_n[h] != 1 || slot_idx[h] != i) continue;  // matched eq
    if (slot_cand[h] != INT64_MAX) {
      hang_own[nh] = i;
      hang_sub[nh] = slot_cand[h];
      ++nh;
    } else {
      rest_idx[nr++] = i;
    }
  }
  *n_hang = nh;
  *n_rest = nr;
  return 0;
}

}  // extern "C"
