// Native host-side runtime: periodic neighbor search + fixed-shape batch
// packing.
//
// The reference delegates these to native kernels in its dependencies
// (SURVEY.md §2.4): ASE's C neighbor_list / pymatgen's C-accelerated
// get_all_neighbors for the neighbor search, and PyG's C++-backed
// DataLoader/Batch collation for batching. This library is the TPU
// framework's in-repo equivalent, exposed to Python via ctypes
// (dostransformer_tpu/native/__init__.py). The algorithms mirror the NumPy
// reference implementations in data/neighbors.py and data/graph.py exactly —
// the Python versions remain behind the same call sites for differential
// testing and as a no-compiler fallback.
//
// Build: python -m dostransformer_tpu.native.build   (plain g++ -O3 -shared)

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// 3x3 inverse; rows of `cell` are lattice vectors. Returns false if singular.
bool invert3x3(const double* m, double* inv) {
  const double a = m[0], b = m[1], c = m[2];
  const double d = m[3], e = m[4], f = m[5];
  const double g = m[6], h = m[7], i = m[8];
  const double det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g);
  if (std::fabs(det) < 1e-300) return false;
  const double r = 1.0 / det;
  inv[0] = (e * i - f * h) * r;
  inv[1] = (c * h - b * i) * r;
  inv[2] = (b * f - c * e) * r;
  inv[3] = (f * g - d * i) * r;
  inv[4] = (a * i - c * g) * r;
  inv[5] = (c * d - a * f) * r;
  inv[6] = (d * h - e * g) * r;
  inv[7] = (b * g - a * h) * r;
  inv[8] = (a * e - b * d) * r;
  return true;
}

}  // namespace

extern "C" {

// Periodic neighbor search, ASE neighbor_list("ijS") semantics (pairs with
// |pos[j] + S@cell - pos[i]| < cutoff; self_interaction keeps (i,i,S=0)).
//
// Two-phase contract: call with src == nullptr to get the edge count, then
// with buffers of that size. Returns the edge count, or -1 on error.
int64_t dostpu_neighbor_list(const double* positions, int64_t n,
                             const double* cell,  // row-major 3x3
                             double cutoff, int self_interaction,
                             const uint8_t* pbc,  // [3] booleans
                             int64_t capacity, int64_t* src, int64_t* dst,
                             int64_t* shifts /* [capacity, 3] */) {
  double inv[9];
  if (!invert3x3(cell, inv)) return -1;

  // images needed per axis: ceil(cutoff * |column i of inv(cell)|)
  int64_t nmax[3];
  for (int i = 0; i < 3; ++i) {
    const double norm = std::sqrt(inv[0 + i] * inv[0 + i] +
                                  inv[3 + i] * inv[3 + i] +
                                  inv[6 + i] * inv[6 + i]);
    nmax[i] = pbc[i] ? static_cast<int64_t>(std::ceil(cutoff * norm)) : 0;
  }

  const double cutoff2 = cutoff * cutoff;
  int64_t count = 0;
  const bool fill = src != nullptr;

  for (int64_t sx = -nmax[0]; sx <= nmax[0]; ++sx) {
    for (int64_t sy = -nmax[1]; sy <= nmax[1]; ++sy) {
      for (int64_t sz = -nmax[2]; sz <= nmax[2]; ++sz) {
        const bool zero_shift = (sx == 0 && sy == 0 && sz == 0);
        const double ox = sx * cell[0] + sy * cell[3] + sz * cell[6];
        const double oy = sx * cell[1] + sy * cell[4] + sz * cell[7];
        const double oz = sx * cell[2] + sy * cell[5] + sz * cell[8];
        for (int64_t i = 0; i < n; ++i) {
          const double pix = positions[3 * i], piy = positions[3 * i + 1],
                       piz = positions[3 * i + 2];
          for (int64_t j = 0; j < n; ++j) {
            if (zero_shift && i == j && !self_interaction) continue;
            const double dx = positions[3 * j] + ox - pix;
            const double dy = positions[3 * j + 1] + oy - piy;
            const double dz = positions[3 * j + 2] + oz - piz;
            const double d2 = dx * dx + dy * dy + dz * dz;
            if (d2 < cutoff2) {
              if (fill) {
                if (count >= capacity) return -2;  // caller under-allocated
                src[count] = i;
                dst[count] = j;
                shifts[3 * count] = sx;
                shifts[3 * count + 1] = sy;
                shifts[3 * count + 2] = sz;
              }
              ++count;
            }
          }
        }
      }
    }
  }
  return count;
}

// Concat-based packers: pack variable-length per-sample 2-D arrays into one
// padded batch-leading buffer [B, R, C] (+ row mask). The collation engine
// behind GraphBatch (data/graph.py collate) — PyG DataLoader's C++-backed
// scatter-of-graphs, re-designed for fixed shapes. These take ONE
// concatenated buffer plus row offsets (both built by single NumPy C ops) —
// per-sample pointer marshalling was measured 0.6x vs the NumPy loop at
// 4096 samples, so the array-of-pointers variants were removed.
// offsets has n_samples+1 entries (cumulative rows, offsets[0] == 0).
//
// Returns 0 on success, -1 if any row count is negative or exceeds r —
// checked BEFORE any write (the Python wrapper raises; asserts there would
// strip under python -O and a bad count would memcpy past the buffer).
static bool rows_in_bounds(const int64_t* offsets, int64_t n_samples,
                           int64_t r) {
  for (int64_t s = 0; s < n_samples; ++s) {
    const int64_t nr = offsets[s + 1] - offsets[s];
    if (nr < 0 || nr > r) return false;
  }
  return true;
}

int64_t dostpu_pack_concat_f32(const float* concat, const int64_t* offsets,
                               int64_t n_samples, int64_t r, int64_t c,
                               float* out /* zeroed [B, R, C] */,
                               float* mask /* zeroed [B, R] or nullptr */) {
  if (!rows_in_bounds(offsets, n_samples, r)) return -1;
  for (int64_t s = 0; s < n_samples; ++s) {
    const int64_t nr = offsets[s + 1] - offsets[s];
    std::memcpy(out + s * r * c, concat + offsets[s] * c,
                sizeof(float) * nr * c);
    if (mask != nullptr) {
      for (int64_t k = 0; k < nr; ++k) mask[s * r + k] = 1.0f;
    }
  }
  return 0;
}

int64_t dostpu_pack_concat_i32(const int32_t* concat, const int64_t* offsets,
                               int64_t n_samples, int64_t r, int64_t c,
                               int32_t* out /* zeroed [B, R, C] */) {
  if (!rows_in_bounds(offsets, n_samples, r)) return -1;
  for (int64_t s = 0; s < n_samples; ++s) {
    const int64_t nr = offsets[s + 1] - offsets[s];
    std::memcpy(out + s * r * c, concat + offsets[s] * c,
                sizeof(int32_t) * nr * c);
  }
  return 0;
}

// Edge-index packing in one pass: concat is the [sum_e, 2] row-major
// concatenation of the per-sample edge_index TRANSPOSES (senders,
// receivers interleaved per edge); writes separate senders/receivers
// [B, R] buffers directly — no Python-side unpack slice.
int64_t dostpu_pack_edges_i32(const int32_t* concat, const int64_t* offsets,
                              int64_t n_samples, int64_t r,
                              int32_t* senders /* zeroed [B, R] */,
                              int32_t* receivers /* zeroed [B, R] */) {
  if (!rows_in_bounds(offsets, n_samples, r)) return -1;
  for (int64_t s = 0; s < n_samples; ++s) {
    const int64_t nr = offsets[s + 1] - offsets[s];
    const int32_t* row = concat + offsets[s] * 2;
    int32_t* se = senders + s * r;
    int32_t* re = receivers + s * r;
    for (int64_t k = 0; k < nr; ++k) {
      se[k] = row[2 * k];
      re[k] = row[2 * k + 1];
    }
  }
  return 0;
}

int64_t dostpu_abi_version() { return 3; }

}  // extern "C"
