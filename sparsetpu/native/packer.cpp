// Native GStream pack engine: the repack hot loop.
//
// Re-implements the residue-matching pack (sparsetpu/pack/gather_stream.py)
// in C++, playing the role of the reference's host-side repack engine
// (csr_hw.cpp:190-318: create_block_matrix + generate_balanced_hw_submatrix,
// which the reference also keeps native for speed).  Differences from the
// NumPy fallback:
//   * per-chunk Hungarian (augmenting-path) matching instead of randomized
//     rounds -> a chunk is placed iff a perfect slot assignment exists;
//   * chunks flow into the first of K open tiles that accepts them instead
//     of fixed position -> higher fill, no global re-rounds;
//   * single pass, O(nnz * alpha) instead of NumPy's multi-round sweeps.
//
// Layout contract (must match gather_stream.py and the Pallas kernel):
//   chunk = q consecutive elements of one row (pads allowed), q = the
//     VF row-pad quantum in {1,2,4,8} (util.h:31-39);
//   tile  = 128*(8/q) chunks, plane-major: within-tile chunk w sits at
//     plane = w/128, lane = w%128, spanning sublanes [plane*q,(plane+1)*q);
//   cells[t][s][res] = x-stripe index for the element matched there;
//   route[t][s][l]   = res of the element at stream (s, l);
//   chunk_row is (n_tiles * 8/q, 128), plane-major per tile.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kChunk = 8;
constexpr int kLanes = 128;

struct Tile {
  // cell state: stripe claimed per (sublane, residue); -1 = free
  int32_t cell[kChunk][kLanes];
  float vals[kChunk][kLanes];
  int16_t cells16[kChunk][kLanes];
  int16_t route[kChunk][kLanes];
  int32_t chunk_row[kChunk][kLanes];  // [plane][lane]; planes = 8/q used
  int n_chunks = 0;

  void init(int32_t trap_row) {
    std::memset(cell, 0xff, sizeof(cell));        // -1
    std::memset(vals, 0, sizeof(vals));
    std::memset(cells16, 0, sizeof(cells16));
    std::memset(route, 0, sizeof(route));
    for (int p = 0; p < kChunk; ++p)
      for (int l = 0; l < kLanes; ++l) chunk_row[p][l] = trap_row;
    n_chunks = 0;
  }
};

struct PackState {
  std::vector<Tile*> done;
  std::vector<Tile*> open;
  int max_open;
  int32_t trap_row;

  ~PackState() {
    for (Tile* t : done) delete t;
    for (Tile* t : open) delete t;
  }
};

// Augmenting-path matching of one chunk's real elements onto the q slots
// of one plane.  cand(e, s) = slot s may serve element e: cell free or
// same stripe.  Slots are plane-relative; sub0 = plane * q.
struct ChunkMatcher {
  int q;
  int n_real;
  int res[kChunk];
  int32_t stripe[kChunk];
  int slot_of[kChunk];        // element -> slot
  int elem_of[kChunk];        // slot -> element (-1 free)
  bool visited[kChunk];
  const Tile* tile;
  int sub0;

  bool candidate(int e, int s) const {
    int32_t c = tile->cell[sub0 + s][res[e]];
    return c == -1 || c == stripe[e];
  }

  bool augment(int e) {
    for (int s = 0; s < q; ++s) {
      if (!candidate(e, s) || visited[s]) continue;
      visited[s] = true;
      if (elem_of[s] < 0 || augment(elem_of[s])) {
        elem_of[s] = e;
        slot_of[e] = s;
        return true;
      }
    }
    return false;
  }

  bool match(const Tile* t, int plane) {
    tile = t;
    sub0 = plane * q;
    for (int i = 0; i < kChunk; ++i) {
      slot_of[i] = -1;
      elem_of[i] = -1;
    }
    for (int e = 0; e < n_real; ++e) {
      for (int s = 0; s < q; ++s) visited[s] = false;
      if (!augment(e)) return false;
    }
    return true;
  }
};

void place_chunk(Tile* t, const ChunkMatcher& m, int pos,
                 const int32_t* prow, const int32_t* pcol, const float* pval,
                 const uint8_t* preal, int64_t base) {
  const int q = m.q;
  const int plane = pos / kLanes;
  const int lane = pos % kLanes;
  const int sub0 = plane * q;
  bool slot_used[kChunk] = {false};
  int e_real = 0;
  // reals first (matched), pads into leftover slots
  for (int k = 0; k < q; ++k) {
    if (!preal[base + k]) continue;
    int s = sub0 + m.slot_of[e_real];
    int r = m.res[e_real];
    t->cell[s][r] = m.stripe[e_real];
    t->cells16[s][r] = static_cast<int16_t>(m.stripe[e_real]);
    t->vals[s][lane] = pval[base + k];
    t->route[s][lane] = static_cast<int16_t>(r);
    slot_used[s - sub0] = true;
    ++e_real;
  }
  int free_s = 0;
  for (int k = 0; k < q; ++k) {
    if (preal[base + k]) continue;
    while (free_s < q && slot_used[free_s]) ++free_s;
    if (free_s < q) {
      t->vals[sub0 + free_s][lane] = 0.0f;
      t->route[sub0 + free_s][lane] = 0;
      slot_used[free_s] = true;
    }
  }
  t->chunk_row[plane][lane] = prow[base];
  t->n_chunks++;
}

}  // namespace

extern "C" {

// Pack one column block.  Elements are pre-padded (n_el % q == 0; each
// group of q is one row's chunk; preal marks real vs pad).  q is the
// row-pad quantum in {1,2,4,8}.  Returns the tile count and an opaque
// handle for copy-out, or -1 on error.
long long stpu_pack_block_q(const int32_t* prow, const int32_t* pcol,
                            const float* pval, const uint8_t* preal,
                            long long n_el, int32_t trap_row, int max_open,
                            int q, void** out_handle) {
  if (q < 1 || q > kChunk || kChunk % q != 0) return -1;
  if (n_el % q != 0 || max_open < 1) return -1;
  const int planes = kChunk / q;
  const int cap = planes * kLanes;  // chunks per tile
  auto* st = new PackState();
  st->max_open = max_open;
  st->trap_row = trap_row;

  ChunkMatcher m;
  m.q = q;
  const long long n_chunks = n_el / q;
  for (long long c = 0; c < n_chunks; ++c) {
    const int64_t base = c * q;
    m.n_real = 0;
    for (int k = 0; k < q; ++k) {
      if (!preal[base + k]) continue;
      m.res[m.n_real] = pcol[base + k] & (kLanes - 1);
      m.stripe[m.n_real] = pcol[base + k] >> 7;
      ++m.n_real;
    }
    bool placed = false;
    for (Tile* t : st->open) {
      if (t->n_chunks >= cap) continue;
      if (m.match(t, t->n_chunks / kLanes)) {
        place_chunk(t, m, t->n_chunks, prow, pcol, pval, preal, base);
        placed = true;
        break;
      }
    }
    if (!placed) {
      Tile* t = new Tile();
      t->init(trap_row);
      bool ok = m.match(t, 0);
      (void)ok;  // always true on an empty tile
      place_chunk(t, m, 0, prow, pcol, pval, preal, base);
      st->open.push_back(t);
    }
    // retire full / excess tiles (oldest first keeps a rolling window)
    while (!st->open.empty() &&
           (st->open.front()->n_chunks >= cap ||
            static_cast<int>(st->open.size()) > st->max_open)) {
      st->done.push_back(st->open.front());
      st->open.erase(st->open.begin());
    }
  }
  while (!st->open.empty()) {
    st->done.push_back(st->open.front());
    st->open.erase(st->open.begin());
  }
  *out_handle = st;
  return static_cast<long long>(st->done.size());
}

// Copy packed tiles out into caller-allocated arrays:
//   values (n_tiles*8, 128) f32, cells (n_tiles*8, 128) i16,
//   route (n_tiles*8, 128) i16, chunk_row (n_tiles*planes, 128) i32.
void stpu_pack_copy_q(void* handle, int q, float* values, int16_t* cells,
                      int16_t* route, int32_t* chunk_row) {
  auto* st = static_cast<PackState*>(handle);
  const int planes = kChunk / q;
  size_t ti = 0;
  for (Tile* t : st->done) {
    float* v = values + ti * kChunk * kLanes;
    int16_t* ce = cells + ti * kChunk * kLanes;
    int16_t* ro = route + ti * kChunk * kLanes;
    for (int s = 0; s < kChunk; ++s) {
      std::memcpy(v + s * kLanes, t->vals[s], sizeof(float) * kLanes);
      std::memcpy(ro + s * kLanes, t->route[s], sizeof(int16_t) * kLanes);
      std::memcpy(ce + s * kLanes, t->cells16[s], sizeof(int16_t) * kLanes);
    }
    for (int p = 0; p < planes; ++p)
      std::memcpy(chunk_row + (ti * planes + p) * kLanes, t->chunk_row[p],
                  sizeof(int32_t) * kLanes);
    ++ti;
  }
}

void stpu_pack_free(void* handle) {
  delete static_cast<PackState*>(handle);
}

}  // extern "C"
