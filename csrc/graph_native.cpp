// Native graph-preprocessing runtime for torch_random_walk_tpu.
//
// TPU-native counterpart of the reference's native layer: where
// Sachinx0e/torch_random_walk implements its *kernels* in C++/CUDA
// (/root/reference/csrc/), a TPU framework runs kernels through XLA — so the
// native layer here owns what the host actually does: turning raw edge
// arrays into the device tables the kernels consume.  The reference's
// Python preprocessing (torch_rw/utils.py) is O(N*E); the framework's NumPy
// replacement is O(E log E) but single-threaded and allocation-heavy (~80 s
// for 36M edges).  This library does the same work multi-threaded in C++:
//
//   - rw_build_csr:    sort edges by (src, dst), emit row_ptr / col_idx
//   - rw_pack_fat:     pack (dst, start[dst], deg[dst]) into (E, 2) uint32
//   - rw_cuckoo_build: lock-free two-choice cuckoo hash set of (u, v) keys
//                      (atomic-exchange insertion, same table layout and
//                      hash family as graph/hashset.py — bit-compatible)
//
// Exposed as a plain C ABI consumed via ctypes (no Python.h dependency);
// torch_random_walk_tpu/native/__init__.py falls back to NumPy when the
// shared library has not been built.

#include <algorithm>
#include <array>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(t) on nthreads worker threads.
template <typename F>
void parallel_for_threads(int nthreads, F fn) {
  std::vector<std::thread> ts;
  ts.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(fn, t);
  for (auto& th : ts) th.join();
}

// Parallel LSD radix sort of 64-bit keys with a payload permutation.
// Sorts `keys` ascending; `perm` follows.  8 passes of 8 bits.
void radix_sort64(std::vector<uint64_t>& keys, std::vector<int64_t>& perm) {
  const size_t n = keys.size();
  if (n < (1u << 16)) {  // small: std::sort on (key, perm) pairs
    std::vector<std::pair<uint64_t, int64_t>> kv(n);
    for (size_t i = 0; i < n; ++i) kv[i] = {keys[i], perm[i]};
    std::sort(kv.begin(), kv.end());
    for (size_t i = 0; i < n; ++i) {
      keys[i] = kv[i].first;
      perm[i] = kv[i].second;
    }
    return;
  }
  const int nt = hw_threads();
  std::vector<uint64_t> kbuf(n);
  std::vector<int64_t> pbuf(n);
  uint64_t key_or = 0;
  for (size_t i = 0; i < n; ++i) key_or |= keys[i];

  uint64_t* ksrc = keys.data();
  uint64_t* kdst = kbuf.data();
  int64_t* psrc = perm.data();
  int64_t* pdst = pbuf.data();

  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    if (((key_or >> shift) & 0xFF) == 0 && pass > 0) continue;  // empty byte
    // Per-thread histograms.
    std::vector<std::array<size_t, 256>> hist(nt);
    const size_t chunk = (n + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      auto& h = hist[t];
      h.fill(0);
      const size_t lo = t * chunk, hi = std::min(n, lo + chunk);
      for (size_t i = lo; i < hi; ++i) ++h[(ksrc[i] >> shift) & 0xFF];
    });
    // Exclusive prefix over (bucket, thread).
    size_t total = 0;
    std::vector<std::array<size_t, 256>> off(nt);
    for (int b = 0; b < 256; ++b)
      for (int t = 0; t < nt; ++t) {
        off[t][b] = total;
        total += hist[t][b];
      }
    parallel_for_threads(nt, [&](int t) {
      auto o = off[t];
      const size_t lo = t * chunk, hi = std::min(n, lo + chunk);
      for (size_t i = lo; i < hi; ++i) {
        const int b = (ksrc[i] >> shift) & 0xFF;
        const size_t d = o[b]++;
        kdst[d] = ksrc[i];
        pdst[d] = psrc[i];
      }
    });
    std::swap(ksrc, kdst);
    std::swap(psrc, pdst);
  }
  if (ksrc != keys.data()) {
    std::memcpy(keys.data(), ksrc, n * sizeof(uint64_t));
    std::memcpy(perm.data(), psrc, n * sizeof(int64_t));
  }
}

}  // namespace

extern "C" {

// Sort (src, dst) edges and emit CSR.  All node ids < 2^31.
//   src, dst:  (E,) int64 in
//   row_ptr:   (N+1,) int64 out
//   col_idx:   (E,) int32 out  (sorted within each row)
// Returns 0 on success.
int rw_build_csr(const int64_t* src, const int64_t* dst, int64_t num_edges,
                 int64_t num_nodes, int64_t* row_ptr, int32_t* col_idx) {
  std::vector<uint64_t> keys(num_edges);
  std::vector<int64_t> perm(num_edges);
  const int nt = hw_threads();
  const size_t chunk = (num_edges + nt - 1) / nt;
  parallel_for_threads(nt, [&](int t) {
    const size_t lo = t * chunk,
                 hi = std::min<size_t>(num_edges, lo + chunk);
    for (size_t i = lo; i < hi; ++i) {
      keys[i] = (static_cast<uint64_t>(src[i]) << 32) |
                static_cast<uint32_t>(dst[i]);
      perm[i] = static_cast<int64_t>(i);
    }
  });
  radix_sort64(keys, perm);
  // row_ptr via counting.
  std::vector<std::atomic<int64_t>> counts(num_nodes);
  for (int64_t v = 0; v < num_nodes; ++v)
    counts[v].store(0, std::memory_order_relaxed);
  parallel_for_threads(nt, [&](int t) {
    const size_t lo = t * chunk,
                 hi = std::min<size_t>(num_edges, lo + chunk);
    for (size_t i = lo; i < hi; ++i)
      counts[keys[i] >> 32].fetch_add(1, std::memory_order_relaxed);
  });
  row_ptr[0] = 0;
  for (int64_t v = 0; v < num_nodes; ++v)
    row_ptr[v + 1] = row_ptr[v] + counts[v].load(std::memory_order_relaxed);
  parallel_for_threads(nt, [&](int t) {
    const size_t lo = t * chunk,
                 hi = std::min<size_t>(num_edges, lo + chunk);
    for (size_t i = lo; i < hi; ++i)
      col_idx[i] = static_cast<int32_t>(keys[i] & 0xFFFFFFFFu);
  });
  return 0;
}

// Pack the fat tables (see graph/csr.py PackedLayout):
//   V = node | start << node_bits | deg << (node_bits + start_bits)
//   edge_tab: (E, 2) uint32 out — packed row of each edge's *destination*
//   node_tab: (N, 2) uint32 out — packed row of each node
int rw_pack_fat(const int64_t* row_ptr, const int32_t* col_idx,
                int64_t num_nodes, int64_t num_edges, int node_bits,
                int start_bits, uint32_t* edge_tab, uint32_t* node_tab) {
  const int nt = hw_threads();
  auto pack = [&](uint64_t node, uint64_t start, uint64_t deg, uint32_t* out) {
    const uint64_t v =
        node | (start << node_bits) | (deg << (node_bits + start_bits));
    out[0] = static_cast<uint32_t>(v & 0xFFFFFFFFu);
    out[1] = static_cast<uint32_t>(v >> 32);
  };
  {
    const size_t chunk = (num_nodes + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      const size_t lo = t * chunk,
                   hi = std::min<size_t>(num_nodes, lo + chunk);
      for (size_t v = lo; v < hi; ++v)
        pack(v, row_ptr[v], row_ptr[v + 1] - row_ptr[v], node_tab + 2 * v);
    });
  }
  {
    const size_t chunk = (num_edges + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      const size_t lo = t * chunk,
                   hi = std::min<size_t>(num_edges, lo + chunk);
      for (size_t e = lo; e < hi; ++e) {
        const int64_t d = col_idx[e];
        pack(d, row_ptr[d], row_ptr[d + 1] - row_ptr[d], edge_tab + 2 * e);
      }
    });
  }
  return 0;
}

// Build the WIDE fat tables for the free-running biased engine in one
// parallel pass (bit-compatible with the NumPy build in ops/walk.fat6_for +
// graph/bloom.py; at ogbn-products scale the NumPy path costs minutes of
// ufunc.at / searchsorted / concatenate).  Row width = 2 + bloom_words + 1:
//   edge_tab6 (E, W): w0-w1 packed (dst, start[dst], deg[dst]),
//                     next bloom_words words: dst's out-neighbor Bloom,
//                     last word: rev | own << 16 edge multiplicities
//   node_tab6 (N, W): packed node row, its Bloom, 0
// bloom_words scales with average degree (96 bits saturate at deg ~50 —
// ops/walk.fat6_for picks the width).
int rw_pack_fat6(const int64_t* row_ptr, const int32_t* col_idx,
                 int64_t num_nodes, int64_t num_edges, int node_bits,
                 int start_bits, int bloom_words, uint32_t* edge_tab6,
                 uint32_t* node_tab6) {
  const int nt = hw_threads();
  const int width = 2 + bloom_words + 1;
  const uint64_t bloom_bits = 32u * bloom_words;
  if (bloom_words < 1 || bloom_words > 13) return 1;
  static const uint32_t kBloomMuls[2] = {0x9E3779B9u, 0x85EBCA6Bu};
  auto pack = [&](uint64_t node, uint64_t start, uint64_t deg, uint32_t* out) {
    const uint64_t v =
        node | (start << node_bits) | (deg << (node_bits + start_bits));
    out[0] = static_cast<uint32_t>(v & 0xFFFFFFFFu);
    out[1] = static_cast<uint32_t>(v >> 32);
  };
  // Pass 1 (per node): packed row + Bloom over the node's neighbors.
  // Same probe math as graph/bloom.bloom_positions_np:
  //   h = uint32(x * m); pos = (uint64(h) * 32 * words) >> 32.
  {
    const size_t chunk = (num_nodes + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      const size_t lo = t * chunk,
                   hi = std::min<size_t>(num_nodes, lo + chunk);
      for (size_t v = lo; v < hi; ++v) {
        const int64_t start = row_ptr[v], end = row_ptr[v + 1];
        uint32_t* row = node_tab6 + width * v;
        pack(v, start, end - start, row);
        uint32_t* b = row + 2;
        for (int k = 0; k < bloom_words; ++k) b[k] = 0;
        for (int64_t e = start; e < end; ++e) {
          const uint32_t x = static_cast<uint32_t>(col_idx[e]);
          for (uint32_t m : kBloomMuls) {
            const uint32_t h = x * m;
            const uint32_t pos = static_cast<uint32_t>(
                (static_cast<uint64_t>(h) * bloom_bits) >> 32);
            b[pos >> 5] |= uint32_t(1) << (pos & 31);
          }
        }
        row[width - 1] = 0;
      }
    });
  }
  // Pass 2 (per edge, partitioned on edge boundaries for hub balance):
  // dst's packed row + Bloom (copied from pass 1) + multiplicities.
  //   own(u->w): run length of w within u's sorted row (counted inline);
  //   rev(u->w): count of u within w's sorted row (binary search).
  {
    const size_t chunk = (num_edges + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      const int64_t elo = std::min<int64_t>(num_edges, t * chunk);
      const int64_t ehi = std::min<int64_t>(num_edges, elo + chunk);
      if (elo >= ehi) return;
      // First node whose row intersects [elo, ehi).
      int64_t u = std::upper_bound(row_ptr, row_ptr + num_nodes + 1, elo) -
                  row_ptr - 1;
      for (int64_t e = elo; e < ehi; ++e) {
        while (row_ptr[u + 1] <= e) ++u;
        const int32_t w = col_idx[e];
        uint32_t* out = edge_tab6 + width * e;
        const uint32_t* wrow = node_tab6 + width * w;
        pack(w, row_ptr[w], row_ptr[w + 1] - row_ptr[w], out);
        for (int k = 0; k < bloom_words; ++k) out[2 + k] = wrow[2 + k];
        // own: extend to the full run of w inside u's row (sorted).
        int64_t s = e;
        while (s > row_ptr[u] && col_idx[s - 1] == w) --s;
        int64_t eend = e;
        while (eend + 1 < row_ptr[u + 1] && col_idx[eend + 1] == w) ++eend;
        uint64_t own = eend - s + 1;
        const int32_t* wb = col_idx + row_ptr[w];
        const int32_t* we = col_idx + row_ptr[w + 1];
        uint64_t rev = std::upper_bound(wb, we, static_cast<int32_t>(u)) -
                       std::lower_bound(wb, we, static_cast<int32_t>(u));
        if (own > 0xFFFF) own = 0xFFFF;
        if (rev > 0xFFFF) rev = 0xFFFF;
        out[width - 1] = static_cast<uint32_t>(rev) |
                         (static_cast<uint32_t>(own) << 16);
      }
    });
  }
  return 0;
}

// ---- cuckoo hash set (bit-compatible with graph/hashset.py) ----

static inline uint32_t rw_hash(uint32_t lo, uint32_t hi, uint32_t salt,
                               int which, int log_size) {
  static const uint32_t A[2] = {0x9E3779B1u, 0xC2B2AE3Du};
  static const uint32_t B[2] = {0x85EBCA77u, 0x27D4EB2Fu};
  const uint32_t a = A[which] ^ salt;
  const uint32_t b =
      B[which] ^ static_cast<uint32_t>(salt * 0x9E3779B9u);
  uint32_t h = lo * a + hi * b + static_cast<uint32_t>(which + 1);
  h ^= h >> 16;
  h *= 0x7FEB352Du;
  h ^= h >> 15;
  return h >> (32 - log_size);
}

// Build the cuckoo table over (u, v) edge keys.  table is (S, 2) uint32,
// S = 1 << log_size (pre-sized by the caller: load <= 0.25), initialized
// here to the all-ones empty sentinel.  key = (u << 32) | v stored as
// (lo=v, hi=u).  Returns the salt used (>= 0) or -1 if no salt converged.
int rw_cuckoo_build(const int64_t* src, const int64_t* dst, int64_t num_edges,
                    int log_size, uint32_t* table) {
  const int64_t size = int64_t(1) << log_size;
  auto* slots = reinterpret_cast<std::atomic<uint64_t>*>(table);
  const uint64_t kEmpty = ~uint64_t(0);
  const int nt = hw_threads();
  constexpr int kMaxKicks = 512;

  for (int salt = 0; salt < 64; ++salt) {
    const size_t chunk_s = (size + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      const size_t lo = t * chunk_s, hi = std::min<size_t>(size, lo + chunk_s);
      for (size_t i = lo; i < hi; ++i)
        slots[i].store(kEmpty, std::memory_order_relaxed);
    });
    std::atomic<bool> failed{false};
    const size_t chunk = (num_edges + nt - 1) / nt;
    parallel_for_threads(nt, [&](int t) {
      const size_t lo = t * chunk,
                   hi = std::min<size_t>(num_edges, lo + chunk);
      for (size_t i = lo; i < hi && !failed.load(std::memory_order_relaxed);
           ++i) {
        const uint32_t klo = static_cast<uint32_t>(dst[i]);
        const uint32_t khi = static_cast<uint32_t>(src[i]);
        // Stored word: lo in low half, hi in high half (matches the
        // (S, 2) uint32 little-endian layout of hashset.py).
        uint64_t key = (static_cast<uint64_t>(khi) << 32) | klo;
        int which = 0;
        bool placed = false;
        for (int kick = 0; kick < kMaxKicks; ++kick) {
          const uint32_t lo32 = static_cast<uint32_t>(key);
          const uint32_t hi32 = static_cast<uint32_t>(key >> 32);
          const uint32_t pos = rw_hash(lo32, hi32, salt, which, log_size);
          uint64_t cur = slots[pos].load(std::memory_order_relaxed);
          // Duplicate?  (set semantics)
          if (cur == key) {
            placed = true;
            break;
          }
          if (cur == kEmpty) {
            if (slots[pos].compare_exchange_strong(cur, key)) {
              placed = true;
              break;
            }
            continue;  // lost the race; retry same choice
          }
          // Occupied: evict (atomic swap), carry the evicted key onward.
          const uint64_t evicted = slots[pos].exchange(key);
          if (evicted == kEmpty || evicted == key) {
            placed = true;
            break;
          }
          key = evicted;
          // The evicted key sat at `pos`; continue with its OTHER choice.
          const uint32_t elo = static_cast<uint32_t>(key);
          const uint32_t ehi = static_cast<uint32_t>(key >> 32);
          which = (rw_hash(elo, ehi, salt, 0, log_size) == pos) ? 1 : 0;
          placed = false;
        }
        if (!placed) failed.store(true, std::memory_order_relaxed);
      }
    });
    if (!failed.load()) return salt;
  }
  return -1;
}

}  // extern "C"
