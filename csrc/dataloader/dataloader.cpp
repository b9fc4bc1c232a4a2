// Native tokenized-dataset loader for the training harness.
//
// TPU-native counterpart of the reference's Python data pipeline
// (training/src/datamodules/language_modeling_hf.py: tokenize+concat into a
// flat token file, then serve fixed-length windows; fault_tolerant_sampler.py:
// resumable shuffled order). The reference keeps this in Python on top of
// torch DataLoader workers; here the hot path — memmap window gather with a
// resumable pseudorandom permutation — is C++ behind a minimal C ABI loaded
// via ctypes, so batch assembly costs no Python-object traffic and scales
// with threads.
//
// Key properties:
//  * zero-copy source: the token file is mmap'd read-only (uint16 or
//    uint32 tokens), windows are gathered straight into the caller's buffer;
//  * deterministic, seekable shuffle: a 4-round Feistel network over the
//    index space gives a bijective pseudorandom permutation — batch i of
//    epoch e is a pure function of (seed, e, i), so exact resume needs only
//    the integer step counter (≙ RandomFaultTolerantSampler's RNG-state
//    checkpointing, fault_tolerant_sampler.py:9-92);
//  * multi-threaded gather for large batches.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Dataset {
  void* map = nullptr;
  size_t map_bytes = 0;
  const uint8_t* data = nullptr;
  int64_t num_tokens = 0;
  int dtype_bytes = 2;  // 2 = uint16, 4 = uint32
  int64_t seqlen = 0;   // tokens per window, excluding the +1 target shift
};

// 64-bit mix (splitmix64 finalizer)
inline uint64_t mix(uint64_t x) {
  x += 0x9E3779B97f4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

// Bijective pseudorandom permutation of [0, n) via a balanced Feistel
// network over ceil-power-of-two halves with cycle walking.
inline uint64_t feistel_perm(uint64_t i, uint64_t n, uint64_t seed) {
  if (n <= 1) return 0;
  int bits = 1;
  while ((1ull << bits) < n) ++bits;
  int half = (bits + 1) / 2;
  uint64_t mask = (1ull << half) - 1;
  uint64_t x = i;
  do {
    uint64_t l = x >> half, r = x & mask;
    for (int round = 0; round < 4; ++round) {
      uint64_t f = mix(r ^ mix(seed + round)) & mask;
      uint64_t nl = r, nr = l ^ f;
      l = nl;
      r = nr;
    }
    x = (l << half) | r;
  } while (x >= n);  // cycle-walk back into range
  return x;
}

void gather_range(const Dataset* ds, uint64_t seed, int64_t start,
                  int64_t count, int32_t* out) {
  const int64_t window = ds->seqlen + 1;  // input + shifted target
  const int64_t nseq = ds->num_tokens / window;
  for (int64_t b = 0; b < count; ++b) {
    const int64_t gidx = start + b;
    const int64_t epoch = gidx / nseq;
    const uint64_t pos = feistel_perm(
        static_cast<uint64_t>(gidx % nseq), static_cast<uint64_t>(nseq),
        seed + 0x51ED2701ull * static_cast<uint64_t>(epoch));
    const int64_t off = static_cast<int64_t>(pos) * window;
    int32_t* dst = out + b * window;
    if (ds->dtype_bytes == 2) {
      const uint16_t* src =
          reinterpret_cast<const uint16_t*>(ds->data) + off;
      for (int64_t t = 0; t < window; ++t) dst[t] = src[t];
    } else {
      const uint32_t* src =
          reinterpret_cast<const uint32_t*>(ds->data) + off;
      for (int64_t t = 0; t < window; ++t)
        dst[t] = static_cast<int32_t>(src[t]);
    }
  }
}

}  // namespace

extern "C" {

// Open a flat token file. dtype_bytes: 2 (uint16) or 4 (uint32).
// Returns an opaque handle or nullptr.
void* dl_open(const char* path, int dtype_bytes, int64_t seqlen) {
  if (dtype_bytes != 2 && dtype_bytes != 4) return nullptr;
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return nullptr;
  madvise(map, st.st_size, MADV_RANDOM);
  auto* ds = new Dataset;
  ds->map = map;
  ds->map_bytes = st.st_size;
  ds->data = static_cast<const uint8_t*>(map);
  ds->dtype_bytes = dtype_bytes;
  ds->num_tokens = st.st_size / dtype_bytes;
  ds->seqlen = seqlen;
  return ds;
}

int64_t dl_num_sequences(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  return ds->num_tokens / (ds->seqlen + 1);
}

int64_t dl_num_tokens(void* handle) {
  return static_cast<Dataset*>(handle)->num_tokens;
}

// Fill out[batch][seqlen+1] with windows at global shuffled indices
// [start, start+batch). Deterministic in (seed, start); epochs reshuffle.
// threads <= 0 picks a heuristic. Returns 0 on success.
int dl_fetch(void* handle, uint64_t seed, int64_t start, int64_t batch,
             int32_t* out, int threads) {
  auto* ds = static_cast<Dataset*>(handle);
  if (ds->num_tokens / (ds->seqlen + 1) == 0) return 1;
  if (threads <= 0) {
    threads = batch >= 16 ? 4 : 1;
  }
  threads = std::min<int64_t>(threads, batch);
  if (threads <= 1) {
    gather_range(ds, seed, start, batch, out);
    return 0;
  }
  std::vector<std::thread> pool;
  const int64_t chunk = (batch + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min<int64_t>(lo + chunk, batch);
    if (lo >= hi) break;
    pool.emplace_back([=] {
      gather_range(ds, seed, start + lo, hi - lo,
                   out + lo * (ds->seqlen + 1));
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

void dl_close(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  if (ds->map) munmap(ds->map, ds->map_bytes);
  delete ds;
}

}  // extern "C"
