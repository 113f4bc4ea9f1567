// shard_reader — native threaded record-gather over mmap'd video shards.
//
// TPU-native replacement for the reference's HDF5-via-h5py lazy collate
// reads (reference datasets.py:23-44, preprocess.py:88-95), which were the
// acknowledged input bottleneck ("num_workers: 1 when using h5py",
// configs/celebv-text.yaml:48). Design:
//   * .vshard file = 64-byte header + fixed-size records, written once by
//     preprocessing; reads are pure mmap + parallel memcpy (no locks, no
//     chunk cache, no HDF5 global lock)
//   * sr_gather copies an arbitrary index set into a caller-provided
//     contiguous batch buffer using a thread pool — page-ins overlap across
//     threads, saturating disk/page-cache bandwidth
//   * sr_prefetch issues madvise(WILLNEED) so the next batch pages in while
//     the accelerator crunches the current one
//
// Exposed as a C ABI consumed via ctypes (data/shards.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x3130445241485356ULL;  // "VSHARD01" little-endian

struct Header {
  uint64_t magic;
  uint32_t num_records;
  uint32_t record_bytes;
  uint32_t ndim;
  uint32_t dtype;  // 0 = f32, 1 = u8, 2 = i32
  uint32_t dims[8];
  uint32_t reserved[2];
};
static_assert(sizeof(Header) == 64, "header must be 64 bytes");

struct Shard {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t mapped = 0;
  Header hdr{};
  const uint8_t* records = nullptr;
};

}  // namespace

extern "C" {

void* sr_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* s = new Shard();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(mem);
  s->mapped = st.st_size;
  std::memcpy(&s->hdr, s->base, sizeof(Header));
  // validate EVERY header field a corrupt/truncated file could carry:
  // ndim bounds the sr_dims memcpy (dims[8]); dtype indexes the Python
  // _DTYPES table — both would otherwise drive out-of-bounds behavior
  if (s->hdr.magic != kMagic || s->hdr.ndim > 8 || s->hdr.dtype > 2 ||
      sizeof(Header) + static_cast<size_t>(s->hdr.num_records) * s->hdr.record_bytes >
          s->mapped) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete s;
    return nullptr;
  }
  s->records = s->base + sizeof(Header);
  return s;
}

int64_t sr_num_records(void* h) {
  return h ? static_cast<Shard*>(h)->hdr.num_records : -1;
}

int64_t sr_record_bytes(void* h) {
  return h ? static_cast<Shard*>(h)->hdr.record_bytes : -1;
}

int sr_dtype(void* h) { return h ? static_cast<Shard*>(h)->hdr.dtype : -1; }

int sr_ndim(void* h) { return h ? static_cast<Shard*>(h)->hdr.ndim : -1; }

void sr_dims(void* h, uint32_t* out) {
  if (!h) return;
  auto* s = static_cast<Shard*>(h);
  std::memcpy(out, s->hdr.dims, sizeof(uint32_t) * s->hdr.ndim);
}

// Gather records[indices[i]] -> out + i*record_bytes, parallel across a
// transient thread pool. Returns 0 on success, -1 on any out-of-range index.
int sr_gather(void* h, const int64_t* indices, int64_t n, uint8_t* out,
              int num_threads) {
  if (!h) return -1;
  auto* s = static_cast<Shard*>(h);
  const size_t rb = s->hdr.record_bytes;
  const int64_t nrec = s->hdr.num_records;
  for (int64_t i = 0; i < n; ++i) {
    if (indices[i] < 0 || indices[i] >= nrec) return -1;
  }
  int nt = std::max(1, std::min<int>(num_threads, n));
  if (nt == 1) {
    for (int64_t i = 0; i < n; ++i) {
      std::memcpy(out + i * rb, s->records + indices[i] * rb, rb);
    }
    return 0;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        std::memcpy(out + i * rb, s->records + indices[i] * rb, rb);
      }
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Hint the kernel to page in the given records ahead of use.
void sr_prefetch(void* h, const int64_t* indices, int64_t n) {
  if (!h) return;
  auto* s = static_cast<Shard*>(h);
  const size_t rb = s->hdr.record_bytes;
  const long page = sysconf(_SC_PAGESIZE);
  for (int64_t i = 0; i < n; ++i) {
    if (indices[i] < 0 || indices[i] >= s->hdr.num_records) continue;
    const uint8_t* p = s->records + indices[i] * rb;
    uintptr_t start = reinterpret_cast<uintptr_t>(p) & ~(page - 1);
    size_t len = rb + (reinterpret_cast<uintptr_t>(p) - start);
    madvise(reinterpret_cast<void*>(start), len, MADV_WILLNEED);
  }
}

void sr_close(void* h) {
  if (!h) return;
  auto* s = static_cast<Shard*>(h);
  munmap(const_cast<uint8_t*>(s->base), s->mapped);
  ::close(s->fd);
  delete s;
}

}  // extern "C"
