// Paged KV-cache block allocator.
//
// North-star component (BASELINE.md: "CUDA memory manager -> HBM arena +
// KV-page allocator"); no reference counterpart. The device-side KV arena
// is one big HBM buffer of fixed-size pages; this allocator does the
// host-side bookkeeping: a free list of page ids and per-sequence page
// chains. The serving engine asks for pages as sequences grow and reads
// back page tables for the device-side gather in paged attention.
//
// O(1) alloc/free per page; thread-safe.

#include <cstdint>
#include <mutex>
#include <unordered_map>
#include <vector>

#include "tpuserve_c.h"

namespace tpuserve {

class KvAllocator {
 public:
  KvAllocator(int32_t num_pages, int32_t page_size)
      : page_size_(page_size), total_(num_pages) {
    free_.reserve(num_pages);
    for (int32_t i = num_pages - 1; i >= 0; --i) free_.push_back(i);
  }

  TsStatus Ensure(int64_t seq, int32_t num_tokens) {
    if (num_tokens < 0) return TS_ERROR;
    std::lock_guard<std::mutex> lock(mu_);
    auto& chain = chains_[seq];
    int32_t need = (num_tokens + page_size_ - 1) / page_size_;
    if (need <= static_cast<int32_t>(chain.size())) return TS_OK;
    int32_t extra = need - static_cast<int32_t>(chain.size());
    if (extra > static_cast<int32_t>(free_.size())) return TS_EXHAUSTED;
    for (int32_t i = 0; i < extra; ++i) {
      chain.push_back(free_.back());
      free_.pop_back();
    }
    return TS_OK;
  }

  TsStatus Release(int64_t seq) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = chains_.find(seq);
    if (it == chains_.end()) return TS_NOT_FOUND;
    for (int32_t p : it->second) free_.push_back(p);
    chains_.erase(it);
    return TS_OK;
  }

  int32_t PageTable(int64_t seq, int32_t* out, int32_t cap) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = chains_.find(seq);
    if (it == chains_.end()) return -1;
    int32_t n = static_cast<int32_t>(it->second.size());
    if (out) {
      int32_t c = n < cap ? n : cap;
      for (int32_t i = 0; i < c; ++i) out[i] = it->second[i];
    }
    return n;
  }

  int32_t FreePages() {
    std::lock_guard<std::mutex> lock(mu_);
    return static_cast<int32_t>(free_.size());
  }

  int32_t TotalPages() const { return total_; }

 private:
  const int32_t page_size_;
  const int32_t total_;
  std::mutex mu_;
  std::vector<int32_t> free_;
  std::unordered_map<int64_t, std::vector<int32_t>> chains_;
};

}  // namespace tpuserve

extern "C" {

TsKvAllocatorHandle TsKvAllocatorCreate(int32_t num_pages, int32_t page_size) {
  if (num_pages <= 0 || page_size <= 0) return nullptr;
  return new tpuserve::KvAllocator(num_pages, page_size);
}

void TsKvAllocatorDestroy(TsKvAllocatorHandle h) {
  delete static_cast<tpuserve::KvAllocator*>(h);
}

TsStatus TsKvAllocatorEnsure(TsKvAllocatorHandle h, int64_t seq, int32_t num_tokens) {
  if (!h) return TS_ERROR;
  return static_cast<tpuserve::KvAllocator*>(h)->Ensure(seq, num_tokens);
}

TsStatus TsKvAllocatorRelease(TsKvAllocatorHandle h, int64_t seq) {
  if (!h) return TS_ERROR;
  return static_cast<tpuserve::KvAllocator*>(h)->Release(seq);
}

int32_t TsKvAllocatorPageTable(TsKvAllocatorHandle h, int64_t seq, int32_t* out, int32_t cap) {
  if (!h) return -1;
  return static_cast<tpuserve::KvAllocator*>(h)->PageTable(seq, out, cap);
}

int32_t TsKvAllocatorFreePages(TsKvAllocatorHandle h) {
  if (!h) return -1;
  return static_cast<tpuserve::KvAllocator*>(h)->FreePages();
}

int32_t TsKvAllocatorTotalPages(TsKvAllocatorHandle h) {
  if (!h) return -1;
  return static_cast<tpuserve::KvAllocator*>(h)->TotalPages();
}

}  // extern "C"
