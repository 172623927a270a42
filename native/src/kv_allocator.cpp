// Paged KV-cache block allocator.
//
// North-star component (BASELINE.md: "CUDA memory manager -> HBM arena +
// KV-page allocator"); no reference counterpart. The device-side KV arena
// is one big HBM buffer of fixed-size pages; this allocator does the
// host-side bookkeeping: an ordered free set of page ids and per-sequence
// page chains. The serving engine asks for pages as sequences grow and
// reads back page tables for the device-side paged attention kernel.
//
// Allocation policy: RUN-AFFINE with soft tail reservations. Scattered
// page chains cost ~7% decode throughput vs a contiguous cache (STATUS.md
// round-3 page-size sweep) — the paged kernel issues one DMA per page, and
// non-adjacent pages lose HBM locality. So Ensure() maximizes each chain's
// physical contiguity:
//   1. tail-extend: take pages immediately following the chain's last page
//      while they are free (a growing sequence stays one physical run);
//   2. otherwise take pages from the head of the FIRST free run long
//      enough for the whole request, preferring runs not soft-reserved by
//      other chains (first-fit; taking from a run's head never splits it),
//      then soft-reserve the run's continuation for this chain — sized
//      min(kReserveRun, run remainder, chain length) so interleaved
//      one-page-at-a-time growth across slots (the decode steady state)
//      still yields contiguous chains while one-shot single-page chains
//      (shared prefix blocks) leave at most a 1-page hole;
//   3. if no single run fits, consume whole longest-runs until satisfied.
// Reservations are SOFT: reserved pages stay in the free set and count in
// FreePages(); under pool pressure they are stolen (the overlapped foreign
// reservation is dropped), so capacity is unaffected. The Python fallback
// (tpuserve/serving/paged_kv.py::_PyKvAllocator) mirrors these semantics
// exactly.
//
// O(F) per growth (F = free pages); thread-safe.

#include <algorithm>
#include <cstdint>
#include <mutex>
#include <set>
#include <unordered_map>
#include <vector>

#include "tpuserve_c.h"

namespace tpuserve {

class KvAllocator {
 public:
  KvAllocator(int32_t num_pages, int32_t page_size)
      : page_size_(page_size), total_(num_pages) {
    for (int32_t i = 0; i < num_pages; ++i) free_.insert(i);
  }

  TsStatus Ensure(int64_t seq, int32_t num_tokens) {
    if (num_tokens < 0) return TS_ERROR;
    std::lock_guard<std::mutex> lock(mu_);
    auto& chain = chains_[seq];
    int32_t need = (num_tokens + page_size_ - 1) / page_size_;
    if (need <= static_cast<int32_t>(chain.size())) return TS_OK;
    int32_t extra = need - static_cast<int32_t>(chain.size());
    if (extra > static_cast<int32_t>(free_.size())) return TS_EXHAUSTED;

    // 1. extend the chain's physical tail run (this chain's own soft
    //    reservation sits exactly there when one exists)
    while (extra > 0 && !chain.empty()) {
      auto it = free_.find(chain.back() + 1);
      if (it == free_.end()) break;
      Take(seq, chain, *it, 1);
      --extra;
      auto r = reserved_.find(seq);
      if (r != reserved_.end()) {
        r->second.first = std::max(r->second.first, chain.back() + 1);
        if (r->second.first >= r->second.second) reserved_.erase(r);
      }
    }

    // 2./3. fresh runs: unreserved first-fit, then any first-fit, then
    //        consume whole longest-runs
    bool relaxed = false;
    while (extra > 0) {
      int32_t ff_start = -1, ff_len = 0;      // first run with len >= extra
      int32_t best_start = -1, best_len = 0;  // longest run
      int32_t run_start = -1, run_len = 0, prev = -2;
      for (int32_t pg : free_) {
        if (!relaxed && ForeignReserved(seq, pg)) {
          prev = -2;  // reserved page breaks the run
          continue;
        }
        if (pg == prev + 1) {
          ++run_len;
        } else {
          run_start = pg;
          run_len = 1;
        }
        prev = pg;
        if (run_len >= extra && ff_start < 0) {
          ff_start = run_start;
          // keep scanning this run to size the reservation
        }
        if (ff_start == run_start && run_len > ff_len) ff_len = run_len;
        if (run_len > best_len) {
          best_len = run_len;
          best_start = run_start;
        }
      }
      if (ff_start < 0 && !relaxed) {
        relaxed = true;  // every fitting run is foreign-reserved: steal
        continue;
      }
      if (ff_start >= 0) {
        Take(seq, chain, ff_start, extra);
        int32_t resv = std::min({kReserveRun, ff_len - extra,
                                 static_cast<int32_t>(chain.size())});
        if (resv > 0)
          reserved_[seq] = {ff_start + extra, ff_start + extra + resv};
        extra = 0;
      } else {
        Take(seq, chain, best_start, best_len);
        extra -= best_len;
      }
    }
    return TS_OK;
  }

  TsStatus Release(int64_t seq) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = chains_.find(seq);
    reserved_.erase(seq);
    if (it == chains_.end()) return TS_NOT_FOUND;
    for (int32_t p : it->second) free_.insert(p);
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
  static constexpr int32_t kReserveRun = 7;  // pages soft-held past a tail

  bool ForeignReserved(int64_t seq, int32_t pg) const {
    for (const auto& kv : reserved_) {
      if (kv.first != seq && pg >= kv.second.first && pg < kv.second.second)
        return true;
    }
    return false;
  }

  // Move [start, start+n) from the free set into `chain`; steal (drop) any
  // foreign reservation the taken range overlaps.
  void Take(int64_t seq, std::vector<int32_t>& chain, int32_t start,
            int32_t n) {
    for (int32_t i = 0; i < n; ++i) {
      chain.push_back(start + i);
      free_.erase(start + i);
    }
    for (auto it = reserved_.begin(); it != reserved_.end();) {
      if (it->first != seq && start < it->second.second &&
          start + n > it->second.first) {
        it = reserved_.erase(it);
      } else {
        ++it;
      }
    }
  }

  const int32_t page_size_;
  const int32_t total_;
  std::mutex mu_;
  std::set<int32_t> free_;
  std::unordered_map<int64_t, std::vector<int32_t>> chains_;
  // seq -> [first, last) soft-reserved run adjacent to its chain tail
  std::unordered_map<int64_t, std::pair<int32_t, int32_t>> reserved_;
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
