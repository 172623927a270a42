// Model lifecycle state machine + per-model stats registry.
//
// Native counterpart of the state/stats tier of tpuserve/engine/manager.py,
// mirroring the reference's InferenceManager state machine
// (inference_manager.cpp:291-316 transition guards, :580-628 JSON status)
// and ModelStats (model.h:168-175) — with the locking the reference's stats
// update lacked (SURVEY.md §2c.9). Compute stays in XLA; this tier tracks
// states, guards transitions, and aggregates counters at native speed.

#include <algorithm>
#include <cstdint>
#include <deque>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <vector>

#include "tpuserve_c.h"

namespace tpuserve {

struct ModelEntry {
  TsModelState state = TS_STATE_UNLOADED;
  int64_t inference_count = 0;
  int64_t error_count = 0;
  int64_t total_ns = 0;
  int64_t last_ns = 0;
  std::deque<int64_t> reservoir;  // recent latencies for percentiles
};

class Lifecycle {
 public:
  static constexpr size_t kReservoir = 2048;

  TsStatus BeginLoad(const std::string& key, TsModelState* err_state) {
    std::lock_guard<std::mutex> lock(mu_);
    auto& e = models_[key];
    if (e.state == TS_STATE_LOADED || e.state == TS_STATE_LOADING ||
        e.state == TS_STATE_UNLOADING) {
      if (err_state) *err_state = e.state;
      return TS_INVALID_STATE;
    }
    e.state = TS_STATE_LOADING;  // UNLOADED/ERROR/UNAVAILABLE may (re)load
    return TS_OK;
  }

  TsStatus FinishLoad(const std::string& key, bool success) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(key);
    if (it == models_.end() || it->second.state != TS_STATE_LOADING)
      return TS_INVALID_STATE;
    it->second.state = success ? TS_STATE_LOADED : TS_STATE_ERROR;
    return TS_OK;
  }

  TsStatus BeginUnload(const std::string& key, TsModelState* err_state) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(key);
    if (it == models_.end() || it->second.state != TS_STATE_LOADED) {
      if (err_state)
        *err_state = it == models_.end() ? TS_STATE_UNAVAILABLE : it->second.state;
      return TS_INVALID_STATE;
    }
    it->second.state = TS_STATE_UNLOADING;
    return TS_OK;
  }

  TsStatus FinishUnload(const std::string& key) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(key);
    if (it == models_.end() || it->second.state != TS_STATE_UNLOADING)
      return TS_INVALID_STATE;
    it->second.state = TS_STATE_UNLOADED;
    return TS_OK;
  }

  TsModelState GetState(const std::string& key) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(key);
    return it == models_.end() ? TS_STATE_UNAVAILABLE : it->second.state;
  }

  void RecordInference(const std::string& key, int64_t ns) {
    std::lock_guard<std::mutex> lock(mu_);
    auto& e = models_[key];
    e.inference_count += 1;
    e.total_ns += ns;
    e.last_ns = ns;
    e.reservoir.push_back(ns);
    if (e.reservoir.size() > kReservoir) e.reservoir.pop_front();
  }

  void RecordError(const std::string& key) {
    std::lock_guard<std::mutex> lock(mu_);
    models_[key].error_count += 1;
  }

  std::string StatsJson(const std::string& key) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(key);
    std::ostringstream os;
    if (it == models_.end()) return "{}";
    const auto& e = it->second;
    std::vector<int64_t> sorted(e.reservoir.begin(), e.reservoir.end());
    std::sort(sorted.begin(), sorted.end());
    auto pct = [&](double q) -> int64_t {
      if (sorted.empty()) return 0;
      size_t idx = std::min(static_cast<size_t>(q * sorted.size()), sorted.size() - 1);
      return sorted[idx];
    };
    os << "{\"inference_count\":" << e.inference_count
       << ",\"error_count\":" << e.error_count
       << ",\"total_inference_ns\":" << e.total_ns
       << ",\"last_inference_ns\":" << e.last_ns
       << ",\"avg_inference_ns\":" << (e.inference_count ? e.total_ns / e.inference_count : 0)
       << ",\"p50_inference_ns\":" << pct(0.50)
       << ",\"p99_inference_ns\":" << pct(0.99) << "}";
    return os.str();
  }

 private:
  std::mutex mu_;
  std::map<std::string, ModelEntry> models_;
};

}  // namespace tpuserve

// ---------------------------------------------------------------- C API
#include <cstring>

static char* DupStringL(const std::string& s) {
  char* out = static_cast<char*>(std::malloc(s.size() + 1));
  std::memcpy(out, s.c_str(), s.size() + 1);
  return out;
}

extern "C" {

TsLifecycleHandle TsLifecycleCreate(void) { return new tpuserve::Lifecycle(); }

void TsLifecycleDestroy(TsLifecycleHandle h) {
  delete static_cast<tpuserve::Lifecycle*>(h);
}

TsStatus TsLifecycleBeginLoad(TsLifecycleHandle h, const char* key, TsModelState* err_state) {
  if (!h || !key) return TS_ERROR;
  return static_cast<tpuserve::Lifecycle*>(h)->BeginLoad(key, err_state);
}

TsStatus TsLifecycleFinishLoad(TsLifecycleHandle h, const char* key, int success) {
  if (!h || !key) return TS_ERROR;
  return static_cast<tpuserve::Lifecycle*>(h)->FinishLoad(key, success != 0);
}

TsStatus TsLifecycleBeginUnload(TsLifecycleHandle h, const char* key, TsModelState* err_state) {
  if (!h || !key) return TS_ERROR;
  return static_cast<tpuserve::Lifecycle*>(h)->BeginUnload(key, err_state);
}

TsStatus TsLifecycleFinishUnload(TsLifecycleHandle h, const char* key) {
  if (!h || !key) return TS_ERROR;
  return static_cast<tpuserve::Lifecycle*>(h)->FinishUnload(key);
}

TsModelState TsLifecycleGetState(TsLifecycleHandle h, const char* key) {
  if (!h || !key) return TS_STATE_UNAVAILABLE;
  return static_cast<tpuserve::Lifecycle*>(h)->GetState(key);
}

void TsLifecycleRecordInference(TsLifecycleHandle h, const char* key, int64_t ns) {
  if (h && key) static_cast<tpuserve::Lifecycle*>(h)->RecordInference(key, ns);
}

void TsLifecycleRecordError(TsLifecycleHandle h, const char* key) {
  if (h && key) static_cast<tpuserve::Lifecycle*>(h)->RecordError(key);
}

char* TsLifecycleStatsJson(TsLifecycleHandle h, const char* key) {
  if (!h || !key) return nullptr;
  return DupStringL(static_cast<tpuserve::Lifecycle*>(h)->StatsJson(key));
}

}  // extern "C"
