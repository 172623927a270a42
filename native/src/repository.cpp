// Filesystem model repository scanner.
//
// Native counterpart of tpuserve/repository/repo.py, mirroring the
// reference's C++ ModelRepository (model_repository.cpp): scan
// repo/<name>/<version>/ two levels deep, marker-file type detection,
// numeric-descending version sort with lexicographic fallback. Exposed to
// Python through the C API in tpuserve_c.h (consumed via ctypes, replacing
// the reference's CGO binding tier).

#include <algorithm>
#include <cctype>
#include <filesystem>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <vector>

namespace fs = std::filesystem;

namespace tpuserve {

struct MarkerType {
  const char* marker;
  const char* type;
};

// Checked in order (≙ model_repository.cpp:161-178's marker list, extended
// with the JAX-native formats).
static const MarkerType kMarkers[] = {
    {"model.safetensors", "jax"},
    {"params.msgpack", "jax"},
    {"checkpoint", "jax"},
    {"model.onnx", "onnx"},
    {"saved_model.pb", "tensorflow"},
    {"model.plan", "tensorrt"},
    {"model.pt", "pytorch"},
};

static bool IsNumeric(const std::string& s) {
  if (s.empty()) return false;
  for (char c : s)
    if (!std::isdigit(static_cast<unsigned char>(c))) return false;
  return true;
}

// Descending numeric, then descending lexicographic for non-numeric
// (≙ model_repository.cpp:45-53).
static bool VersionGreater(const std::string& a, const std::string& b) {
  bool na = IsNumeric(a), nb = IsNumeric(b);
  if (na && nb) {
    if (a.size() != b.size()) return a.size() > b.size();
    return a > b;
  }
  if (na != nb) return na;  // numeric sorts before (greater than) non-numeric
  return a > b;
}

class Repository {
 public:
  explicit Repository(std::string path) : path_(std::move(path)) { Scan(); }

  int Scan() {
    std::map<std::string, std::vector<std::string>> found;
    std::error_code ec;
    for (const auto& model_dir : fs::directory_iterator(path_, ec)) {
      if (ec || !model_dir.is_directory()) continue;
      std::vector<std::string> versions;
      for (const auto& ver_dir : fs::directory_iterator(model_dir.path(), ec)) {
        if (ec || !ver_dir.is_directory()) continue;
        if (VersionValid(ver_dir.path())) {
          versions.push_back(ver_dir.path().filename().string());
        }
      }
      if (!versions.empty()) {
        std::sort(versions.begin(), versions.end(), VersionGreater);
        found[model_dir.path().filename().string()] = std::move(versions);
      }
    }
    std::lock_guard<std::mutex> lock(mu_);
    models_ = std::move(found);
    return static_cast<int>(models_.size());
  }

  std::string ListJson() {
    std::lock_guard<std::mutex> lock(mu_);
    std::ostringstream os;
    os << "{";
    bool first_m = true;
    for (const auto& [name, versions] : models_) {
      if (!first_m) os << ",";
      first_m = false;
      os << "\"" << Escape(name) << "\":[";
      for (size_t i = 0; i < versions.size(); ++i) {
        if (i) os << ",";
        os << "\"" << Escape(versions[i]) << "\"";
      }
      os << "]";
    }
    os << "}";
    return os.str();
  }

  std::string LatestVersion(const std::string& model) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(model);
    if (it == models_.end() || it->second.empty()) return "";
    return it->second.front();
  }

  bool HasModel(const std::string& model, const std::string& version) {
    std::lock_guard<std::mutex> lock(mu_);
    auto it = models_.find(model);
    if (it == models_.end()) return false;
    if (version.empty()) return true;
    for (const auto& v : it->second)
      if (v == version) return true;
    return false;
  }

  std::string ModelType(const std::string& model, const std::string& version) {
    std::string ver = version.empty() ? LatestVersion(model) : version;
    if (ver.empty()) return "unknown";
    fs::path vdir = fs::path(path_) / model / ver;
    for (const auto& m : kMarkers) {
      std::error_code ec;
      if (fs::exists(vdir / m.marker, ec)) return m.type;
    }
    return "unknown";
  }

 private:
  static bool VersionValid(const fs::path& vdir) {
    std::error_code ec;
    for (const auto& m : kMarkers)
      if (fs::exists(vdir / m.marker, ec)) return true;
    return fs::exists(vdir / "config.json", ec);
  }

  static std::string Escape(const std::string& s) {
    std::string out;
    for (char c : s) {
      if (c == '"' || c == '\\') out += '\\';
      out += c;
    }
    return out;
  }

  std::string path_;
  std::mutex mu_;
  std::map<std::string, std::vector<std::string>> models_;
};

}  // namespace tpuserve

// ---------------------------------------------------------------- C API
#include <cstring>

#include "tpuserve_c.h"

static char* DupString(const std::string& s) {
  char* out = static_cast<char*>(std::malloc(s.size() + 1));
  std::memcpy(out, s.c_str(), s.size() + 1);
  return out;
}

extern "C" {

TsRepositoryHandle TsRepositoryCreate(const char* path) {
  if (!path) return nullptr;
  return new tpuserve::Repository(path);
}

void TsRepositoryDestroy(TsRepositoryHandle h) {
  delete static_cast<tpuserve::Repository*>(h);
}

int TsRepositoryScan(TsRepositoryHandle h) {
  if (!h) return -1;
  return static_cast<tpuserve::Repository*>(h)->Scan();
}

char* TsRepositoryListJson(TsRepositoryHandle h) {
  if (!h) return nullptr;
  return DupString(static_cast<tpuserve::Repository*>(h)->ListJson());
}

char* TsRepositoryLatestVersion(TsRepositoryHandle h, const char* model) {
  if (!h || !model) return nullptr;
  auto v = static_cast<tpuserve::Repository*>(h)->LatestVersion(model);
  if (v.empty()) return nullptr;
  return DupString(v);
}

int TsRepositoryHasModel(TsRepositoryHandle h, const char* model, const char* version) {
  if (!h || !model) return 0;
  return static_cast<tpuserve::Repository*>(h)->HasModel(model, version ? version : "") ? 1 : 0;
}

char* TsRepositoryModelType(TsRepositoryHandle h, const char* model, const char* version) {
  if (!h || !model) return nullptr;
  return DupString(
      static_cast<tpuserve::Repository*>(h)->ModelType(model, version ? version : ""));
}

void TsFreeString(char* s) { std::free(s); }

const char* TsVersion(void) { return "0.1.0"; }

}  // extern "C"
