// Native smoke test (≙ reference test/cuda_test.cpp's role: prove the
// native tier works standalone before Python touches it).
#include <cassert>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <string>

#include "tpuserve_c.h"

namespace fs = std::filesystem;

static int failures = 0;
#define CHECK(cond)                                                  \
  do {                                                               \
    if (!(cond)) {                                                   \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);    \
      ++failures;                                                    \
    }                                                                \
  } while (0)

static void TestRepository() {
  fs::path root = fs::temp_directory_path() / "tpuserve_native_test_repo";
  fs::remove_all(root);
  fs::create_directories(root / "m1" / "1");
  fs::create_directories(root / "m1" / "2");
  fs::create_directories(root / "m1" / "10");
  fs::create_directories(root / "m2" / "1");
  fs::create_directories(root / "skip" / "x");  // no marker -> ignored
  std::ofstream(root / "m1" / "1" / "config.json") << "{}";
  std::ofstream(root / "m1" / "2" / "config.json") << "{}";
  std::ofstream(root / "m1" / "10" / "model.safetensors") << "";
  std::ofstream(root / "m2" / "1" / "model.onnx") << "";

  TsRepositoryHandle repo = TsRepositoryCreate(root.c_str());
  CHECK(repo != nullptr);
  CHECK(TsRepositoryScan(repo) == 2);
  CHECK(TsRepositoryHasModel(repo, "m1", nullptr) == 1);
  CHECK(TsRepositoryHasModel(repo, "m1", "2") == 1);
  CHECK(TsRepositoryHasModel(repo, "ghost", nullptr) == 0);

  char* latest = TsRepositoryLatestVersion(repo, "m1");
  CHECK(latest && std::strcmp(latest, "10") == 0);  // numeric sort: 10 > 9-ish
  TsFreeString(latest);

  char* type = TsRepositoryModelType(repo, "m1", "10");
  CHECK(type && std::strcmp(type, "jax") == 0);
  TsFreeString(type);
  type = TsRepositoryModelType(repo, "m2", nullptr);
  CHECK(type && std::strcmp(type, "onnx") == 0);
  TsFreeString(type);

  char* json = TsRepositoryListJson(repo);
  CHECK(json && std::strstr(json, "\"m1\":[\"10\",\"2\",\"1\"]") != nullptr);
  TsFreeString(json);
  TsRepositoryDestroy(repo);
  fs::remove_all(root);
}

static void TestLifecycle() {
  TsLifecycleHandle lc = TsLifecycleCreate();
  TsModelState err;
  CHECK(TsLifecycleGetState(lc, "m:1") == TS_STATE_UNAVAILABLE);
  CHECK(TsLifecycleBeginLoad(lc, "m:1", &err) == TS_OK);
  CHECK(TsLifecycleBeginLoad(lc, "m:1", &err) == TS_INVALID_STATE);  // busy
  CHECK(err == TS_STATE_LOADING);
  CHECK(TsLifecycleFinishLoad(lc, "m:1", 1) == TS_OK);
  CHECK(TsLifecycleGetState(lc, "m:1") == TS_STATE_LOADED);
  CHECK(TsLifecycleBeginLoad(lc, "m:1", &err) == TS_INVALID_STATE);  // already loaded

  TsLifecycleRecordInference(lc, "m:1", 1000);
  TsLifecycleRecordInference(lc, "m:1", 3000);
  TsLifecycleRecordError(lc, "m:1");
  char* stats = TsLifecycleStatsJson(lc, "m:1");
  CHECK(stats && std::strstr(stats, "\"inference_count\":2") != nullptr);
  CHECK(stats && std::strstr(stats, "\"error_count\":1") != nullptr);
  CHECK(stats && std::strstr(stats, "\"avg_inference_ns\":2000") != nullptr);
  TsFreeString(stats);

  CHECK(TsLifecycleBeginUnload(lc, "m:1", &err) == TS_OK);
  CHECK(TsLifecycleFinishUnload(lc, "m:1") == TS_OK);
  CHECK(TsLifecycleGetState(lc, "m:1") == TS_STATE_UNLOADED);
  CHECK(TsLifecycleBeginUnload(lc, "m:1", &err) == TS_INVALID_STATE);

  // ERROR state permits reload (≙ inference_manager.cpp:308-311)
  CHECK(TsLifecycleBeginLoad(lc, "m:2", &err) == TS_OK);
  CHECK(TsLifecycleFinishLoad(lc, "m:2", 0) == TS_OK);
  CHECK(TsLifecycleGetState(lc, "m:2") == TS_STATE_ERROR);
  CHECK(TsLifecycleBeginLoad(lc, "m:2", &err) == TS_OK);
  TsLifecycleDestroy(lc);
}

static void TestKvAllocator() {
  TsKvAllocatorHandle kv = TsKvAllocatorCreate(8, 16);  // 8 pages x 16 tokens
  CHECK(TsKvAllocatorTotalPages(kv) == 8);
  CHECK(TsKvAllocatorFreePages(kv) == 8);

  CHECK(TsKvAllocatorEnsure(kv, 1, 20) == TS_OK);  // 2 pages
  CHECK(TsKvAllocatorFreePages(kv) == 6);
  CHECK(TsKvAllocatorEnsure(kv, 1, 30) == TS_OK);  // still 2 pages
  CHECK(TsKvAllocatorFreePages(kv) == 6);
  CHECK(TsKvAllocatorEnsure(kv, 1, 33) == TS_OK);  // grows to 3
  CHECK(TsKvAllocatorFreePages(kv) == 5);

  int32_t table[8];
  CHECK(TsKvAllocatorPageTable(kv, 1, table, 8) == 3);
  CHECK(table[0] != table[1] && table[1] != table[2]);

  CHECK(TsKvAllocatorEnsure(kv, 2, 100) == TS_EXHAUSTED);  // needs 7 > 5 free
  CHECK(TsKvAllocatorEnsure(kv, 2, 64) == TS_OK);          // 4 pages
  CHECK(TsKvAllocatorFreePages(kv) == 1);

  CHECK(TsKvAllocatorRelease(kv, 1) == TS_OK);
  CHECK(TsKvAllocatorFreePages(kv) == 4);
  CHECK(TsKvAllocatorRelease(kv, 1) == TS_NOT_FOUND);
  TsKvAllocatorDestroy(kv);
}

int main() {
  TestRepository();
  TestLifecycle();
  TestKvAllocator();
  if (failures) {
    std::printf("%d FAILURES\n", failures);
    return 1;
  }
  std::printf("native tests: ALL PASS\n");
  return 0;
}
