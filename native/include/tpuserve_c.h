/* tpuserve native runtime — C API.
 *
 * Reference counterpart: include/inference_bridge.h — the extern "C" surface
 * the Go binding consumed over CGO. Here the same role is played for Python
 * over ctypes: opaque handles, malloc'd strings the caller frees, integer
 * status codes.
 *
 * Components:
 *  - Repository: filesystem model repository scanner (≙ model_repository.cpp)
 *  - Lifecycle:  model state machine + per-model stats registry
 *                (≙ inference_manager.cpp state/stats tier — the compute
 *                itself stays in XLA; this tracks states and counters)
 *  - KvAllocator: paged KV-cache block allocator (north-star HBM arena /
 *                KV-page bookkeeping; no reference counterpart)
 */
#ifndef TPUSERVE_C_H
#define TPUSERVE_C_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void* TsRepositoryHandle;
typedef void* TsLifecycleHandle;
typedef void* TsKvAllocatorHandle;

typedef enum {
  TS_OK = 0,
  TS_ERROR = 1,
  TS_NOT_FOUND = 2,
  TS_INVALID_STATE = 3,
  TS_EXHAUSTED = 4,
} TsStatus;

/* Model lifecycle states (≙ inference_manager.h:22-29). */
typedef enum {
  TS_STATE_UNAVAILABLE = 0,
  TS_STATE_UNLOADED = 1,
  TS_STATE_LOADING = 2,
  TS_STATE_LOADED = 3,
  TS_STATE_UNLOADING = 4,
  TS_STATE_ERROR = 5,
} TsModelState;

/* ---------------- repository ---------------- */
TsRepositoryHandle TsRepositoryCreate(const char* path);
void TsRepositoryDestroy(TsRepositoryHandle h);
/* Re-scan the filesystem; returns number of models found. */
int TsRepositoryScan(TsRepositoryHandle h);
/* JSON description of the repository: {"name": ["ver1", ...], ...}.
 * Caller frees with TsFreeString. */
char* TsRepositoryListJson(TsRepositoryHandle h);
/* Latest (numeric-descending) version, or NULL. Caller frees. */
char* TsRepositoryLatestVersion(TsRepositoryHandle h, const char* model);
int TsRepositoryHasModel(TsRepositoryHandle h, const char* model, const char* version);
/* Marker-file model type: "jax"|"llm"|"onnx"|"tensorflow"|"tensorrt"|
 * "pytorch"|"unknown". Caller frees. */
char* TsRepositoryModelType(TsRepositoryHandle h, const char* model, const char* version);

/* ---------------- lifecycle ---------------- */
TsLifecycleHandle TsLifecycleCreate(void);
void TsLifecycleDestroy(TsLifecycleHandle h);
/* State transitions with guards (≙ inference_manager.cpp:291-316).
 * Returns TS_OK or TS_INVALID_STATE; on TS_INVALID_STATE *err_state holds
 * the current state. */
TsStatus TsLifecycleBeginLoad(TsLifecycleHandle h, const char* key, TsModelState* err_state);
TsStatus TsLifecycleFinishLoad(TsLifecycleHandle h, const char* key, int success);
TsStatus TsLifecycleBeginUnload(TsLifecycleHandle h, const char* key, TsModelState* err_state);
TsStatus TsLifecycleFinishUnload(TsLifecycleHandle h, const char* key);
TsModelState TsLifecycleGetState(TsLifecycleHandle h, const char* key);
/* Stats (≙ ModelStats, model.h:168-175): thread-safe counters. */
void TsLifecycleRecordInference(TsLifecycleHandle h, const char* key, int64_t duration_ns);
void TsLifecycleRecordError(TsLifecycleHandle h, const char* key);
/* JSON stats snapshot; caller frees. */
char* TsLifecycleStatsJson(TsLifecycleHandle h, const char* key);

/* ---------------- paged KV allocator ---------------- */
/* An arena of `num_pages` fixed-size pages. Sequences allocate page chains;
 * the page table for a sequence is read back for device-side gathers. */
TsKvAllocatorHandle TsKvAllocatorCreate(int32_t num_pages, int32_t page_size);
void TsKvAllocatorDestroy(TsKvAllocatorHandle h);
/* Allocate pages for `num_tokens` tokens for sequence `seq_id`.
 * Returns TS_OK or TS_EXHAUSTED. Extends an existing chain. */
TsStatus TsKvAllocatorEnsure(TsKvAllocatorHandle h, int64_t seq_id, int32_t num_tokens);
/* Free a sequence's pages. */
TsStatus TsKvAllocatorRelease(TsKvAllocatorHandle h, int64_t seq_id);
/* Copy the sequence's page table into out (cap entries); returns count or -1. */
int32_t TsKvAllocatorPageTable(TsKvAllocatorHandle h, int64_t seq_id, int32_t* out, int32_t cap);
int32_t TsKvAllocatorFreePages(TsKvAllocatorHandle h);
int32_t TsKvAllocatorTotalPages(TsKvAllocatorHandle h);

/* ---------------- misc ---------------- */
void TsFreeString(char* s);
const char* TsVersion(void);

#ifdef __cplusplus
}
#endif

#endif /* TPUSERVE_C_H */
