#!/usr/bin/env bash
# Build the native runtime (libtpuserve.so + native tests).
# ≙ reference scripts/build_inference_engine.sh, minus CUDA.
# Usage: build_native.sh [--run-tests] [extra cmake args...]
set -euo pipefail
cd "$(dirname "$0")/../native"

run_tests=0
tsan=0
cmake_args=()
for a in "$@"; do
  if [[ "$a" == "--run-tests" ]]; then
    run_tests=1
  elif [[ "$a" == "--tsan" ]]; then
    tsan=1
  else
    cmake_args+=("$a")
  fi
done

if [[ "$tsan" == "1" ]]; then
  # ThreadSanitizer concurrency stress (separate build dir; exits non-zero
  # on any race report or logic failure)
  cmake -B build-tsan -G Ninja -DTPUSERVE_TSAN=ON "${cmake_args[@]}" > /dev/null
  ninja -C build-tsan tpuserve_tsan_stress
  TSAN_OPTIONS="halt_on_error=1" ./build-tsan/tpuserve_tsan_stress "$(cd .. && pwd)/models"
  echo "tsan stress: PASSED"
  exit 0
fi

cmake -B build -G Ninja "${cmake_args[@]}"
ninja -C build

if [[ "$run_tests" == "1" ]]; then
  ./build/tpuserve_test
fi

echo "built: native/build/libtpuserve.so"
