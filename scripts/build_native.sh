#!/usr/bin/env bash
# Build the native runtime (libtpuserve.so + native tests).
# ≙ reference scripts/build_inference_engine.sh, minus CUDA.
# Usage: build_native.sh [--run-tests] [extra cmake args...]
set -euo pipefail
cd "$(dirname "$0")/../native"

run_tests=0
cmake_args=()
for a in "$@"; do
  if [[ "$a" == "--run-tests" ]]; then
    run_tests=1
  else
    cmake_args+=("$a")
  fi
done

cmake -B build -G Ninja "${cmake_args[@]}"
ninja -C build

if [[ "$run_tests" == "1" ]]; then
  ./build/tpuserve_test
fi

echo "built: native/build/libtpuserve.so"
