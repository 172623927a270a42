#!/usr/bin/env bash
# Build the native runtime (libtpuserve.so + native tests).
# ≙ reference scripts/build_inference_engine.sh, minus CUDA.
set -euo pipefail
cd "$(dirname "$0")/../native"

cmake -B build -G Ninja "$@"
ninja -C build

if [[ "${1:-}" == "--run-tests" || "${2:-}" == "--run-tests" ]]; then
  ./build/tpuserve_test
fi

echo "built: native/build/libtpuserve.so"
