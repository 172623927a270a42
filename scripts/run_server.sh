#!/usr/bin/env bash
# Run the server (≙ reference scripts/run_server.sh — minus the hardcoded
# ngrok token the reference shipped; SURVEY.md §2c.11).
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
exec python -m tpuserve.server \
  --repository "${TPUSERVE_REPOSITORY:-./models}" \
  --port "${TPUSERVE_PORT:-8080}" \
  --grpc-port "${TPUSERVE_GRPC_PORT:-9090}" \
  "$@"
