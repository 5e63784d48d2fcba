#!/usr/bin/env bash
# Launcher (role parity: the reference's start_simulation.bat installs deps
# and runs uvicorn; here everything is stdlib + baked-in JAX).
#
#   ./start_server.sh [PORT]
#
# Env overrides: FAV_SERVER_HOST, FAV_SERVER_PORT, FAV_SERVER_MODEL_SCORING,
# FAV_SERVER_USE_MODEL_ANOMALY (see fav_tpu/config.py).
set -euo pipefail
cd "$(dirname "$0")"
export FAV_SERVER_PORT="${1:-${FAV_SERVER_PORT:-8000}}"
exec python -m fav_tpu.serving.app
