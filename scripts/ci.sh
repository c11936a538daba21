#!/usr/bin/env bash
# CI entry: fast tier (<2 min, unit/numeric tests) by default;
#   ./scripts/ci.sh full   runs the whole suite (~15 min, includes the
#   compile-heavy 8-virtual-device CPU-mesh integration tests).
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "${1:-fast}" = "full" ]; then
    exec python -m pytest tests/ -q
fi
exec python -m pytest tests/ -q -m fast
