#!/usr/bin/env bash
# One-command correctness pre-flight: dump every declared query at the given
# scale factor, then mirror the driver's DuckDB oracle compare.
# Usage: scripts/preflight.sh [sfDir] [outDir]
# Exit nonzero if any query fails to dump or any oracle compare diverges.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/ptx_preflight}"
echo "[preflight] dumping queries at $SF_DIR -> $OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
echo "[preflight] DuckDB oracle compare"
python3 scripts/parity.py "$SF_DIR" "$OUT_DIR"
