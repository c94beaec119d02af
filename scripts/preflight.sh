#!/usr/bin/env bash
# One-command correctness pre-flight: dump every declared query at the given
# scale factor, then mirror the driver's DuckDB oracle compare.
# Usage: scripts/preflight.sh [sfDir] [outDir]
# Exit nonzero if any query fails to dump or any oracle compare diverges.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/ptx_preflight}"
# Canary first: one events query AND one documents query end-to-end before
# the full dump, so a fixture drift (round 8: events.ts ns->us regen broke
# 49 queries at once) surfaces as ONE loud loader error here instead of a
# 49-query crater. The SchemaDigest line prints each table's
# post-normalization schema so a drift diagnosis is a one-line read.
# graft.Verify swallows per-query failures to stderr (exit 0 regardless),
# so success = the parquet dump for each canary query actually exists.
echo "[preflight] fixture canary (schema digest + scan_events_ns + llm_text_stats at $SF_DIR)"
rm -rf "$OUT_DIR.canary"
sbt -batch \
  "runMain ptx.tools.SchemaDigest $SF_DIR" \
  "runMain graft.Verify $SF_DIR $OUT_DIR.canary scan_events_ns,llm_text_stats"
for canary in scan_events_ns llm_text_stats; do
  if ! ls "$OUT_DIR.canary/$canary/"*.parquet >/dev/null 2>&1; then
    echo "[preflight] CANARY FAILED ($canary): fixture/loader drift — fix ptx.Tables before anything else"
    exit 1
  fi
done
# Fast oracle-TYPE audit before the slow full dump (r13, VERDICT r12 #2):
# the canary Verify already wrote oracle_sql.json, so a HUGEINT-typed
# oracle output (un-CAST integer sum — the class that cost win_range_banded
# its r12 hash) fails HERE in seconds, not after the full-map dump.
echo "[preflight] oracle type audit (--types-only)"
python3 scripts/parity.py "$SF_DIR" "$OUT_DIR.canary" --types-only
echo "[preflight] dumping queries at $SF_DIR -> $OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
echo "[preflight] DuckDB oracle compare"
python3 scripts/parity.py "$SF_DIR" "$OUT_DIR"
