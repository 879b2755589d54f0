#!/usr/bin/env bash
# Per-round verify recipe: correctness gate + quality-floor artifact.
#
#   scripts/round.sh <round> [sfDir]
#
# 1. graft.Verify dumps every SparkEntry.queries result at sfDir
# 2. scripts/check.py emulates the driver's DuckDB oracle compare
# 3. graft.Quality refreshes QUALITY_r<round>.json (measured
#    recall/error/monotonicity for the eight no-oracle queries), so the
#    committed artifact is regenerated — never hand-edited — each round.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="$(printf '%02d' "${1:?usage: scripts/round.sh <round> [sfDir]}")"
SF_DIR="${2:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft_verify.XXXXXX)"

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt "runMain graft.Verify $SF_DIR $OUT"
python3 scripts/check.py "$SF_DIR" "$OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt "runMain graft.Quality $SF_DIR QUALITY_r${ROUND}.json"
echo "round $ROUND: correctness gate + QUALITY_r${ROUND}.json refreshed"
