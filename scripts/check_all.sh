#!/usr/bin/env bash
# Full local gate: compile, tests, end-to-end verify + DuckDB oracle.
#   scripts/check_all.sh [sfDir]    (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft-check.XXXXXX)"

echo "== compile + test =="
sbt -batch test

echo "== verify @ $SF =="
sbt -batch "runMain graft.Verify $SF $OUT"

echo "== oracle =="
python3 scripts/oracle_check.py "$SF" "$OUT"

echo "== table-layer drive =="
sbt -batch "runMain graft.tools.TableDemo" 2>&1 | grep -E "^\[info\] [A-Z]"
