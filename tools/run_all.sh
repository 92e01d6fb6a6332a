#!/usr/bin/env bash
# One-shot regression: tests + oracle gate + bench. Mirrors what the
# round driver runs (see .claude/skills/verify/SKILL.md).
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-32}"
SF_VERIFY="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"
OUT="$(mktemp -d /tmp/graft_verify.XXXX)"

echo "== sbt test =="
sbt -batch test

echo "== Verify @ $SF_VERIFY =="
SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Verify $SF_VERIFY $OUT" >/dev/null
python3 tools/check.py "$SF_VERIFY" "$OUT"

echo "== Bench @ $SF_BENCH =="
SPARK_GRAFT_SF_DIR="$SF_BENCH" SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Bench" \
  | grep -E '^\{"metric"|\{"metric"' | tail -1
