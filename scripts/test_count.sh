#!/usr/bin/env bash
# Sum the ScalaTest/ScalaCheck test count from the sbt test-report
# XMLs (run `sbt test` first). README.md's Surface paragraph quotes
# this number — regenerate it from here instead of hand-editing
# (round-17 verdict: the hand-maintained count had drifted 524 vs the
# actual 544).
set -euo pipefail
cd "$(dirname "$0")/.."
total=0
for f in target/test-reports/*.xml; do
  n=$(sed -n 's/.*<testsuite[^>]*tests="\([0-9]*\)".*/\1/p' "$f" | head -1)
  total=$((total + ${n:-0}))
done
echo "$total"
