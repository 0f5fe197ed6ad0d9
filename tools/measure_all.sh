#!/bin/bash
# One-shot TPU measurement session: run every profiler + the bench and
# log to /tmp/measure/. Designed for flaky-tunnel windows: each step has
# its own timeout and the script continues past failures.
set -u
OUT=${1:-/tmp/measure}
mkdir -p "$OUT"
cd /root/repo

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))"
  tail -25 "$OUT/$name.log" | grep -v experimental || true
}

run prof_match   2400 python3 -u tools/prof_match.py
run prof_detect  2400 python3 -u tools/prof_detect.py
run bench        3600 python3 -u bench.py
