#!/bin/bash
# Bisect the B=4 + K-dispatch compile blow-up (VERDICT r3 #2).
# Each point runs scripts/compile_probe.py with a FRESH persistent-cache dir
# (honest fresh-compile timing) and a hard shell timeout backstop (the
# probe's own SIGALRM cannot interrupt a blocking native compile call).
set -u
OUT=${1:-output/compile_bisect_r4.jsonl}
mkdir -p "$(dirname "$OUT")" /tmp/xla_probe
run_point() {
  local tmo=$1; shift
  local cache; cache=$(mktemp -d /tmp/xla_probe/XXXX)
  echo "# $(date -u +%H:%M:%S) point: $* (timeout ${tmo}s)" >> "$OUT"
  PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}" \
    JAX_COMPILATION_CACHE_DIR="$cache" timeout "$tmo" \
    python scripts/compile_probe.py --timeout "$tmo" "$@" >> "$OUT" 2>/tmp/xla_probe/last_err.log
  local rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 2 ]; then
    echo "{\"args\": \"$*\", \"ok\": false, \"rc\": $rc, \"error\": \"shell timeout or crash\"}" >> "$OUT"
    tail -3 /tmp/xla_probe/last_err.log | sed 's/^/# stderr: /' >> "$OUT"
  fi
  rm -rf "$cache"
}
run_point 600  --batch 4 --k 1
run_point 600  --batch 2 --k 8
run_point 900  --batch 4 --k 4
run_point 1200 --batch 4 --k 8 --no-cam
run_point 1200 --batch 4 --k 8 --no-dcn
run_point 1200 --batch 4 --k 8 --remat
run_point 1500 --batch 4 --k 8
echo "# bisect complete $(date -u +%H:%M:%S)" >> "$OUT"
