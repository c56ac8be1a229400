#!/bin/bash
# Round-4d measurement queue: latent-batch sweep of the promoted defaults
# (batch 8 was tuned before flash_eo/pipe2/subpixel moved the cost ratios),
# then the FLD-fixed quality report (pool_mixed row was INVALID in the last
# run; scoring fixed in scripts/quality_report.py — commit 12a1620).
# Same lock protocol as scripts/measurement_queue.sh.
set -x
cd /root/repo
export TPU_LOCK_HELD=1

OWNED=0
TOUCHER=
cleanup() {
  [ -n "$TOUCHER" ] && kill "$TOUCHER" 2>/dev/null
  [ "$OWNED" = 1 ] && rmdir /tmp/tpu_lock 2>/dev/null
}
trap cleanup EXIT INT TERM

acquire() {
  for i in $(seq 1 120); do
    if mkdir /tmp/tpu_lock 2>/dev/null; then OWNED=1; return 0; fi
    sleep 15
  done
  OWNED=0
  return 0
}
release() {
  [ -n "$TOUCHER" ] && kill "$TOUCHER" 2>/dev/null
  TOUCHER=
  if [ "$OWNED" = 1 ]; then rmdir /tmp/tpu_lock 2>/dev/null; OWNED=0; fi
}
runq() {
  acquire
  if [ "$OWNED" = 1 ]; then
    touch /tmp/tpu_lock 2>/dev/null
    ( while [ -d /tmp/tpu_lock ] && kill -0 $$ 2>/dev/null; do
        touch /tmp/tpu_lock 2>/dev/null; sleep 60; done ) &
    TOUCHER=$!
  fi
  "$@"
  release
}

runq timeout 2400 env SUPERDIFF_BENCH_LEVERS=batch12 python bench.py > /tmp/bench_r4d_batch12.log 2>&1
runq timeout 2400 env SUPERDIFF_BENCH_LEVERS=batch16 python bench.py > /tmp/bench_r4d_batch16.log 2>&1
# FLD-fixed quality table (pool_mixed row rerun; ~60-90 min)
runq timeout 7200 python scripts/quality_report.py > /tmp/quality_r4d.log 2>&1
echo QUEUE_DONE
