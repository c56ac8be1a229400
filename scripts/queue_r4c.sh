#!/bin/bash
# Round-4c measurement queue: the promoted defaults (flash_eo + subpixel +
# dedup + pipe2 long-attention kernel + FFN pipe2) on the chip.
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

# new-default trace (per-category device times for STATUS)
runq timeout 2400 python scripts/trace_unet.py 24 fused flash_eo subpixel dedup > /tmp/trace_r4c_default.log 2>&1
# new-default headline
runq timeout 2400 python bench.py > /tmp/bench_r4c_default.log 2>&1
# isolate the pipe2 long-kernel contribution at headline level
runq timeout 2400 env SUPERDIFF_BENCH_LEVERS=long_1block python bench.py > /tmp/bench_r4c_long1block.log 2>&1
echo QUEUE_DONE
