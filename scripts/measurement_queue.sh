#!/bin/bash
# Serialized TPU work queue, holding the cooperative one-TPU-process lock
# (/tmp/tpu_lock, also honored by bench.py) around every chip-touching run.
# A background toucher refreshes the lock mtime so a long holder (the 2.5h
# quality run) is never mistaken for a wedged process and stolen by bench.
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
  # 30 min without the lock: proceed anyway (never skip measurements), but
  # do NOT touch or release a lock some other live process owns.
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
    # refresh mtime while our command runs; dies with the queue (trap) or
    # when the lock is gone
    ( while [ -d /tmp/tpu_lock ] && kill -0 $$ 2>/dev/null; do
        touch /tmp/tpu_lock 2>/dev/null; sleep 60; done ) &
    TOUCHER=$!
  fi
  "$@"
  release
}

# Round-4b sequence (the first r4 queue — headline, lever traces,
# FLD-capable quality run, full sweep — completed 2026-08-19 06:37):
# A/B the two post-queue kernel changes (FMA-only exact-gelu polynomial;
# the flash_eo einsum-layout attention lever), then the single-lever
# headlines the first queue did not cover.
runq timeout 2400 python bench.py > /tmp/bench_r4b.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused flash repeat dedup > /tmp/trace_dedup_gelupoly.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused flash_eo repeat dedup > /tmp/trace_flash_eo.log 2>&1
runq timeout 2400 env SUPERDIFF_BENCH_LEVERS=flash_eo python bench.py > /tmp/bench_flash_eo.log 2>&1
runq timeout 2400 env SUPERDIFF_BENCH_LEVERS=subpixel python bench.py > /tmp/bench_subpixel.log 2>&1
echo QUEUE_DONE
