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

# Order: headline first (also warms the driver's bench compile cache),
# then the trace attribution + lever A/Bs, then the long FLD-capable
# quality run (restores the already-trained A/B pair from
# /tmp/quality_report), then the full sweep. attn_layout and
# geglu_blocks already produced valid numbers post-fix and are omitted.
runq timeout 2400 python bench.py > /tmp/bench_r4.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused > /tmp/trace_fused3.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused flash repeat dedup > /tmp/trace_dedup.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused flash subpixel > /tmp/trace_subpixel.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused flash_nat > /tmp/trace_flash_nat.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 24 fused flash_nat subpixel dedup > /tmp/trace_all_opts.log 2>&1
runq timeout 2400 env SUPERDIFF_BENCH_LEVERS=flash_nat,subpixel python bench.py > /tmp/bench_r4_levers.log 2>&1
runq timeout 9000 python scripts/quality_report.py --iters 10000 --out QUALITY.json > /tmp/quality_r4.log 2>&1
runq timeout 3600 python scripts/bench_all.py > /tmp/bench_all_r4.log 2>&1
echo QUEUE_DONE
