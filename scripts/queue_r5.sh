#!/bin/bash
# Round-5 serialized chip measurements (VERDICT r4 items #2, #7, #9, #1/#3/#5).
# Same lock protocol as measurement_queue.sh; run AFTER the headline bench.
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

# (a) batch-scaling traces for the batch-8 peak explanation (#9):
# 36 and 48 forward-batch = latent batch 12 / 16 under dedup
runq timeout 2400 python scripts/trace_unet.py 36 fused flash_eod subpixel dedup > /tmp/trace_b36.log 2>&1
runq timeout 2400 python scripts/trace_unet.py 48 fused flash_eod subpixel dedup > /tmp/trace_b48.log 2>&1
# (b) protein composition trace + batch sweep (#7)
runq timeout 2400 python scripts/trace_protein.py 100 51 > /tmp/trace_protein.log 2>&1
runq timeout 3600 python scripts/bench_protein_batch.py 100 > /tmp/protein_batch.log 2>&1
# (c) at-scale FrameDiff training (#2)
runq timeout 7200 python scripts/train_framediff_scale.py --iters 2000 > /tmp/fd_scale.log 2>&1
# (d) quality protocol with the ODE matrix + IS (#1/#3/#5) — the long one
runq timeout 14400 python scripts/quality_report.py > /tmp/quality_r5.log 2>&1
echo QUEUE_R5_DONE
