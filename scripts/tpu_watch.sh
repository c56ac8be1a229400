#!/bin/bash
# Poll the tunnel relay; fire the measurement queue once it returns.
while true; do
  if ss -tln | grep -q ':808'; then
    echo "$(date -u +%FT%TZ) tunnel up — firing queue" >> /tmp/tpu_watch.log
    bash /root/repo/scripts/measurement_queue.sh >> /tmp/tpu_watch.log 2>&1
    echo "$(date -u +%FT%TZ) queue done" >> /tmp/tpu_watch.log
    break
  fi
  sleep 60
done
