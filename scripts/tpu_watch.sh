#!/bin/bash
# Poll the tunnel relay; fire the measurement queue once it returns.
# Match the relay's actual listening sockets (127.0.0.1, the port set from
# /root/.tpu_init.py) — a bare ':808' substring would false-positive on any
# unrelated listener and fire the multi-hour queue into a dead attach.
PORTS='127\.0\.0\.1:(8082|8083|8087|8092|8093|8097|8102|8103|8107|8112|8113|8117)$'
while true; do
  if ss -tln | awk '{print $4}' | grep -Eq "$PORTS"; then
    echo "$(date -u +%FT%TZ) tunnel up — firing queue" >> /tmp/tpu_watch.log
    bash /root/repo/scripts/measurement_queue.sh >> /tmp/tpu_watch.log 2>&1
    echo "$(date -u +%FT%TZ) queue done" >> /tmp/tpu_watch.log
    break
  fi
  sleep 60
done
