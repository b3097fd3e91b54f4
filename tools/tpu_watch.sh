#!/bin/bash
# TPU tunnel watcher: probe a tiny matmul every 5 minutes; when the tunnel
# first answers, launch tools/tpu_queue.sh (the on-chip measurement queue)
# once in the background.  Survives /tmp wipes by living in the repo.
#
#   nohup bash tools/tpu_watch.sh >/dev/null 2>&1 & echo $! >/tmp/tpu_watch.pid
#
LOG=${TPU_WATCH_LOG:-/tmp/tpu_watch.log}
STAMP=${TPU_QUEUE_STAMP:-/tmp/tpu_queue.started}
cd /root/repo || exit 1
echo "$(date -u +%FT%TZ) watcher start (pid $$)" >>"$LOG"
while true; do
  if timeout 180 python tools/tpu_probe.py >>"$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) TPU UP" >>"$LOG"
    if [ ! -e "$STAMP" ]; then
      date -u +%FT%TZ >"$STAMP"
      nohup bash tools/tpu_queue.sh >/tmp/tpu_queue.out 2>&1 &
      echo "$(date -u +%FT%TZ) queue launched (pid $!)" >>"$LOG"
    fi
  else
    rc=$?  # capture before $(date) clobbers $?
    echo "$(date -u +%FT%TZ) TPU DOWN (probe rc=$rc)" >>"$LOG"
  fi
  sleep 300
done
