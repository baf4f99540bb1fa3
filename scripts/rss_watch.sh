#!/bin/bash
# Poll RSS of the train_eval_sparse process (when running) every 60s.
OUT=/root/repo/logs/rss_tpu_agp.jsonl
for i in $(seq 1 400); do
  PID=$(ps -eo pid,cmd | grep "[p]ython examples/train_eval_sparse" | grep -v timeout | awk "{print \$1}" | head -1)
  if [ -n "$PID" ]; then
    RSS=$(awk '/VmRSS/{print int($2/1024)}' /proc/$PID/status 2>/dev/null)
    [ -n "$RSS" ] && echo "{\"t\": \"$(date +%T)\", \"pid\": $PID, \"rss_mb\": $RSS}" >> "$OUT"
  fi
  sleep 60
done
