#!/bin/bash
# Poll the TPU tunnel until a 90-second RTT probe succeeds, then exec the
# given command (e.g. a queue script). Used to ride out tunnel outages
# without burning per-entry timeouts: the probe is tiny (device_put + fetch
# of one scalar), so a pass means the fetch path is genuinely healthy.
cd /root/repo
log=${R3_LOG:-/tmp/r3_exp.log}
echo "=== $(date) wait_tunnel: polling until the fetch path answers ===" >> "$log"
n=0
while true; do
  n=$((n+1))
  if timeout 90 env RTT_REPS=3 python scripts/probe_rtt.py >> "$log" 2>&1; then
    echo "=== $(date) wait_tunnel: healthy after $n probes — launching: $* ===" >> "$log"
    exec "$@"
  fi
  echo "--- $(date) wait_tunnel: probe $n failed/hung, retrying in 120 s ---" >> "$log"
  sleep 120
done
