#!/bin/bash
# r5 chip session, window 4: validate the SHIPPED adaptive oversubscribed
# k cap end-to-end — knee sweep re-run (knee_<n> rows now measure the
# adaptive default; control_k8_100 leg forces the old fixed-8 behavior)
# then the mixed-load default leg (the escalation must NOT regress the
# file-burst regime the slack gate protects). Same discipline as
# tools_chip_runbook.sh: probe until healthy, bounded phases, probe
# between phases, abort on wedge.
# Run detached:  nohup bash tools_chip_runbook5.sh > /tmp/chip_runbook5.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/chip
mkdir -p $LOG

probe() {
  python - <<'EOF'
import json, threading, time, os
import numpy as np
import jax
box = {}
def run():
    try:
        t0 = time.time()
        v = float(np.asarray(jax.device_put(np.ones((8,), np.float32))).sum())
        box["ok"] = v; box["rtt_s"] = round(time.time() - t0, 2)
    except Exception as e:
        box["error"] = repr(e)
t = threading.Thread(target=run, daemon=True)
t.start(); t.join(150)
print(json.dumps({"alive": not t.is_alive(), **box}), flush=True)
os._exit(0 if "ok" in box else 4)
EOF
}

echo "=== $(date) probe until healthy ==="
rc=4
for i in $(seq 1 6); do
  probe
  rc=$?
  if [ $rc -eq 0 ]; then echo "HEALTHY at $(date)"; break; fi
  echo "wedged (probe $i) at $(date); sleeping 10 min"
  sleep 600
done
if [ $rc -ne 0 ]; then echo "EPOCH NEVER RECOVERED"; exit 4; fi

run_phase() {  # run_phase <name> <timeout_s> <cmd...>
  name=$1; tmo=$2; shift 2
  echo "=== $(date) $name ==="
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  echo "rc=$? tail: $(tail -1 "$LOG/$name.log" | cut -c1-300)"
  probe || { echo "EPOCH WEDGED AFTER $name — aborting remaining phases"; exit 5; }
}

run_phase knee_shipped 4200 python -m sonicscribe_tpu.tools.bench_scale --skip-file --skip-streams
run_phase mixed_shipped 3000 python -m sonicscribe_tpu.tools.bench_mixed

echo "=== $(date) DONE ==="
