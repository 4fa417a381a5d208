#!/bin/bash
# r5 chip session, window 3: the phases that never recorded — window 2's
# runbook logs were lost to a host restart and SCALE/WARMUP/SPEC still carry
# r4 recordings. Same discipline as tools_chip_runbook.sh: probe until
# healthy, run each phase bounded, probe between phases, abort on wedge.
# Run detached:  nohup bash tools_chip_runbook4.sh > /tmp/chip_runbook4.log 2>&1 &
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

run_phase knee 3600 python -m sonicscribe_tpu.tools.bench_scale --skip-file --skip-streams
run_phase spec 3000 python -m sonicscribe_tpu.tools.bench_spec
run_phase warmup 4500 python -m sonicscribe_tpu.tools.bench_warmup

echo "=== $(date) DONE ==="
