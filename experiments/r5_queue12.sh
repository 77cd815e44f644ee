#!/bin/bash
# Round-5 serial device queue, part 12: e2e metrics-lag A/B.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q12 $(date +%H:%M:%S)] $*"; echo "[r5q12 $(date +%H:%M:%S)] $*" >> "$LOG"; }
run() {
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

while ! grep -q "QUEUE11 DONE" /tmp/r5_queue11.log 2>/dev/null; do
  sleep 120
done

rm -rf /root/e2e_sdxl/ws
run e2e_train3 3600 env OT_METRICS_LAG=8 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse3 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse

say "QUEUE12 DONE"
