#!/bin/bash
# Round-5 serial device queue, part 10: the REAL e2e trainer measurement.
# queue6's e2e row (11.0 imgs/sec) measured a forward-only step — the
# quantized-base adapter-init bug (fixed in 0da88d5) had emptied the
# trainable tree and XLA pruned the backward. Rerun the shipped trainer
# with real gradients, then re-validate with the cost probe.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q10 $(date +%H:%M:%S)] $*"; echo "[r5q10 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

while ! grep -q "QUEUE9 DONE" /tmp/r5_queue9.log 2>/dev/null; do
  sleep 120
done

rm -rf /root/e2e_sdxl/ws
run e2e_train2 5400 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse2 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse
run e2e_cost2 3600 python experiments/exp_e2e_cost.py

say "QUEUE10 DONE"
