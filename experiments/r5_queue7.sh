#!/bin/bash
# Round-5 serial device queue, part 7: chained after queue6.
# Folded-kernel backward block-size sweep (the last unmeasured headline
# lever from the r5 trace decomposition), then a warm full bench to
# re-confirm the headline and leave .jax_cache hot for the driver.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q7 $(date +%H:%M:%S)] $*"; echo "[r5q7 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

# wait for queue6 to release the chip
while ! grep -q "QUEUE6 DONE" /tmp/r5_queue6.log 2>/dev/null; do
  sleep 120
done

run folded_blocks_sdxl32 3600 python experiments/exp_folded_blocks.py sdxl32
run folded_blocks_sdxl16 2400 python experiments/exp_folded_blocks.py sdxl16

say "QUEUE7 DONE"
