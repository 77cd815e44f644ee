#!/bin/bash
# Round-5 serial device queue, part 11: dedupe probe + corrected
# folded-kernel block sweep (queue9's sweep read 0.02 ms "kernels" —
# identical-input repeat dispatches are served from a cache by the
# remote execution service; timers now perturb operands per iteration).
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q11 $(date +%H:%M:%S)] $*"; echo "[r5q11 $(date +%H:%M:%S)] $*" >> "$LOG"; }
run() {
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

while ! grep -q "QUEUE10 DONE" /tmp/r5_queue10.log 2>/dev/null; do
  sleep 120
done

run dedupe_probe 900 python experiments/exp_dedupe_probe.py
run folded_blocks2_sdxl32 3600 python experiments/exp_folded_blocks.py sdxl32
run folded_blocks2_sdxl16 2400 python experiments/exp_folded_blocks.py sdxl16

say "QUEUE11 DONE"
