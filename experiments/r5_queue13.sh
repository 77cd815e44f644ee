#!/bin/bash
# Round-5 serial device queue, part 13: corrected timing reruns
# (queue11's folded sweep still used lazy block_until_ready).
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q13 $(date +%H:%M:%S)] $*"; echo "[r5q13 $(date +%H:%M:%S)] $*" >> "$LOG"; }
run() {
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

while ! grep -q "QUEUE12 DONE" /tmp/r5_queue12.log 2>/dev/null; do
  sleep 120
done

run dedupe_probe2 900 python experiments/exp_dedupe_probe.py
run folded_blocks3_sdxl32 3600 python experiments/exp_folded_blocks.py sdxl32
run folded_blocks3_sdxl16 2400 python experiments/exp_folded_blocks.py sdxl16
# re-anchor one flash_folded case under the corrected timer so the
# historical folded-vs-stock ratios have a current-relay reference point
run flash_folded_sdxl32 2400 python experiments/exp_flash_folded.py sdxl32

say "QUEUE13 DONE"
