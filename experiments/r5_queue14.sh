#!/bin/bash
# Round-5 serial device queue, part 14: headline/sd15 A/B under the new
# folded block policy, then the final full bench for the driver window.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q14 $(date +%H:%M:%S)] $*"; echo "[r5q14 $(date +%H:%M:%S)] $*" >> "$LOG"; }
run() {
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

# headline stage with the new blocks (cold compile for the new kernels)
run sdxl_newblocks 2400 python experiments/exp_sdxl_bs_folded.py 4
# sd15 stage A/B (new blocks at the 32x32 level)
run sd15_newblocks 2400 python bench.py --extra sd15
# hunyuan guard: d=128 path must be unchanged/green
run hunyuan_guard 2400 python bench.py --extra hunyuan

say "QUEUE14 DONE"
