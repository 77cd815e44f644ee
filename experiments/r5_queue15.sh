#!/bin/bash
# Round-5 serial device queue, part 15: final full bench — lands the
# complete artifact under the new block policy and leaves every stage's
# graph warm in .jax_cache for the driver's round-end run.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q15 $(date +%H:%M:%S)] $*"; echo "[r5q15 $(date +%H:%M:%S)] $*" >> "$LOG"; }
run() {
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

run bench_final 7200 env OT_BENCH_BUDGET=6600 python bench.py

say "QUEUE15 DONE"
