#!/bin/bash
# Round-5 serial device queue, part 8: chained after queue7.
# (1) On-device sampling probe — scripts/sample.py with the full-size
#     SDXL checkpoint; before 9634b9f the sampler jit carried the whole
#     UNet as HLO literals and could not compile through the remote
#     helper at all. 4 steps @512 proves the production sampling path
#     on real TPU.
# (2) Final warm full bench — re-confirms the headline post-changes and
#     leaves .jax_cache hot for the driver's round-end run.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q8 $(date +%H:%M:%S)] $*"; echo "[r5q8 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

while ! grep -q "QUEUE7 DONE" /tmp/r5_queue7.log 2>/dev/null; do
  sleep 120
done

run sample_device 2400 python scripts/sample.py \
  --model-type STABLE_DIFFUSION_XL_10_BASE \
  --base-model-name /root/e2e_sdxl/ckpt \
  --prompt "a calibration pattern" --destination /tmp/sample_device.png \
  --steps 4 --width 512 --height 512

run bench_warm 3000 env OT_BENCH_BUDGET=2700 python bench.py

say "QUEUE8 DONE"
