#!/bin/bash
# Round-5 serial device queue, part 9: consolidated remainder
# (replaces the killed queue7/queue8 watchers). Chained after queue6.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q9 $(date +%H:%M:%S)] $*"; echo "[r5q9 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

while ! grep -q "QUEUE6 DONE" /tmp/r5_queue6.log 2>/dev/null; do
  sleep 120
done

# 1. ground-truth the e2e row: blocked timing + cost analysis of the
#    shipped trainer's compiled step (TB-gap cadence said 0.363 s/step,
#    which is below the bench workload's measured roofline floors)
run e2e_cost 3600 python experiments/exp_e2e_cost.py

# 2. folded-kernel backward block-size sweep (last unmeasured headline lever)
run folded_blocks_sdxl32 3600 python experiments/exp_folded_blocks.py sdxl32
run folded_blocks_sdxl16 2400 python experiments/exp_folded_blocks.py sdxl16

# 3. on-device sampling probe (sampler jit carried the whole UNet as HLO
#    literals before 9634b9f; 4 steps @512 proves the path on real TPU)
run sample_device 2400 python scripts/sample.py \
  --model-type STABLE_DIFFUSION_XL_10_BASE \
  --base-model-name /root/e2e_sdxl/ckpt \
  --prompt "a calibration pattern" --destination /tmp/sample_device.png \
  --steps 4 --width 512 --height 512

# 4. final warm full bench: re-confirm headline, leave .jax_cache hot
run bench_warm 3000 env OT_BENCH_BUDGET=2700 python bench.py

say "QUEUE9 DONE"
