#!/bin/bash
# Round-5 serial device queue, part 3 (continues r5_queue2.sh — hy_stock
# landed; sdxl_bs8 failed on the since-fixed unpack; everything after
# never ran). One v5e chip; each point a fresh process.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q $(date +%H:%M:%S)] $*"; echo "[r5q $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2000 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

# 1. SDXL folded batch-size sweep (VERDICT r4 next #1) — compile cache
#    for bs8 is warm from the failed run; bs2 for the full curve
run sdxl_bs8 2400 python experiments/exp_sdxl_bs_folded.py 8
run sdxl_bs2 2400 python experiments/exp_sdxl_bs_folded.py 2

# 2. On-device profiler trace of the headline bs4 step (warm cache)
run profile_bs4 1800 python experiments/exp_profile_headline.py 4

# 3. End-to-end shipped-trainer throughput (VERDICT r4 next #3).
#    prep already ran (artifacts under /root/e2e_sdxl); train on TPU,
#    then parse the TB event wall-times on CPU.
run e2e_train 3600 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse

# 4. FLUX int8 depth bisect (VERDICT r4 next #5): full-depth int8 is the
#    known failure; probe half depth, then quarter
run flux_int8_half 2400 env OT_EXP_LD=9 OT_EXP_LS=19 python experiments/exp_flux_dev.py int8 1 512
run flux_int8_quarter 2400 env OT_EXP_LD=4 OT_EXP_LS=9 python experiments/exp_flux_dev.py int8 1 512

say "QUEUE3 DONE"
