#!/bin/bash
# Round-5 serial device queue, part 2 (continues r5_queue.sh from where
# the session cut it off after hy_folded). One v5e chip; each point a
# fresh process. Logs to experiments/sweep_log.txt.
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

# 1b. complete the Hunyuan A/B: stock per-head flash (folded landed 0.761)
run hy_stock 1800 env OT_NO_FLASH_FOLDED=1 python experiments/exp_hunyuan_bench.py 9 512 full

# 2. SDXL folded batch-size sweep (VERDICT r4 next #1): bs8 first
run sdxl_bs8 2400 python experiments/exp_sdxl_bs_folded.py 8

# 3. On-device profiler trace of the headline bs4 step (warm cache)
run profile_bs4 1800 python experiments/exp_profile_headline.py 4

# 4. End-to-end shipped-trainer throughput (VERDICT r4 next #3).
#    prep already ran (artifacts under /root/e2e_sdxl); train on TPU,
#    then parse the TB event wall-times on CPU.
run e2e_train 3600 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse

# 5. FLUX int8 depth bisect (VERDICT r4 next #5): full-depth int8 is the
#    known failure; probe half depth, then quarter
run flux_int8_half 2400 env OT_EXP_LD=9 OT_EXP_LS=19 python experiments/exp_flux_dev.py int8 1 512
run flux_int8_quarter 2400 env OT_EXP_LD=4 OT_EXP_LS=9 python experiments/exp_flux_dev.py int8 1 512

# 6. padded-to-128 micro A/B (d=80 SD1.5 32x32 level) — decides whether
#    that slot's opt-in should flip too
run sd15_32_micro 1200 python experiments/exp_flash_folded.py sd15_32

say "QUEUE2 DONE"
