#!/bin/bash
# Round-5 serial device queue (one v5e chip; each point a fresh process).
# Logs JSON lines to experiments/sweep_log.txt and progress to stdout.
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

# 1. HunyuanVideo bench stage A/B: folded d128 + q-streaming dkv default
#    vs stock per-head flash (VERDICT r4 next #2)
run hy_folded 2400 python experiments/exp_hunyuan_bench.py 9 512 full
run hy_stock 1200 env OT_NO_FLASH_FOLDED=1 python experiments/exp_hunyuan_bench.py 9 512 full

# 2. SDXL folded batch-size sweep (VERDICT r4 next #1): bs8 first
run sdxl_bs8 2400 python experiments/exp_sdxl_bs_folded.py 8

# 3. On-device profiler trace of the headline bs4 step (warm cache)
run profile_bs4 1800 python experiments/exp_profile_headline.py 4

# 4. FLUX int8 depth bisect (VERDICT r4 next #5): full-depth int8 is the
#    known failure; probe half depth, then quarter
run flux_int8_half 2400 env OT_EXP_LD=9 OT_EXP_LS=19 python experiments/exp_flux_dev.py int8 1 512
run flux_int8_quarter 2400 env OT_EXP_LD=4 OT_EXP_LS=9 python experiments/exp_flux_dev.py int8 1 512

# 5. padded-to-128 micro A/B (d=80 SD1.5 32x32 level) — decides whether
#    that slot's opt-in should flip too
run sd15_32_micro 1200 python experiments/exp_flash_folded.py sd15_32

say "QUEUE DONE"
