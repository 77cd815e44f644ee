#!/bin/bash
# Round-5 serial device queue, part 4: residual decomposition of the
# headline step + remaining micro A/Bs. Run after r5_queue3.sh.
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
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

# 1. profiler trace riding the bench stage itself (compile-cache hit)
run profile_bs4 1800 python experiments/exp_profile_headline.py 4

# 2. analytic per-kernel roofline floor (bs4 headline, measured 0.798 s)
run floor_bs4 1800 python experiments/exp_roofline_floor.py tx_only 4 0.798

# 3. SD1.5 32x32-level micro A/B (d=80 -> 128-slot padded fold, opt-in today)
run sd15_32_micro 1200 python experiments/exp_flash_folded.py sd15_32

# 4. scoped-VMEM limit A/B on the headline (deeper weight prefetch):
#    64 MiB vs the default — cold compile, so budgeted generously
run sdxl_vmem64 2400 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python experiments/exp_sdxl_bs_folded.py 4

# 5. e2e shipped-trainer throughput, retry (the 11:28 attempt died on a
#    remote-compile broken pipe during the lazy TE compile; VAE compile
#    is now cached, train.py now exits nonzero on crash)
run e2e_train 3600 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse

say "QUEUE4 DONE"
