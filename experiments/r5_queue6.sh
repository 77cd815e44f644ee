#!/bin/bash
# Round-5 serial device queue, part 6: reruns after the jit-capture fix.
# The queue5 e2e_train broken-pipe root cause was encoder params captured
# as jit closure constants (GB-scale HLO literals through the remote
# compile helper); fixed in 9634b9f. flux int8 probes were building the
# scan model at full depth (also fixed). vmem64 A/B: LIBTPU_INIT_ARGS
# only (the flag is not an XLA_FLAGS flag).
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q6 $(date +%H:%M:%S)] $*"; echo "[r5q6 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

# 1. e2e shipped-trainer throughput (VERDICT r4 next #3) — fresh ws so
#    parse reads only this run's TB events
rm -rf /root/e2e_sdxl/ws
run e2e_train 5400 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse

# 2. FLUX int8 compile-failure depth bisect (VERDICT r4 next #5)
run flux_int8_d2 1500 env OT_EXP_LD=2 OT_EXP_LS=4 python experiments/exp_flux_dev.py int8
run flux_int8_d10 1800 env OT_EXP_LD=10 OT_EXP_LS=19 python experiments/exp_flux_dev.py int8
run flux_int8_d14 2100 env OT_EXP_LD=14 OT_EXP_LS=28 python experiments/exp_flux_dev.py int8
run flux_int8_full 2400 python experiments/exp_flux_dev.py int8

# 3. scoped-VMEM limit A/B on the headline (deeper weight prefetch)
run sdxl_vmem64 2400 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 python experiments/exp_sdxl_bs_folded.py 4

say "QUEUE6 DONE"
