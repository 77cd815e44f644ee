#!/bin/bash
# Round-5 serial device queue, part 5: fresh-VM restart of queue4.
# The VM recycled between sessions — .jax_cache and /tmp are gone, so
# every compile below is cold. Order: (1) full bench run to re-warm the
# exact committed bench configs AND land numbers, (2) profiler trace +
# analytic floor riding the warm cache, (3) micro A/Bs, (4) e2e shipped
# trainer, (5) FLUX int8 depth bisect.
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
LOG=experiments/sweep_log.txt
say() { echo "[r5q5 $(date +%H:%M:%S)] $*"; echo "[r5q5 $(date +%H:%M:%S)] $*" >> "$LOG"; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  say "=== $tag: $*"
  timeout "$to" "$@" > /tmp/r5_$tag.out 2> /tmp/r5_$tag.err
  local rc=$?
  tail -c 2500 /tmp/r5_$tag.out >> "$LOG"
  say "$tag rc=$rc"
  tail -3 /tmp/r5_$tag.out
}

# 1. full bench, generous budget: re-warms .jax_cache for every
#    committed stage (headline + 5 extras) and lands cold-VM numbers
run bench_full 7200 env OT_BENCH_BUDGET=6600 python bench.py

# 2. profiler trace of the headline step (compile-cache hit from step 1)
run profile_bs4 1800 python experiments/exp_profile_headline.py 4

# 3. analytic per-kernel roofline floor (bs4 headline, 0.798 s measured)
run floor_bs4 1800 python experiments/exp_roofline_floor.py tx_only 4 0.798

# 4. SD1.5 32x32-level micro A/B (d=80 -> 128-slot padded fold, opt-in)
run sd15_32_micro 1200 python experiments/exp_flash_folded.py sd15_32

# 5. scoped-VMEM limit A/B on the headline (deeper weight prefetch):
#    64 MiB vs default — different flags -> cold compile, budget wide
run sdxl_vmem64 2400 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python experiments/exp_sdxl_bs_folded.py 4

# 6. e2e shipped-trainer throughput (prep ran on CPU in parallel; wait)
while [ ! -f /root/e2e_sdxl/config.json ]; do
  say "waiting for e2e prep..."; sleep 60
done
run e2e_train 3600 python scripts/train.py --config-path /root/e2e_sdxl/config.json
run e2e_parse 300 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python experiments/exp_e2e_train.py parse

# 7. FLUX int8 compile-failure depth bisect (VERDICT r4 next #5):
#    full scale (19/38) fails in the remote-compile helper; find whether
#    the failure is scale-dependent or int8-specific. NF4 19/38 compiles
#    (15.5 min, r3) — so a SMALL int8 success = scale-dependent.
run flux_int8_d2 1500 env OT_EXP_LD=2 OT_EXP_LS=4 python experiments/exp_flux_dev.py int8
run flux_int8_d10 1800 env OT_EXP_LD=10 OT_EXP_LS=19 python experiments/exp_flux_dev.py int8
run flux_int8_d14 1800 env OT_EXP_LD=14 OT_EXP_LS=28 python experiments/exp_flux_dev.py int8

say "QUEUE5 DONE"
