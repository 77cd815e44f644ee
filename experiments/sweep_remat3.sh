#!/bin/bash
# Serial remat-policy sweep (r3): SD3 attn-saving policies, SDXL tx_attn
# post-flash-fix, HunyuanVideo policies. One fresh process per point.
cd /root/repo
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
log=experiments/sweep_log.txt
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> $log
  timeout 2400 "$@" >> $log 2>&1 || echo "FAILED rc=$?" >> $log
}
run python experiments/exp_sd3_bench.py 2 dots_nb_attn fp8
run python experiments/exp_sd3_bench.py 2 attn fp8
run python experiments/exp_sd3_bench.py 4 dots_nb fp8
run python experiments/exp_sdxl_remat.py tx_attn 4 fp8
run python experiments/exp_hunyuan_bench.py 9 512 dots_nb
run python experiments/exp_hunyuan_bench.py 9 512 dots_nb_attn
echo "=== remat3 sweep done $(date +%H:%M:%S) ===" >> $log
