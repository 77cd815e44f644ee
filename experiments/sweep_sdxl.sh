#!/bin/bash
# Serial SDXL remat sweep on the real chip; one subprocess per point so
# HBM is clean. Appends JSON lines + errors to experiments/sweep_log.txt
cd /root/repo
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
for args in "$@"; do
  echo "=== $args $(date +%H:%M:%S) ===" >> experiments/sweep_log.txt
  timeout 1800 python experiments/exp_sdxl_remat.py $args \
    >> experiments/sweep_log.txt 2>&1 || echo "FAILED rc=$?" >> experiments/sweep_log.txt
done
echo "=== sweep done $(date +%H:%M:%S) ===" >> experiments/sweep_log.txt
