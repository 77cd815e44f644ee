#!/bin/bash
cd /root/repo
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:$PYTHONPATH
echo "=== sd3 bench bs4 $(date +%H:%M:%S) ===" >> experiments/sweep_log.txt
timeout 1800 python experiments/exp_sd3_bench.py 4 >> experiments/sweep_log.txt 2>&1 || echo "FAILED rc=$?" >> experiments/sweep_log.txt
