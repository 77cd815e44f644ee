#!/bin/bash
# TPU-pool-return watcher (r3, during the 2026-08-17 pool outage).
#
# Polls the accelerator backend every 3 min; when it answers, runs the
# validations queued behind the outage (BASELINE.md 2026-08-18 row):
#   1. bench --extra sd3      — validate the corrected dots_nb_attn default
#   2. bench --extra hunyuan  — the isolated Hunyuan extra
#   3. fp8-activations A/B    — OT_FP8_ACTS=dynamic vs off on the SDXL
#      headline stage (ops/fp8_acts.py, measurement queued in STATUS §2.6)
#   4. full bench.py          — the round-end contract line
# Results append to experiments/pool_watch_log.txt. Exits after the run,
# or at the deadline if the pool never returns.
set -u
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=experiments/pool_watch_log.txt
DEADLINE=$(( $(date +%s) + ${POOL_WATCH_BUDGET_S:-2700} ))

probe() {
    timeout 150 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
assert jax.devices()[0].platform != "cpu"
EOF
}

echo "[$(date -u +%FT%TZ)] watcher start (deadline in $((DEADLINE - $(date +%s)))s)" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if probe; then
        echo "[$(date -u +%FT%TZ)] POOL BACK — running queued validations" >> "$LOG"
        {
            echo "--- sd3 extra (dots_nb_attn default)"
            timeout 3000 python bench.py --extra sd3
            echo "--- hunyuan extra"
            timeout 3000 python bench.py --extra hunyuan
            echo "--- sdxl fp8-acts A/B: baseline (acts off)"
            timeout 3600 python bench.py --extra sdxl_fp8
            echo "--- sdxl fp8-acts A/B: OT_FP8_ACTS=dynamic"
            OT_FP8_ACTS=dynamic timeout 3600 python bench.py --extra sdxl_fp8
            echo "--- full bench.py"
            timeout 5400 python bench.py
        } >> "$LOG" 2>&1
        echo "[$(date -u +%FT%TZ)] validations done" >> "$LOG"
        exit 0
    fi
    echo "[$(date -u +%FT%TZ)] pool still down" >> "$LOG"
    sleep 180
done
echo "[$(date -u +%FT%TZ)] deadline reached, pool never returned" >> "$LOG"
