"""The driver-facing bench contract: `python bench.py` prints ONE JSON
line with metric/value/unit/vs_baseline, assembling per-stage subprocess
results (bench.py `_run_isolated`; stages faked via OT_BENCH_FAKE so no
accelerator is needed). Guards the r3 subprocess-isolation refactor: a
stage failure must degrade to an "error: ..." field, never take down the
line."""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")

FAKE = {
    "sdxl_fp8": [4.551, 17.67e12, 0.8789, 4.9e11],
    "sdxl_bf16": 4.215,
    "sd15": [32.028, 3.02e12],
    "vae": 144.653,
    "sd3": 2.358,
    "hunyuan": 0.729,
}


def _run(fake):
    env = dict(os.environ)
    env["OT_BENCH_FAKE"] = json.dumps(fake)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.strip().splitlines() if ln]
    assert len(lines) == 1, lines
    return json.loads(lines[0])


def test_bench_emits_one_json_line_with_contract_fields():
    out = _run(FAKE)
    assert out["metric"] == "sdxl_lora_train_imgs_per_sec_per_chip_1024px"
    assert out["value"] == 4.551
    assert out["unit"] == "images/sec/chip"
    assert 0 < out["vs_baseline"] < 10
    assert out["sd3_lora_1024_bs2_imgs_per_sec"] == 2.358
    assert out["hunyuan_half_512_f9_samples_per_sec"] == 0.729
    # derived metrics present when the headline stage reports flops
    assert out["sdxl_hw_flop_utilization_v5e"] > 0
    assert out["sdxl_hbm_roofline_fraction"] > 0


def test_bench_failed_stage_degrades_to_error_field():
    fake = {k: v for k, v in FAKE.items() if k not in ("sd3", "hunyuan")}
    out = _run(fake)
    assert out["value"] == 4.551
    assert str(out["sd3_lora_1024_bs2_imgs_per_sec"]).startswith("error")
    assert str(
        out["hunyuan_half_512_f9_samples_per_sec"]).startswith("error")


def test_bench_survives_missing_cost_analysis():
    fake = dict(FAKE, sdxl_fp8=[4.551, None, 0.8789, None], sd15=[32.0, None])
    out = _run(fake)
    # falls back to the pinned analytic anchor
    assert 0 < out["vs_baseline"] < 10
    assert "sdxl_hw_flop_utilization_v5e" not in out
