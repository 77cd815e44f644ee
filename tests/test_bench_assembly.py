"""The driver-facing bench contract: `python bench.py` prints complete
JSON lines with metric/value/unit/vs_baseline, assembling per-stage
subprocess results (bench.py `_run_isolated`; stages faked via
OT_BENCH_FAKE so no accelerator is needed).

r4 restructure (VERDICT r3 weak #1 — BENCH_r03.json was rc=124/empty):
the headline line is emitted BEFORE any extra stage runs and re-emitted
cumulatively after each stage, so a driver timeout mid-extras still
leaves a parseable headline in the tail. Every emitted line must be
independently parseable and carry the contract fields; the LAST line is
the fullest. A stage failure degrades to an "error: ..." field; a
stage foreclosed by the global budget reports "skipped_budget"."""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")

FAKE = {
    "sdxl_fp8": {"imgs_per_sec": 4.551,
                 "imgs_per_sec_mean_of_chunks": 4.49,
                 "flops_per_img": 17.67e12, "sec_per_step": 0.8789,
                 "hbm_bytes": 4.9e11, "setup_seconds": 12.3,
                 "chunk_spread_pct": 1.4},
    "sdxl_bf16": 4.215,
    "sd15": [32.028, 3.02e12],
    "vae": 144.653,
    "sd3": 2.358,
    "hunyuan": 0.729,
}


def _run(fake, budget=None):
    env = dict(os.environ)
    env["OT_BENCH_FAKE"] = json.dumps(fake)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    if budget is not None:
        env["OT_BENCH_BUDGET"] = str(budget)
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr
    lines = [json.loads(ln) for ln in r.stdout.strip().splitlines() if ln]
    assert len(lines) >= 1, r.stdout
    return lines


def test_bench_every_line_parseable_headline_first():
    lines = _run(FAKE)
    # one line after the headline + one per extra stage
    assert len(lines) == 6, [ln.keys() for ln in lines]
    for ln in lines:
        assert ln["metric"] == "sdxl_lora_train_imgs_per_sec_per_chip_1024px"
        assert ln["value"] == 4.551
        assert ln["unit"] == "images/sec/chip"
        assert 0 < ln["vs_baseline"] < 10
    # the first line lands before any extra stage has run
    assert lines[0]["sd3_lora_1024_bs2_imgs_per_sec"] == "skipped_budget"
    assert lines[0]["sdxl_hw_flop_utilization_v5e"] > 0
    assert lines[0]["sdxl_hbm_roofline_fraction"] > 0


def test_bench_last_line_is_fullest():
    out = _run(FAKE)[-1]
    assert out["value"] == 4.551
    assert out["sd15_lora_512_bs4_imgs_per_sec"] == 32.028
    assert out["vae_latent_cache_512_bs8_imgs_per_sec"] == 144.653
    assert out["sdxl_bf16_base_imgs_per_sec"] == 4.215
    assert out["sd3_lora_1024_bs2_imgs_per_sec"] == 2.358
    assert out["hunyuan_half_512_f9_samples_per_sec"] == 0.729
    assert out["sd15_hw_flop_utilization_v5e_padded"] > 0
    assert out["sdxl_setup_seconds"] == 12.3
    assert out["sdxl_chunk_spread_pct"] == 1.4


def test_bench_failed_stage_degrades_to_error_field():
    fake = {k: v for k, v in FAKE.items() if k not in ("sd3", "hunyuan")}
    out = _run(fake)[-1]
    assert out["value"] == 4.551
    assert str(out["sd3_lora_1024_bs2_imgs_per_sec"]).startswith("error")
    assert str(
        out["hunyuan_half_512_f9_samples_per_sec"]).startswith("error")


def test_bench_survives_missing_cost_analysis():
    fake = dict(FAKE, sdxl_fp8=dict(FAKE["sdxl_fp8"], flops_per_img=None,
                                hbm_bytes=None), sd15=[32.0, None])
    out = _run(fake)[-1]
    # falls back to the pinned analytic anchor
    assert 0 < out["vs_baseline"] < 10
    assert "sdxl_hw_flop_utilization_v5e" not in out


def test_bench_budget_forecloses_extras_as_skipped():
    # budget only just covers probe + headline: every extra must be
    # reported as skipped_budget, and the headline must still land
    out = _run(FAKE, budget=0)[-1]
    assert out["value"] == 4.551
    assert out["sd15_lora_512_bs4_imgs_per_sec"] == "skipped_budget"
    assert out["sd3_lora_1024_bs2_imgs_per_sec"] == "skipped_budget"
    assert out["hunyuan_half_512_f9_samples_per_sec"] == "skipped_budget"
