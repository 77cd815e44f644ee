"""Analytic per-kernel roofline floor for the SDXL headline step
(VERDICT r4 next #1: decompose the ~30% non-HBM residual with evidence).

For every ENTRY instruction of the compiled step: bytes (hlo_bytes.py
parser, validated against XLA cost_analysis in r3/r4) and estimated MXU
FLOPs (hlo_bytes.estimate_flops — exact for dot/convolution inside
fusions, analytic-approximate for the flash custom calls). Three floors:

  floor_bw     = total_bytes / 819 GB/s      (perfect overlap, HBM-bound)
  floor_mxu    = total_flops / 197 TFLOP/s   (perfect overlap, MXU-bound)
  floor_serial = sum over kernels of max(bytes/BW, flops/peak)
                 (no DMA/compute overlap across kernels)

The measured step time must land in [max(bw, mxu), serial]; where it
lands says how much of the residual is per-kernel serialization (each
kernel alone under-utilizes whichever resource it doesn't bind on) vs
true waste. Also buckets the serial floor by binding so "X ms of the
step is MXU-bound kernel time, Y ms bandwidth-bound" is explicit.

Usage: python experiments/exp_roofline_floor.py [policy] [bs] [measured_s]
"""
from __future__ import annotations

import json
import os
import sys

V5E_BW = 819e9
V5E_PEAK = 197e12


def main():
    policy = sys.argv[1] if len(sys.argv) > 1 else "tx_only"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    measured_s = float(sys.argv[3]) if len(sys.argv) > 3 else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hlo_bytes import (bucket_of, estimate_flops,
                           parse_entry_instructions)

    hlo_file = os.environ.get("OT_HLO_FILE")
    if hlo_file:
        # offline mode: re-analyze a saved `compiled.as_text()` dump (the
        # device run writes /tmp/sdxl_step_hlo_bs{bs}.txt) without
        # rebuilding/compiling the step
        with open(hlo_file) as f:
            hlo = f.read()
        analysis = {}
    else:
        from exp_byte_attr import build_step
        step, state, frozen, batch, rng = build_step(policy, bs, "fp8")
        compiled = step.lower(state, frozen, batch, rng).compile()
        hlo = compiled.as_text()
        with open(f"/tmp/sdxl_step_hlo_bs{bs}.txt", "w") as f:
            f.write(hlo)
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]

    instrs = parse_entry_instructions(hlo)
    flops = estimate_flops(hlo)

    tot_bytes = sum(i["total_bytes"] for i in instrs)
    tot_flops = sum(flops.values())
    floor_bw = tot_bytes / V5E_BW
    floor_mxu = tot_flops / V5E_PEAK
    serial = 0.0
    bw_bound_time = mxu_bound_time = 0.0
    per_bucket = {}
    top = []
    for i in instrs:
        t_bw = i["total_bytes"] / V5E_BW
        t_mx = flops.get(i["name"], 0.0) / V5E_PEAK
        t = max(t_bw, t_mx)
        serial += t
        if t_mx > t_bw:
            mxu_bound_time += t
        else:
            bw_bound_time += t
        b = bucket_of(i)
        per_bucket[b] = per_bucket.get(b, 0.0) + t
        top.append((t, t_mx > t_bw, i))
    top.sort(key=lambda x: -x[0])
    out = {
        "policy": policy, "bs": bs,
        "xla_cost_tflops_no_customcalls": round(
            float(analysis.get("flops", 0)) / 1e12, 2),
        "parsed_total_gb": round(tot_bytes / 1e9, 1),
        "parsed_total_tflops_incl_flash_est": round(tot_flops / 1e12, 2),
        "floor_bw_ms": round(floor_bw * 1e3, 1),
        "floor_mxu_ms": round(floor_mxu * 1e3, 1),
        "floor_serial_ms": round(serial * 1e3, 1),
        "serial_bw_bound_ms": round(bw_bound_time * 1e3, 1),
        "serial_mxu_bound_ms": round(mxu_bound_time * 1e3, 1),
        "serial_by_bucket_ms": {k: round(v * 1e3, 1)
                                for k, v in sorted(per_bucket.items(),
                                                   key=lambda kv: -kv[1])},
        "n_kernels": len(instrs),
        "top_kernels": [
            {"ms": round(t * 1e3, 2),
             "bound": "mxu" if is_mxu else "bw",
             "opcode": i["opcode"],
             "gb": round(i["total_bytes"] / 1e9, 2),
             "tflops": round(flops.get(i["name"], 0.0) / 1e12, 3),
             "op_name": i["op_name"][-120:]}
            for t, is_mxu, i in top[:20]
        ],
    }
    if measured_s is not None:
        out["measured_step_ms"] = round(measured_s * 1e3, 1)
        out["measured_over_serial_floor"] = round(measured_s / serial, 3)
        out["measured_over_best_floor"] = round(
            measured_s / max(floor_bw, floor_mxu), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
