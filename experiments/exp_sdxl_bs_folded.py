"""SDXL headline batch-size sweep under the folded flash kernel
(VERDICT r4 weak #1 / next #1: bs8 won pre-folded — 4.578 vs 4.549 —
but no folded bs8/bs16 row exists). Reuses bench.py's exact headline
stage (`_bench_sdxl`, fp8 frozen base, tx_only remat) at an arbitrary
batch size and prints one JSON line.

Usage: python experiments/exp_sdxl_bs_folded.py [bs]
"""
from __future__ import annotations

import json
import sys


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.path.insert(0, "/root/repo")
    import bench

    jax, jnp, optax = bench._jax_modules()
    res = bench._bench_sdxl(jax, jnp, optax,
                            base_quant=jnp.float8_e4m3fn, bs=bs)
    ips, flops_per_img = res["imgs_per_sec"], res["flops_per_img"]
    sec_per_step, hbm_bytes = res["sec_per_step"], res["hbm_bytes"]
    print(json.dumps({
        "exp": "sdxl_bs_folded", "bs": bs,
        "imgs_per_sec": round(ips, 3),
        "sec_per_step": round(sec_per_step, 4),
        "hw_flops_per_img_T": round(flops_per_img / 1e12, 2)
        if flops_per_img else None,
        "xla_step_bytes_GB": round(hbm_bytes / 1e9, 1) if hbm_bytes else None,
        "hbm_roofline_fraction": round(
            (hbm_bytes / 819e9) / sec_per_step, 3) if hbm_bytes else None,
    }))


if __name__ == "__main__":
    main()
