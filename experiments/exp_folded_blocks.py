"""Backward block-size sweep for the folded flash kernel on the SDXL
dominant shape (b4 h10 s4096 dp64).

The r5 trace decomposition (exp_profile_headline + exp_roofline_floor,
BASELINE 2026-08-20) shows the headline step is MXU-floor-bound with the
flash backward kernels running at ~40-45% MFU — near the d=64 K-fill
ceiling (a 64-deep contraction half-fills the 128x128 MXU), but block
shape still moves the residual. This sweeps (block_q, block_k) for the
full fwd+bwd step at the production shape and prints ms per combo; the
winner (if not the current 1024/512 default) gets wired into
ops/attention.py's folded dispatch.

Usage: python experiments/exp_folded_blocks.py [case]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

CASES = {
    "sdxl32": (4, 10, 4096, 64),
    "sdxl16": (4, 20, 1024, 64),
}

COMBOS = [
    (1024, 512),   # production default
    (512, 512),
    (2048, 512),
    (1024, 1024),
    (2048, 1024),
    (512, 1024),
    (1024, 256),
    (4096, 512),
]


def _timeit(fn, *args, n=20):
    """Chained-scalar timing. The remote execution service resolves
    block_until_ready without guaranteeing execution (2026-08-21 relay:
    ~0.02 ms readings for ~1 ms kernels, distinct or identical inputs
    alike — experiments/exp_dedupe_probe.py), so every iteration must
    data-depend on the previous one and the loop must synchronize via a
    VALUE fetch at the end. The added reduction/perturbation work is
    negligible next to the kernels under test."""
    @jax.jit
    def step(carry, first, *rest):
        out = fn(first + (carry * 0).astype(first.dtype), *rest)
        return sum(jnp.sum(leaf.astype(jnp.float32) ** 2)
                   for leaf in jax.tree_util.tree_leaves(out))

    firsts = [args[0] * (1.0 + 1e-6 * (i + 1)) for i in range(n)]
    carry = step(jnp.float32(0.0), args[0], *args[1:])
    float(carry)   # real compile + one synchronized execution
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for i in range(n):
        carry = step(carry, firsts[i], *args[1:])
    float(carry)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "sdxl32"
    b, h, s, dp = CASES[case]
    sm = 1.0 / np.sqrt(dp)
    from onetrainer_tpu.ops.flash_folded import flash_attention_folded

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    qf = jax.random.normal(ks[0], (b, s, h * dp), jnp.bfloat16)
    kf = jax.random.normal(ks[1], (b, s, h * dp), jnp.bfloat16)
    vf = jax.random.normal(ks[2], (b, s, h * dp), jnp.bfloat16)

    results = {}
    for bq, bk in COMBOS:
        if bq > s or bk > s:
            continue

        def loss(q, k, v, _bq=bq, _bk=bk):
            o = flash_attention_folded(q, k, v, h, sm_scale=sm,
                                       block_q=_bq, block_k=_bk)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        fwd = jax.jit(loss)
        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            tf = _timeit(fwd, qf, kf, vf)
            tg = _timeit(grad, qf, kf, vf)
        except Exception as e:  # noqa: BLE001 — combo may exceed VMEM
            results[f"{bq}x{bk}"] = {"error": type(e).__name__}
            continue
        results[f"{bq}x{bk}"] = {"fwd_ms": round(tf, 3),
                                 "grad_ms": round(tg, 3)}
        print(json.dumps({"case": case, "combo": f"{bq}x{bk}",
                          **results[f"{bq}x{bk}"]}), flush=True)

    best = min((r["grad_ms"], c) for c, r in results.items()
               if "grad_ms" in r)
    print(json.dumps({"case": case, "best_grad": best[1],
                      "best_grad_ms": best[0], "all": results}))


if __name__ == "__main__":
    main()
