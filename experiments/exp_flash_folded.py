"""Folded-layout flash kernel (ops/flash_folded.py) vs the stock-kernel
dispatch path (ops/attention.py) on real SD shapes — on-device parity +
fwd / fwd+bwd wall time.

The folded kernel takes [B, S, H*dp] and never materializes a
64-lane-minor tensor in HBM; the stock path transposes to [B, H, S, 64]
(2x tile padding) around jax's flash kernel. This measures both the
kernel-level win and validates Mosaic accepts dp-lane blocks at
odd-head lane offsets (h*64) — the one open lowering question.

Usage: python experiments/exp_flash_folded.py [case ...]
Cases: sdxl32 (b4 h10 s4096), sdxl16 (b4 h20 s1024), sd3 (b2 h24 s4432),
       hunyuan (b1 h24 s9344 dp128)
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CASES = {
    # name: (b, h, sq, dp)
    "sdxl32": (4, 10, 4096, 64),
    "sdxl16": (4, 20, 1024, 64),
    "sd3": (2, 24, 4432, 64),      # 4096 img + 336 text -> padded 4432? use 4608 (512-mult)
    "hunyuan": (1, 24, 9344, 128),    # s>6144: streaming dkv (r4)
    "flux": (1, 24, 4608, 128),       # 4096 img + 512 t5, resident dkv
    # off-slot head dims (zero-pad to the 64/128-lane slot inside the
    # folded path, mirroring ops/attention.py OT_FLASH_FOLDED_PAD):
    "sd15_64": (4, 8, 4096, 40),      # SD1.5 @512 64x64 self-attn level
    "sd15_32": (4, 8, 1024, 80),      # SD1.5 @512 32x32 self-attn level
}


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


def run_case(name):
    b, h, s, dp = CASES[name]
    s = ((s + 511) // 512) * 512
    sm = 1.0 / np.sqrt(dp)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qf = jax.random.normal(ks[0], (b, s, h * dp), jnp.bfloat16)
    kf = jax.random.normal(ks[1], (b, s, h * dp), jnp.bfloat16)
    vf = jax.random.normal(ks[2], (b, s, h * dp), jnp.bfloat16)

    from onetrainer_tpu.ops.attention import dot_product_attention
    from onetrainer_tpu.ops.flash_folded import flash_attention_folded

    bq = next(x for x in (1024, 512, 256, 128) if s % x == 0)
    bk = next(x for x in (512, 256, 128) if s % x == 0)

    dpad = dp if dp in (64, 128) else (64 if dp <= 64 else 128)

    @jax.jit
    def folded_fwd(q, k, v):
        if dpad != dp:
            pad4 = ((0, 0), (0, 0), (0, 0), (0, dpad - dp))
            qp = jnp.pad(q.reshape(b, s, h, dp), pad4).reshape(b, s,
                                                               h * dpad)
            kp = jnp.pad(k.reshape(b, s, h, dp), pad4).reshape(b, s,
                                                               h * dpad)
            vp = jnp.pad(v.reshape(b, s, h, dp), pad4).reshape(b, s,
                                                               h * dpad)
            o = flash_attention_folded(qp, kp, vp, h, sm_scale=sm,
                                       block_q=bq, block_k=bk)
            return o.reshape(b, s, h, dpad)[..., :dp].reshape(b, s, h * dp)
        return flash_attention_folded(q, k, v, h, sm_scale=sm,
                                      block_q=bq, block_k=bk)

    @jax.jit
    def stock_fwd(q, k, v):
        q4 = q.reshape(b, s, h, dp)
        k4 = k.reshape(b, s, h, dp)
        v4 = v.reshape(b, s, h, dp)
        return dot_product_attention(q4, k4, v4).reshape(b, s, h * dp)

    def mk_loss(fwd):
        @jax.jit
        def loss_grads(q, k, v):
            def f(q, k, v):
                return jnp.sum(fwd.__wrapped__(q, k, v).astype(jnp.float32)
                               ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        return loss_grads

    out = {"case": name, "b": b, "h": h, "s": s, "dp": dp,
           "block_q": bq, "block_k": bk}
    try:
        of = folded_fwd(qf, kf, vf)
        os_ = stock_fwd(qf, kf, vf)
        err = float(jnp.max(jnp.abs(of.astype(jnp.float32)
                                    - os_.astype(jnp.float32))))
        out["fwd_max_abs_err"] = round(err, 5)
        out["folded_fwd_ms"] = round(_timeit(folded_fwd, qf, kf, vf), 3)
        out["stock_fwd_ms"] = round(_timeit(stock_fwd, qf, kf, vf), 3)
        gfold = mk_loss(folded_fwd)
        gstock = mk_loss(stock_fwd)
        gf = gfold(qf, kf, vf)
        gs = gstock(qf, kf, vf)
        gerr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b_.astype(jnp.float32))))
                   for a, b_ in zip(gf, gs))
        out["grad_max_abs_err"] = round(gerr, 4)
        out["folded_grad_ms"] = round(_timeit(gfold, qf, kf, vf, n=10), 3)
        out["stock_grad_ms"] = round(_timeit(gstock, qf, kf, vf, n=10), 3)
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {str(e)[:500]}"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["sdxl32", "sdxl16"]
    for nm in names:
        run_case(nm)
