"""Flash-attention revisit (r3): the r2 microbench ran the stock Pallas
kernel through ops/attention.py's pad-to-128 wrapper, which doubles the
MXU work for SDXL's d=64 heads. Here: raw kernel at d=64 (no padding),
d=40 padded to 64 only, block-size variants, vs the XLA fused path —
fwd and fwd+grad wall time on the real chip.

Usage: python experiments/exp_flash_d64.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp


_SUM = None


def _materialize(out):
    # axon's block_until_ready does not actually wait; forcing a scalar
    # transfer is the only reliable completion barrier over the tunnel
    global _SUM
    if _SUM is None:
        _SUM = jax.jit(lambda t: sum(jnp.sum(x.astype(jnp.float32))
                                     for x in jax.tree.leaves(t)))
    return float(_SUM(out))


def bench(fn, *args, n=20):
    _materialize(fn(*args))   # warmup: compiles fn and the sum
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _materialize(out)         # device executes serially: last done => all done
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    shapes = [
        # (b, heads, s, d) — SDXL @1024: 64x64 level and 32x32 level
        (2, 10, 4096, 64),
        (2, 20, 1024, 64),
        # SD1.5 @512: 64x64 (d40) level
        (4, 8, 4096, 40),
    ]
    results = []
    for b, h, s, d in shapes:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(k2, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(k3, (b, h, s, d), jnp.bfloat16)

        def xla_attn(q, k, v):
            return jax.nn.dot_product_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)

        def grad_wrap(fn):
            def loss(q, k, v):
                return fn(q, k, v).astype(jnp.float32).sum()
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        entry = {"shape": [b, h, s, d]}
        xf = jax.jit(xla_attn)
        entry["xla_fwd_ms"] = round(bench(xf, q, k, v), 2)
        entry["xla_grad_ms"] = round(bench(grad_wrap(xla_attn), q, k, v), 2)

        variants = {}
        # raw (kernel default blocks), and tuned block sizes
        block_cfgs = {
            "default": None,
            "bq512_bk1024": BlockSizes(
                block_q=512, block_k_major=1024, block_k=1024, block_b=1,
                block_q_major_dkv=512, block_k_major_dkv=1024,
                block_k_dkv=1024, block_q_dkv=512,
                block_k_major_dq=1024, block_k_dq=1024, block_q_dq=512),
            "bq1024_bk512": BlockSizes(
                block_q=1024, block_k_major=512, block_k=512, block_b=1,
                block_q_major_dkv=1024, block_k_major_dkv=512,
                block_k_dkv=512, block_q_dkv=1024,
                block_k_major_dq=512, block_k_dq=512, block_q_dq=1024),
        }
        dp = 64 if d <= 64 else 128   # pad only to 64 for d40
        if dp != d:
            pad = ((0, 0), (0, 0), (0, 0), (0, dp - d))
            qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
        else:
            qp, kp, vp = q, k, v
        for name, bs in block_cfgs.items():
            try:
                f = functools.partial(
                    flash_attention, causal=False, sm_scale=1.0 / d ** 0.5,
                    block_sizes=bs)
                jf = jax.jit(lambda q, k, v, f=f: f(q, k, v))
                fwd = bench(jf, qp, kp, vp)
                gd = bench(grad_wrap(lambda q, k, v, f=f: f(q, k, v)),
                           qp, kp, vp)
                variants[name] = {"fwd_ms": round(fwd, 2),
                                  "grad_ms": round(gd, 2)}
            except Exception as e:
                variants[name] = {"error": str(e)[:120]}
        entry["flash"] = variants
        results.append(entry)
        print(json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
