"""Flash block-size study for LONG ragged sequences (HunyuanVideo, SD3).

The kernel requires block | padded_seq. Padding 9293 -> 9344 (128-mult)
strands the kernel on 128-wide blocks; padding to 9728 (512-mult) re-opens
the tuned 512 blocks at ~5% extra masked rows. This measures fwd and grad
for both paddings plus the XLA masked fallback, per shape. One JSON line
per measurement (appended to experiments/sweep_log.txt by hand).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def flash_call(sqp, skvp, d):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention,
    )
    bq = next(b for b in (1024, 512, 256, 128) if sqp % b == 0)
    bk = next(b for b in (512, 256, 128) if skvp % b == 0)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    return functools.partial(flash_attention, block_sizes=bs), SegmentIds, bq, bk


def run_shape(name, b, h, s, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    for pad_to in (128, 512):
        sp = ((s + pad_to - 1) // pad_to) * pad_to
        fa, SegmentIds, bq, bk = flash_call(sp, sp, d)
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        seg = SegmentIds(
            q=jnp.broadcast_to(
                (jnp.arange(sp) >= s).astype(jnp.int32)[None], (b, sp)),
            kv=jnp.broadcast_to(
                (jnp.arange(sp) >= s).astype(jnp.int32)[None], (b, sp)))

        @jax.jit
        def fwd(q_, k_, v_):
            return fa(q_, k_, v_, causal=False, segment_ids=seg,
                      sm_scale=1.0 / d ** 0.5)

        @jax.jit
        def gradf(q_, k_, v_):
            return jax.grad(
                lambda a, b_, c: fwd(a, b_, c).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))(q_, k_, v_)

        f = timeit(fwd, qp, kp, vp)
        g = timeit(gradf, qp, kp, vp, n=10)
        print(json.dumps({
            "exp": "flash_long", "shape": name, "pad": sp,
            "bq": bq, "bk": bk, "fwd_ms": round(f, 2),
            "grad_ms": round(g, 2)}), flush=True)

    # XLA masked fallback (what the pre-r3 dispatch did for these)
    mask = jnp.broadcast_to(
        (jnp.arange(s) < s - 5)[None, None, None, :], (b, 1, 1, s))
    qx = q.transpose(0, 2, 1, 3)
    kx = k.transpose(0, 2, 1, 3)
    vx = v.transpose(0, 2, 1, 3)

    @jax.jit
    def xfwd(q_, k_, v_):
        return jax.nn.dot_product_attention(q_, k_, v_, mask=mask)

    @jax.jit
    def xgrad(q_, k_, v_):
        return jax.grad(
            lambda a, b_, c: xfwd(a, b_, c).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q_, k_, v_)

    f = timeit(xfwd, qx, kx, vx)
    g = timeit(xgrad, qx, kx, vx, n=10)
    print(json.dumps({
        "exp": "flash_long", "shape": name, "pad": "xla_mask",
        "fwd_ms": round(f, 2), "grad_ms": round(g, 2)}), flush=True)


def main():
    # HunyuanVideo half-size bench shape: 9216 video + 77 text tokens
    run_shape("hunyuan_b1_h12_s9293_d128", 1, 12, 9293, 128)
    # SD3-medium joint sequence: 4096 image + 154 text
    run_shape("sd3_b2_h24_s4250_d64", 2, 24, 4250, 64)


if __name__ == "__main__":
    main()
