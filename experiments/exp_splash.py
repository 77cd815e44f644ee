"""Splash-attention vs XLA fused attention microbench at SD/SDXL shapes
(fwd + grad). Run on the real chip; prints one JSON line per shape."""

from __future__ import annotations

import functools
import json
import time


def bench(fn, *args, n=20):
    out = fn(*args)
    jax_block(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - start) / n * 1e3  # ms


def jax_block(x):
    import jax
    for leaf in jax.tree.leaves(x):
        leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu import splash_attention as sa

    shapes = [
        # (batch, heads, seq, head_dim) — SD1.5 @512 and SDXL @1024 hot shapes
        (4, 8, 4096, 40),
        (4, 8, 1024, 80),
        (2, 10, 4096, 64),
        (2, 20, 1024, 64),
    ]
    for b, h, s, d in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)

        @jax.jit
        def xla(q, k, v):
            o = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
            w = jax.nn.softmax(o.astype(jnp.float32), axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", w, v)

        mask = sa.MultiHeadMask([sa.FullMask((s, s)) for _ in range(h)])
        kernel = sa.make_splash_mha(mask, head_shards=1, q_seq_shards=1)

        @jax.jit
        def splash(q, k, v):
            return jax.vmap(kernel)(q * (d ** -0.5), k, v)

        @jax.jit
        def xla_grad(q, k, v):
            return jax.grad(lambda q, k, v: (xla(q, k, v)
                                             .astype(jnp.float32) ** 2).sum(),
                            argnums=(0, 1, 2))(q, k, v)

        @jax.jit
        def splash_grad(q, k, v):
            return jax.grad(lambda q, k, v: (splash(q, k, v)
                                             .astype(jnp.float32) ** 2).sum(),
                            argnums=(0, 1, 2))(q, k, v)

        row = {"shape": f"b{b} h{h} s{s} d{d}"}
        row["xla_fwd_ms"] = round(bench(xla, q, k, v), 3)
        try:
            row["splash_fwd_ms"] = round(bench(splash, q, k, v), 3)
        except Exception as e:
            row["splash_fwd_err"] = f"{type(e).__name__}: {e}"[:120]
        row["xla_grad_ms"] = round(bench(xla_grad, q, k, v), 3)
        try:
            row["splash_grad_ms"] = round(bench(splash_grad, q, k, v), 3)
        except Exception as e:
            row["splash_grad_err"] = f"{type(e).__name__}: {e}"[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
