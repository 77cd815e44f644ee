"""Probe: does the remote execution service dedupe identical dispatches?

Times n executions of a large matmul three ways: (a) identical args every
call, (b) distinct pre-materialized args, (c) identical args with a
block_until_ready between calls. If (a) << (b), repeat-timing with
identical inputs is invalid on this stack and every microbench must
perturb its operands (exp_folded_blocks/_timeit). ~1 GFLOP matmul,
expected ~*real* ms on the v5e.

Usage: python experiments/exp_dedupe_probe.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp


def main():
    n = 20
    k = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (k, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, k), jnp.bfloat16)
    f = jax.jit(lambda x, y: (x @ y).sum())
    r = f(a, b); jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(n):
        r = f(a, b)
    jax.block_until_ready(r)
    identical = (time.perf_counter() - t0) / n * 1e3

    xs = [a * (1.0 + 1e-6 * (i + 1)) for i in range(n)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    for i in range(n):
        r = f(xs[i], b)
    jax.block_until_ready(r)
    distinct = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(a, b))
    identical_blocked = (time.perf_counter() - t0) / n * 1e3

    print(json.dumps({
        "identical_ms": round(identical, 4),
        "distinct_ms": round(distinct, 4),
        "identical_blocked_ms": round(identical_blocked, 4),
        "dedupe_suspected": identical < 0.25 * distinct,
    }))


if __name__ == "__main__":
    main()
