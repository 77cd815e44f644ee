"""Characterize the remote execution service's synchronization semantics.

2026-08-21 relay: block_until_ready resolves without guaranteeing
execution — a ~1.4 ms matmul "times" at ~0.02 ms whether inputs repeat
or differ, and a blocked per-call loop reads the same. Real timing
requires (a) a data-dependent chain across iterations and (b) a VALUE
fetch to synchronize. This probe prints all four variants on a
non-simplifiable computation (sum of squares of a matmul — a plain
reduce(dot) would be algebraically rewritten by XLA to k^2 work):

  blocked_identical — 20x same args, block_until_ready per call
  blocked_distinct  — 20x distinct args, one block at the end
  chained_fetch     — data-dependent chain, one float() at the end
  fetch_each        — float() per call (includes per-call round trip)

Expected on the v5e: ~1.4 ms/matmul for the chained/fetch variants
(4096^3 x 2 = 137 GFLOP at ~100 TF/s effective); microseconds for the
blocked variants if the relay is still lazily resolving readiness.
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

    @jax.jit
    def f(x, y, carry):
        return jnp.sum((x @ y).astype(jnp.float32) ** 2) + carry * 0

    z = jnp.float32(0.0)
    float(f(a, b, z))  # compile + one real execution

    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(a, b, z))
    blocked_identical = (time.perf_counter() - t0) / n * 1e3

    xs = [a * (1.0 + 1e-6 * (i + 1)) for i in range(n)]
    t0 = time.perf_counter()
    r = None
    for i in range(n):
        r = f(xs[i], b, z)
    jax.block_until_ready(r)
    blocked_distinct = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for i in range(n):
        carry = f(xs[i], b, carry)
    float(carry)
    chained_fetch = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for i in range(n):
        float(f(xs[i], b, z))
    fetch_each = (time.perf_counter() - t0) / n * 1e3

    print(json.dumps({
        "blocked_identical_ms": round(blocked_identical, 4),
        "blocked_distinct_ms": round(blocked_distinct, 4),
        "chained_fetch_ms": round(chained_fetch, 4),
        "fetch_each_ms": round(fetch_each, 4),
        "block_until_ready_is_lazy":
            blocked_distinct < 0.25 * chained_fetch,
    }))


if __name__ == "__main__":
    main()
