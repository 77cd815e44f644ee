"""Validate the Pallas stochastic-rounding kernel on real TPU hardware:
unbiasedness + grid-point correctness (the CPU interpreter stubs the
hardware PRNG, so this must run on-device)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.ops.pallas_sr import sr_update_pallas


def main():
    assert jax.default_backend() == "tpu", "run on TPU"
    n = 1024 * 128
    p = jnp.ones((n,), jnp.bfloat16)
    u = jnp.full((n,), 1.0 / 512.0, jnp.float32)   # 1/4 of a bf16 step at 1.0
    out = np.asarray(sr_update_pallas(p, u, jnp.asarray(1234)).astype(jnp.float32))
    mean = out.mean()
    vals = set(np.unique(out))
    print(f"mean={mean:.8f} want≈{1 + 1 / 512:.8f}")
    print(f"values={sorted(vals)}")
    assert vals <= {1.0, 1.0078125}, vals
    assert abs(mean - (1 + 1 / 512)) < 2e-4, mean
    # different seeds give different rounding patterns
    out2 = np.asarray(sr_update_pallas(p, u, jnp.asarray(99)).astype(jnp.float32))
    assert not np.array_equal(out, out2)
    print("pallas SR kernel: OK")


if __name__ == "__main__":
    main()
