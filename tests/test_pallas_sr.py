import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from onetrainer_tpu.ops.pallas_sr import sr_update_pallas

# NOTE: the Pallas CPU interpreter stubs prng_random_bits to zeros, so the
# CPU tests validate layout/padding/truncation exactly; the statistical
# unbiasedness of the rounding is validated on real TPU (see
# scripts/verify_pallas_sr.py, run as part of bench validation).


def test_sr_update_truncation_and_padding():
    n = 256 * 128 + 77  # force padding path
    p = jnp.ones((n,), jnp.bfloat16)
    u = jnp.full((n,), 1.0 / 512.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = sr_update_pallas(p, u, jnp.asarray(1234))
    assert out.dtype == jnp.bfloat16
    assert out.shape == (n,)
    # zero random bits -> pure truncation: 1.0 + 2^-9 truncates to 1.0
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)), 1.0)


def test_sr_update_exact_values():
    p = jnp.zeros((256 * 128,), jnp.bfloat16)
    u = jnp.full((256 * 128,), 1.5, jnp.float32)  # exactly representable
    with pltpu.force_tpu_interpret_mode():
        out = sr_update_pallas(p, u, jnp.asarray(7))
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)), 1.5)


def test_sr_update_2d_shape():
    p = jnp.ones((512, 128), jnp.bfloat16)
    u = jnp.zeros((512, 128), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = sr_update_pallas(p, u, jnp.asarray(0))
    assert out.shape == (512, 128)
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)), 1.0)
