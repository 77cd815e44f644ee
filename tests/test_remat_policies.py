"""Shared remat-policy map (models/remat.py) + production defaults.

The reference toggles per-block checkpointing on/off
(modules/util/checkpointing_util.py); on TPU the checkpoint *policy*
decides the recompute-vs-HBM tradeoff, and the measured winners must be
what production loaders build (BASELINE.md) — not just experiment flags.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.models import remat as remat_mod


def test_policy_names_map():
    assert remat_mod.checkpoint_policy("full") is None
    assert remat_mod.checkpoint_policy("none") is None
    for name in ("dots", "dots_nb", "attn", "dots_nb_attn"):
        assert remat_mod.checkpoint_policy(name) is not None
    with pytest.raises(ValueError):
        remat_mod.checkpoint_policy("bogus")


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("OT_REMAT_POLICY", "dots")
    assert remat_mod.default_policy("unet") == "dots"
    assert remat_mod.default_policy("sd3") == "dots"
    monkeypatch.delenv("OT_REMAT_POLICY")
    assert remat_mod.default_policy("unet") == remat_mod._DEFAULTS["unet"]


def test_measured_defaults():
    os.environ.pop("OT_REMAT_POLICY", None)
    # measured winners (BASELINE.md); families without a measurement
    # stay on "full"
    assert remat_mod.default_policy("unet") == remat_mod._DEFAULTS["unet"]
    assert remat_mod.default_policy("sd3") == remat_mod._DEFAULTS["sd3"]
    assert remat_mod.default_policy("unknown_family") == "full"


def test_production_configs_pick_up_defaults():
    from onetrainer_tpu.io.flux_checkpoints import flux_config_from_diffusers
    from onetrainer_tpu.io.sd3_checkpoints import sd3_config_from_diffusers
    from onetrainer_tpu.io.sd_checkpoints import unet_config_from_diffusers

    os.environ.pop("OT_REMAT_POLICY", None)
    u = unet_config_from_diffusers({}, gradient_checkpointing=True)
    assert u.remat_policy == remat_mod.default_policy("unet")
    s = sd3_config_from_diffusers({}, gradient_checkpointing=True)
    assert s.remat_policy == remat_mod.default_policy("sd3")
    f = flux_config_from_diffusers({}, gradient_checkpointing=True)
    assert f.remat_policy == remat_mod.default_policy("flux")


def test_attn_policy_matches_full_numerics():
    """Saving attn outputs must not change gradients — only what the
    backward pass recomputes (same values either way)."""
    from onetrainer_tpu.models.sd3 import SD3Config, SD3Transformer2D

    args = (jnp.ones((1, 8, 8, 16)) * 0.1, jnp.asarray([500.0]),
            jnp.ones((1, 2048)) * 0.02, jnp.ones((1, 16, 4096)) * 0.01)
    grads = {}
    for pol in ("full", "dots_nb_attn"):
        cfg = SD3Config(num_layers=2, num_heads=2, head_dim=32,
                        pos_embed_max_size=8, caption_projection_dim=64,
                        gradient_checkpointing=True, remat_policy=pol,
                        dtype=jnp.float32)
        m = SD3Transformer2D(cfg)
        p = m.init(jax.random.PRNGKey(0), *args)
        grads[pol] = jax.grad(
            lambda pp: jnp.sum(m.apply(pp, *args) ** 2))(p)
    a = jax.tree.leaves(grads["full"])
    b = jax.tree.leaves(grads["dots_nb_attn"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)
