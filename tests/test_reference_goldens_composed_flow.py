"""COMPOSED end-to-end step golden for the FLOW-MATCHING families
(SD3-class), the rectified-flow sibling of
test_reference_goldens_composed_step.py's SD1.5 diffusion composition.

Runs the full scale/shift -> flow noising -> denoise -> flow target ->
flow loss COMPOSITION both ways on identical inputs:

- jax side: the real `sd3_predict` + `flow_matching_losses` path the
  trainer jits (train/sd3_train_step.py), cached-text conditioning,
  with a tiny fixed-weight stand-in transformer (the MMDiT itself cannot
  be torch-anchored here — diffusers is not installed, an environment
  gate recorded in STATUS.md).
- torch side: the reference's own composition re-assembled from its own
  importable modules — ModelSetupFlowMatchingMixin._add_noise_discrete
  and ModelSetupDiffusionLossMixin._flow_matching_losses — wired exactly
  like BaseStableDiffusion3Setup.predict/calculate_loss
  (reference: modules/modelSetup/BaseStableDiffusion3Setup.py:285-411),
  with the same stand-in denoiser in torch.

RNG discipline: flow targets satisfy target = noise - scaled_latent, so
the jax-drawn noise is recovered exactly from the first run's data dict
and injected into the torch composition — both sides compose over
bitwise-identical draws.

Known timestep-conditioning deviation (asserted here, documented in
docs/Parity.md): the reference conditions the transformer on the
0-based integer timestep t (BaseStableDiffusion3Setup.py:319-325,
`timestep=timestep` from _get_timestep_discrete), while this framework
conditions on sigma*1000 = t+1 — the FlowMatchEulerDiscreteScheduler
grid value that diffusers inference pipelines feed. The torch side
below therefore conditions its toy on (t+1) to isolate the rest of the
composition; the 1/1000-of-range shift itself is the deviation.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from onetrainer_tpu.math.losses import flow_matching_losses  # noqa: E402
from onetrainer_tpu.math.timesteps import TimestepConfig  # noqa: E402
from onetrainer_tpu.train.sd3_train_step import sd3_predict  # noqa: E402
from onetrainer_tpu.train.sd_train_step import SDStepConfig  # noqa: E402
from onetrainer_tpu.util.enums import TrainingMethod  # noqa: E402
from tests.test_reference_goldens_loss_mixin import (  # noqa: E402
    _jax_config, _ref_config, _ref_mixin,
)

B, H, W, C = 3, 8, 8, 16        # SD3: 16-channel latents
CTX_LEN, CTX_DIM, POOL_DIM = 6, 24, 12
N_T = 1000
# SD3 latent space constants (train/families wiring; reference:
# StableDiffusion3Model vae config shift/scaling factors)
VAE_SHIFT, VAE_SCALE = 0.0609, 1.5305


def _fixed_weights():
    rng = np.random.default_rng(17)
    conv = rng.normal(scale=0.2, size=(3, 3, C, C)).astype(np.float32)  # HWIO
    ctx_proj = rng.normal(scale=0.2, size=(CTX_DIM, C)).astype(np.float32)
    pool_proj = rng.normal(scale=0.2, size=(POOL_DIM, C)).astype(np.float32)
    return conv, ctx_proj, pool_proj


class _ToyTransformerJax:
    """Stand-in MMDiT with sd3_predict's exact call signature:
    apply(variables, noisy, timestep_cond, pooled, context) ->
    x*(1 + t/1000) + conv3x3_same(x) + proj(mean(ctx)) + proj(pooled)."""

    def __init__(self, conv, ctx_proj, pool_proj):
        self.conv = jnp.asarray(conv)
        self.ctx_proj = jnp.asarray(ctx_proj)
        self.pool_proj = jnp.asarray(pool_proj)

    def apply(self, variables, x, t, pooled, context):
        temb = (t.astype(jnp.float32) / N_T)[:, None, None, None]
        h = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), self.conv, window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = context.mean(axis=1).astype(jnp.float32) @ self.ctx_proj
        p = pooled.astype(jnp.float32) @ self.pool_proj
        return (x.astype(jnp.float32) * (1.0 + temb) + h
                + c[:, None, None, :] + p[:, None, None, :])


def _toy_transformer_torch(conv, ctx_proj, pool_proj, x_nchw, t_cond,
                           context, pooled):
    w = torch.from_numpy(conv.copy()).permute(3, 2, 0, 1)  # HWIO -> OIHW
    temb = (t_cond.to(torch.float32) / N_T)[:, None, None, None]
    h = torch.nn.functional.conv2d(x_nchw, w, padding=1)
    c = context.mean(dim=1) @ torch.from_numpy(ctx_proj.copy())
    p = pooled @ torch.from_numpy(pool_proj.copy())
    return (x_nchw * (1.0 + temb) + h + c[:, :, None, None]
            + p[:, :, None, None])


def _inputs(seed):
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(B, H, W, C)).astype(np.float32)
    context = rng.normal(size=(B, CTX_LEN, CTX_DIM)).astype(np.float32)
    pooled = rng.normal(size=(B, POOL_DIM)).astype(np.float32)
    loss_weight = rng.uniform(0.4, 2.0, size=(B,)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W, 1)) > 0.5).astype(np.float32)
    return latent, context, pooled, loss_weight, mask


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc, np.float32),
                                         (0, 3, 1, 2)).copy())


class _Model:
    pass


def _compose_jax(ref_cfg, seed, masked):
    latent, context, pooled, loss_weight, mask = _inputs(seed)
    loss_cfg = _jax_config(ref_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(),
        loss=loss_cfg,
        stochastic_rounding=False,
        vae_scaling_factor=VAE_SCALE,
        vae_shift_factor=VAE_SHIFT,
        num_train_timesteps=N_T,
    )
    conv, ctx_proj, pool_proj = _fixed_weights()
    model = _Model()
    model.transformer = _ToyTransformerJax(conv, ctx_proj, pool_proj)
    batch = {
        "latent_image": jnp.asarray(latent),
        "sd3_context": jnp.asarray(context),
        "sd3_pooled": jnp.asarray(pooled),
        "loss_weight": jnp.asarray(loss_weight),
    }
    if masked:
        batch["latent_mask"] = jnp.asarray(mask)
    data = sd3_predict(model, {}, None, None, None, batch,
                       jax.random.PRNGKey(seed), cfg)
    losses = flow_matching_losses(batch, data, loss_cfg, N_T)
    return np.asarray(losses), data


def _ref_flow_losses(ref_cfg, batch, data):
    sigmas = torch.linspace(1.0 / N_T, 1.0, N_T)
    return _ref_mixin()._flow_matching_losses(
        batch, data, ref_cfg, torch.device("cpu"), sigmas=sigmas).numpy()


def _run_composed(masked, *, seed=23, **cfg_kw):
    ref_cfg = _ref_config(masked=masked, **cfg_kw)
    jax_losses, data = _compose_jax(ref_cfg, seed, masked)
    # flow target = noise - scaled, so the jax noise draw is recovered
    # exactly; assert the identity noisy == noise*s + scaled*(1-s) holds
    scaled = np.asarray(data["scaled_latent_image"], np.float32)
    noise = np.asarray(data["target"], np.float32) + scaled
    timestep = np.asarray(data["timestep"])
    sigma = ((timestep + 1.0) / N_T).astype(np.float32)[:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(data["noisy_latent_image"], np.float32),
        noise * sigma + scaled * (1.0 - sigma), rtol=1e-5, atol=1e-5)

    latent, context, pooled, loss_weight, mask = _inputs(seed)
    scaled_t = (_nchw(latent) - VAE_SHIFT) * VAE_SCALE
    noise_t = _nchw(noise)
    ts = torch.from_numpy(np.asarray(timestep, np.int64))
    from modules.modelSetup.mixin.ModelSetupFlowMatchingMixin import (
        ModelSetupFlowMatchingMixin,
    )

    class F(ModelSetupFlowMatchingMixin):
        pass

    noisy_t, _ = F()._add_noise_discrete(scaled_t, noise_t, ts,
                                         torch.zeros(N_T))
    conv, ctx_proj, pool_proj = _fixed_weights()
    predicted = _toy_transformer_torch(
        conv, ctx_proj, pool_proj, noisy_t, ts + 1,
        torch.from_numpy(context.copy()), torch.from_numpy(pooled.copy()))
    data_t = {
        "loss_type": "target",
        "timestep": ts,
        "predicted": predicted,
        "target": noise_t - scaled_t,
        "scaled_latent_image": scaled_t,
        "noisy_latent_image": noisy_t,
    }
    batch_t = {"loss_weight": torch.from_numpy(loss_weight.copy())}
    if masked:
        batch_t["latent_mask"] = _nchw(mask)
    ref_losses = _ref_flow_losses(ref_cfg, batch_t, data_t)
    np.testing.assert_allclose(jax_losses, ref_losses, rtol=2e-4, atol=2e-5)
    assert np.isfinite(jax_losses).all()


def test_composed_flow_step_mse():
    _run_composed(False, mse=1.0)


def test_composed_flow_step_full_stack_masked():
    _run_composed(True, mse=1.0, mae=0.3, log_cosh=0.2,
                  loss_scaler="BATCH", unmasked_weight=0.1, normalize=True)


def test_composed_flow_step_sigma_weight():
    _run_composed(False, mse=1.0, mae=0.2, loss_weight_fn="SIGMA",
                  loss_scaler="BOTH")
