"""COMPOSED end-to-end step golden for the Würstchen family — the
CONTINUOUS-timestep warped-cosine noising scheme, completing the
composed-step trilogy (SD1.5 discrete diffusion:
test_reference_goldens_composed_step.py; SD3 rectified flow:
test_reference_goldens_composed_flow.py).

Runs the full scale -> warp -> ᾱ(t) continuous noising -> denoise ->
epsilon target -> loss COMPOSITION both ways on identical inputs:

- jax side: the real `wuerstchen_predict` + `diffusion_losses` path the
  trainer jits (train/wuerstchen_train_step.py, WUERSTCHEN_2 branch:
  (latent+1)/42 scaling, t*1.08+0.001 warp), cached-text conditioning,
  with a tiny fixed-weight stand-in prior.
- torch side: the reference's own composition re-assembled from its own
  importable modules — ModelSetupDiffusionMixin._add_noise_continuous
  and ModelSetupDiffusionLossMixin._diffusion_losses driven by
  alphas_cumprod_fun — wired exactly like
  BaseWuerstchenSetup.predict/calculate_loss (reference:
  modules/modelSetup/BaseWuerstchenSetup.py:183-347). The setup class
  itself imports diffusers (absent, an environment gate recorded in
  STATUS.md), so its 12-line __alpha_cumprod formula
  (BaseWuerstchenSetup.py:168-181) is re-stated here in torch and
  cross-checked against our jax table on a dense grid.

RNG discipline: epsilon target == noise bitwise, so the jax draws are
recovered from the run's data dict and injected into the torch
composition. The continuous SNR path (alphas_cumprod_fun -> snr, the
branch the discrete goldens never touch:
ModelSetupDiffusionLossMixin.__snr:170-180) is exercised via
MIN_SNR_GAMMA / DEBIASED_ESTIMATION weightings.
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

from onetrainer_tpu.math.losses import diffusion_losses  # noqa: E402
from onetrainer_tpu.math.timesteps import TimestepConfig  # noqa: E402
from onetrainer_tpu.train.sd_train_step import SDStepConfig  # noqa: E402
from onetrainer_tpu.train.wuerstchen_train_step import (  # noqa: E402
    ContinuousCoefficients, wuerstchen_alpha_cumprod, wuerstchen_predict,
)
from onetrainer_tpu.util.enums import ModelType, TrainingMethod  # noqa: E402
from tests.test_reference_goldens_loss_mixin import (  # noqa: E402
    _jax_config, _ref_config, _ref_mixin,
)

B, H, W, C = 3, 6, 6, 16        # Würstchen prior: 16ch EfficientNet latents
CTX_LEN, CTX_DIM = 5, 20


def _ref_alpha_cumprod(timesteps, dim):
    """The reference's warped-cosine ᾱ(t) re-stated in torch
    (BaseWuerstchenSetup.__alpha_cumprod:168-181; the class itself
    imports diffusers and cannot load here). Cross-checked against the
    jax table below in test_alpha_cumprod_table_matches_reference."""
    s = torch.tensor([0.008], dtype=torch.float32)
    init = torch.cos(s / (1 + s) * torch.pi * 0.5) ** 2
    ac = torch.cos((timesteps + s) / (1 + s) * torch.pi * 0.5) ** 2 / init
    ac = ac.clamp(0.0001, 0.9999).view(timesteps.shape[0])
    while ac.dim() < dim:
        ac = ac.unsqueeze(-1)
    return ac


def test_alpha_cumprod_table_matches_reference():
    t = np.linspace(0.0, 1.0, 257, dtype=np.float32)
    ours = np.asarray(wuerstchen_alpha_cumprod(jnp.asarray(t)))
    ref = _ref_alpha_cumprod(torch.from_numpy(t.copy()), 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def _fixed_weights():
    rng = np.random.default_rng(29)
    conv = rng.normal(scale=0.2, size=(3, 3, C, C)).astype(np.float32)  # HWIO
    ctx_proj = rng.normal(scale=0.2, size=(CTX_DIM, C)).astype(np.float32)
    return conv, ctx_proj


class _ToyPriorJax:
    """Stand-in prior with wuerstchen_predict's v2 call signature:
    apply(variables, noisy, t, context) ->
    x*(1 + t) + conv3x3_same(x) + proj(mean(ctx)); t is already the
    warped continuous value in [0, 1]."""

    def __init__(self, conv, ctx_proj):
        self.conv = jnp.asarray(conv)
        self.ctx_proj = jnp.asarray(ctx_proj)

    def apply(self, variables, x, t, context):
        temb = t.astype(jnp.float32)[:, None, None, None]
        h = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), self.conv, window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = context.mean(axis=1).astype(jnp.float32) @ self.ctx_proj
        return (x.astype(jnp.float32) * (1.0 + temb) + h
                + c[:, None, None, :])


def _toy_prior_torch(conv, ctx_proj, x_nchw, t, context):
    w = torch.from_numpy(conv.copy()).permute(3, 2, 0, 1)  # HWIO -> OIHW
    temb = t.to(torch.float32)[:, None, None, None]
    h = torch.nn.functional.conv2d(x_nchw, w, padding=1)
    c = context.mean(dim=1) @ torch.from_numpy(ctx_proj.copy())
    return x_nchw * (1.0 + temb) + h + c[:, :, None, None]


def _inputs(seed):
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(B, H, W, C)).astype(np.float32)
    context = rng.normal(size=(B, CTX_LEN, CTX_DIM)).astype(np.float32)
    loss_weight = rng.uniform(0.4, 2.0, size=(B,)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W, 1)) > 0.5).astype(np.float32)
    return latent, context, loss_weight, mask


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc, np.float32),
                                         (0, 3, 1, 2)).copy())


class _Model:
    pass


def _compose_jax(ref_cfg, seed, masked):
    latent, context, loss_weight, mask = _inputs(seed)
    loss_cfg = _jax_config(ref_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(),
        loss=loss_cfg,
        stochastic_rounding=False,
    )
    conv, ctx_proj = _fixed_weights()
    model = _Model()
    model.model_type = ModelType.WUERSTCHEN_2
    model.prior = _ToyPriorJax(conv, ctx_proj)
    batch = {
        "latent_image": jnp.asarray(latent),
        "text_encoder_hidden_state": jnp.asarray(context),
        "loss_weight": jnp.asarray(loss_weight),
    }
    if masked:
        batch["latent_mask"] = jnp.asarray(mask)
    data = wuerstchen_predict(model, {}, {}, batch,
                              jax.random.PRNGKey(seed), cfg)
    losses = diffusion_losses(batch, data, loss_cfg,
                              ContinuousCoefficients())
    return np.asarray(losses), data


def _run_composed(masked, *, seed=31, **cfg_kw):
    ref_cfg = _ref_config(masked=masked, **cfg_kw)
    jax_losses, data = _compose_jax(ref_cfg, seed, masked)
    # epsilon family: target == noise bitwise; timestep is the WARPED
    # continuous draw (wuerstchen_predict applies the v2 warp before
    # storing it, matching the reference predict order:
    # BaseWuerstchenSetup.py:213-218)
    noise = np.asarray(data["target"], np.float32)
    t_warped = np.asarray(data["timestep"], np.float32)
    assert (t_warped >= 0.001).all() and (t_warped <= 1.0).all()

    latent, context, loss_weight, mask = _inputs(seed)
    scaled_t = (_nchw(latent) + 1.0) / 42.0          # v2 latent scaling
    np.testing.assert_allclose(
        np.transpose(np.asarray(data["scaled_latent_image"], np.float32),
                     (0, 3, 1, 2)), scaled_t.numpy(), rtol=1e-6, atol=1e-7)
    noise_t = _nchw(noise)
    ts = torch.from_numpy(t_warped.copy())
    from modules.modelSetup.mixin.ModelSetupDiffusionMixin import (
        ModelSetupDiffusionMixin,
    )

    class D(ModelSetupDiffusionMixin):
        pass

    noisy_t = D()._add_noise_continuous(scaled_t, noise_t, ts,
                                        _ref_alpha_cumprod)
    conv, ctx_proj = _fixed_weights()
    predicted = _toy_prior_torch(conv, ctx_proj, noisy_t, ts,
                                 torch.from_numpy(context.copy()))
    data_t = {
        "loss_type": "target",
        "timestep": ts,
        "predicted": predicted,
        "target": noise_t,
        "scaled_latent_image": scaled_t,
        "noisy_latent_image": noisy_t,
    }
    batch_t = {"loss_weight": torch.from_numpy(loss_weight.copy())}
    if masked:
        batch_t["latent_mask"] = _nchw(mask)
    ref_losses = _ref_mixin()._diffusion_losses(
        batch_t, data_t, ref_cfg, torch.device("cpu"),
        alphas_cumprod_fun=_ref_alpha_cumprod).numpy()
    np.testing.assert_allclose(jax_losses, ref_losses, rtol=2e-4, atol=2e-5)
    assert np.isfinite(jax_losses).all()


def test_composed_wuerstchen_step_mse():
    _run_composed(False, mse=1.0)


def test_composed_wuerstchen_step_full_stack_masked():
    _run_composed(True, mse=1.0, mae=0.3, log_cosh=0.2,
                  loss_scaler="BATCH", unmasked_weight=0.1, normalize=True)


def test_composed_wuerstchen_step_min_snr_continuous():
    """Exercises the continuous-SNR branch of the reference's __snr
    (alphas_cumprod_fun path, ModelSetupDiffusionLossMixin.py:170-180)
    that every discrete golden bypasses."""
    _run_composed(False, mse=1.0, loss_weight_fn="MIN_SNR_GAMMA",
                  loss_weight_strength=5.0)


def test_composed_wuerstchen_step_debiased_masked():
    _run_composed(True, mse=1.0, mae=0.2,
                  loss_weight_fn="DEBIASED_ESTIMATION", unmasked_weight=0.2)
