"""COMPOSED end-to-end step golden (VERDICT r3 missing #5 / next #9).

The piecewise goldens anchor noise, timesteps, schedule coefficients,
the loss stack and PEFT forwards individually; this file closes the last
daylight between "the pieces match" and "the step matches" by running
the full SD1.5 predict -> target -> loss COMPOSITION both ways on
identical inputs:

- jax side: the real `sd_predict` + `diffusion_losses` path the trainer
  jits (train/sd_train_step.py), with a tiny fixed-weight stand-in
  denoiser (the UNet itself cannot be torch-anchored here — diffusers is
  not installed, an environment gate recorded in STATUS.md).
- torch side: the reference's own composition re-assembled from its own
  importable modules — ModelSetupDiffusionMixin._add_noise_discrete,
  DiffusionScheduleCoefficients.from_betas, and
  ModelSetupDiffusionLossMixin._diffusion_losses — wired exactly like
  BaseStableDiffusionSetup.predict/calculate_loss
  (reference: modules/modelSetup/BaseStableDiffusionSetup.py:135-310),
  with the same stand-in denoiser in torch.

RNG discipline: distribution equivalence of the samplers is anchored in
test_reference_goldens_timesteps; here the jax-drawn noise/timesteps are
captured from the epsilon run (target == noise) and injected into the
torch composition, so both sides compose over bitwise-identical draws.
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
from onetrainer_tpu.math.schedules import (  # noqa: E402
    DiffusionScheduleCoefficients as JaxCoeffs,
)
from onetrainer_tpu.math.timesteps import TimestepConfig  # noqa: E402
from onetrainer_tpu.train.sd_train_step import (  # noqa: E402
    SDStepConfig, sd_predict,
)
from onetrainer_tpu.util.enums import TrainingMethod  # noqa: E402
from tests.test_reference_goldens_loss_mixin import (  # noqa: E402
    _betas, _jax_config, _ref_config, _ref_mixin,
)

B, H, W, C = 3, 8, 8, 4
CTX_LEN, CTX_DIM = 6, 32


def _ref_diffusion_mixin():
    from modules.modelSetup.mixin.ModelSetupDiffusionMixin import (
        ModelSetupDiffusionMixin,
    )

    class D(ModelSetupDiffusionMixin):
        pass

    return D()


def _fixed_weights():
    rng = np.random.default_rng(7)
    conv = rng.normal(scale=0.2, size=(3, 3, C, C)).astype(np.float32)  # HWIO
    ctx_proj = rng.normal(scale=0.2, size=(CTX_DIM, C)).astype(np.float32)
    return conv, ctx_proj


def _toy_unet_jax(conv, ctx_proj):
    """Stand-in denoiser: identical math implemented in jax and torch —
    x*(1 + t/1000) + conv3x3_same(x) + proj(mean(context))."""
    conv_j, proj_j = jnp.asarray(conv), jnp.asarray(ctx_proj)

    def apply(variables, x, t, context):
        temb = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        h = jax.lax.conv_general_dilated(
            x, conv_j, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = context.mean(axis=1) @ proj_j
        return x * (1.0 + temb) + h + c[:, None, None, :]

    return apply


def _toy_unet_torch(conv, ctx_proj, x_nchw, t, context):
    w = torch.from_numpy(conv.copy()).permute(3, 2, 0, 1)  # HWIO -> OIHW
    temb = (t.to(torch.float32) / 1000.0)[:, None, None, None]
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


def _compose_jax(ref_cfg, prediction_type, seed, masked):
    latent, context, loss_weight, mask = _inputs(seed)
    loss_cfg = _jax_config(ref_cfg,
                           v_prediction=(prediction_type == "v_prediction"))
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(),
        loss=loss_cfg,
        stochastic_rounding=False,
        prediction_type=prediction_type,
    )
    conv, ctx_proj = _fixed_weights()
    batch = {
        "latent_image": jnp.asarray(latent),
        "text_encoder_hidden_state": jnp.asarray(context),
        "loss_weight": jnp.asarray(loss_weight),
    }
    if masked:
        batch["latent_mask"] = jnp.asarray(mask)
    coeffs = JaxCoeffs.from_betas(jnp.asarray(_betas()))
    data, _ = sd_predict(
        _toy_unet_jax(conv, ctx_proj), None, {}, None, batch,
        jax.random.PRNGKey(seed), cfg, coeffs)
    losses = diffusion_losses(batch, data, loss_cfg, coeffs)
    return np.asarray(losses), data, batch


def _compose_torch(ref_cfg, prediction_type, seed, masked,
                   noise, timestep):
    """The reference composition on the SAME noise/timestep draws:
    scale -> _add_noise_discrete -> denoise -> eps/velocity target ->
    _diffusion_losses (reference: BaseStableDiffusionSetup.py:155-230 +
    calculate_loss -> ModelSetupDiffusionLossMixin)."""
    from modules.util.DiffusionScheduleCoefficients import (
        DiffusionScheduleCoefficients as RefCoeffs,
    )

    latent, context, loss_weight, mask = _inputs(seed)
    betas = torch.from_numpy(_betas().copy())
    vae_scaling_factor = 0.18215  # SD1.5 (sd_train_step default)

    scaled = _nchw(latent) * vae_scaling_factor
    noise_t = _nchw(noise)
    ts = torch.from_numpy(np.asarray(timestep, np.int64))
    noisy = _ref_diffusion_mixin()._add_noise_discrete(
        scaled, noise_t, ts, betas)
    ctx_t = torch.from_numpy(context.copy())
    conv, ctx_proj = _fixed_weights()
    predicted = _toy_unet_torch(conv, ctx_proj, noisy, ts, ctx_t)

    if prediction_type == "v_prediction":
        # diffusers get_velocity (the reference calls
        # model.noise_scheduler.get_velocity, BaseStableDiffusionSetup.py
        # :225): v = sqrt(acp)*noise - sqrt(1-acp)*x0, via the
        # reference's own coefficient table
        coeffs = RefCoeffs.from_betas(betas)
        sac = coeffs.sqrt_alphas_cumprod[ts].reshape(-1, 1, 1, 1)
        somac = coeffs.sqrt_one_minus_alphas_cumprod[ts].reshape(-1, 1, 1, 1)
        target = sac * noise_t - somac * scaled
    else:
        target = noise_t

    data = {
        "loss_type": "target",
        "timestep": ts,
        "predicted": predicted,
        "target": target,
        "scaled_latent_image": scaled,
        "noisy_latent_image": noisy,
    }
    if prediction_type == "v_prediction":
        data["prediction_type"] = "v_prediction"
    batch = {"loss_weight": torch.from_numpy(loss_weight.copy())}
    if masked:
        batch["latent_mask"] = _nchw(mask)
    return _ref_mixin()._diffusion_losses(
        batch, data, ref_cfg, torch.device("cpu"), betas=betas).numpy()


def _run_composed(prediction_type, masked, *, seed=11, **cfg_kw):
    ref_cfg = _ref_config(masked=masked, **cfg_kw)
    # epsilon capture run: target == noise bitwise, so the jax-drawn
    # noise is recoverable exactly; the same PRNGKey re-draws identical
    # noise/timesteps for the v-prediction run (same splits, shapes)
    eps_losses, eps_data, _ = _compose_jax(ref_cfg, "epsilon", seed, masked)
    noise = np.asarray(eps_data["target"], np.float32)
    timestep = np.asarray(eps_data["timestep"])
    if prediction_type == "epsilon":
        jax_losses = eps_losses
    else:
        jax_losses, data, _ = _compose_jax(ref_cfg, prediction_type, seed,
                                           masked)
        # the re-run really did draw the same noise/timesteps
        np.testing.assert_array_equal(np.asarray(data["timestep"]), timestep)
    ref_losses = _compose_torch(ref_cfg, prediction_type, seed, masked,
                                noise, timestep)
    np.testing.assert_allclose(jax_losses, ref_losses, rtol=2e-4, atol=2e-5)
    assert np.isfinite(jax_losses).all()


def test_composed_step_epsilon_mse():
    _run_composed("epsilon", False, mse=1.0)


def test_composed_step_epsilon_full_loss_stack_masked():
    _run_composed("epsilon", True, mse=1.0, mae=0.3, log_cosh=0.2,
                  loss_scaler="BATCH", unmasked_weight=0.1, normalize=True)


def test_composed_step_vpred_min_snr():
    _run_composed("v_prediction", False, mse=1.0,
                  loss_weight_fn="MIN_SNR_GAMMA", loss_weight_strength=5.0)


def test_composed_step_vpred_masked_debiased():
    _run_composed("v_prediction", True, mse=1.0, mae=0.2,
                  loss_weight_fn="DEBIASED_ESTIMATION",
                  unmasked_weight=0.2)
