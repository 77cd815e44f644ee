"""COMPOSED end-to-end step golden for SDXL (VERDICT r4 next #8).

The trilogy (discrete / flow / warped-cosine) anchors the three noising
regimes; SDXL adds the most conditioning plumbing of the diffusion
families — concat(TE1, TE2) context, TE2 pooled embeds, and the
add_time_ids vector built from per-sample crop metadata. This file runs
the full scale -> noise -> conditioning-assembly -> denoise -> target ->
loss COMPOSITION both ways on identical inputs:

- jax side: the real `sdxl_predict` + `diffusion_losses` path the
  trainer jits (train/sdxl_train_step.py), cached-TE conditioning, with
  a tiny fixed-weight stand-in denoiser that CONSUMES every conditioning
  input — context, pooled, and a projection of the raw add_time_ids
  six-vector, so a component-order or units mistake in the time-ids
  assembly changes the loss (the UNet itself cannot be torch-anchored
  here — diffusers is not installed, an environment gate in STATUS.md).
- torch side: the reference's composition re-assembled from its own
  importable modules — ModelSetupDiffusionMixin._add_noise_discrete,
  DiffusionScheduleCoefficients.from_betas,
  ModelSetupDiffusionLossMixin._diffusion_losses — wired exactly like
  BaseStableDiffusionXLSetup.predict/calculate_loss (reference:
  modules/modelSetup/BaseStableDiffusionXLSetup.py:214-296 — in
  particular add_time_ids = stack([original_height, original_width,
  crops_coords_top, crops_coords_left, target_height, target_width],
  dim=1), lines 239-254), with the same stand-in denoiser in torch.

RNG discipline: identical to the SD1.5 composed golden — the jax-drawn
noise/timesteps are captured from the epsilon run (target == noise
bitwise) and injected into the torch composition.
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
from onetrainer_tpu.train.sd_train_step import SDStepConfig  # noqa: E402
from onetrainer_tpu.train.sdxl_train_step import sdxl_predict  # noqa: E402
from onetrainer_tpu.util.enums import TrainingMethod  # noqa: E402
from tests.test_reference_goldens_loss_mixin import (  # noqa: E402
    _betas, _jax_config, _ref_config, _ref_mixin,
)

B, H, W, C = 3, 8, 8, 4
CTX_LEN, TE1_DIM, TE2_DIM, POOL_DIM = 5, 20, 28, 16
VAE_SCALE = 0.13025     # SDXL (setup/families wiring; reference:
#                         sdxl vae config scaling_factor)


def _ref_diffusion_mixin():
    from modules.modelSetup.mixin.ModelSetupDiffusionMixin import (
        ModelSetupDiffusionMixin,
    )

    class D(ModelSetupDiffusionMixin):
        pass

    return D()


def _fixed_weights():
    rng = np.random.default_rng(29)
    conv = rng.normal(scale=0.2, size=(3, 3, C, C)).astype(np.float32)  # HWIO
    ctx_proj = rng.normal(
        scale=0.2, size=(TE1_DIM + TE2_DIM, C)).astype(np.float32)
    pool_proj = rng.normal(scale=0.2, size=(POOL_DIM, C)).astype(np.float32)
    # consumes the RAW six-vector: any reorder/units change in the
    # add_time_ids assembly shifts the prediction and fails the golden
    tids_proj = rng.normal(scale=0.2, size=(6, C)).astype(np.float32)
    return conv, ctx_proj, pool_proj, tids_proj


class _ToyUnetJax:
    """Stand-in denoiser with sdxl_predict's exact call signature:
    apply(variables, x, t, context, pooled, add_time_ids)."""

    def __init__(self, conv, ctx_proj, pool_proj, tids_proj):
        self.conv = jnp.asarray(conv)
        self.ctx_proj = jnp.asarray(ctx_proj)
        self.pool_proj = jnp.asarray(pool_proj)
        self.tids_proj = jnp.asarray(tids_proj)

    def apply(self, variables, x, t, context, pooled, add_time_ids):
        temb = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        h = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), self.conv, window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c = context.mean(axis=1).astype(jnp.float32) @ self.ctx_proj
        p = pooled.astype(jnp.float32) @ self.pool_proj
        # /1024: keep the pixel-unit metadata O(1) in the toy output
        ti = (add_time_ids.astype(jnp.float32) / 1024.0) @ self.tids_proj
        return (x.astype(jnp.float32) * (1.0 + temb) + h
                + c[:, None, None, :] + p[:, None, None, :]
                + ti[:, None, None, :])


def _toy_unet_torch(weights, x_nchw, t, context, pooled, add_time_ids):
    conv, ctx_proj, pool_proj, tids_proj = weights
    w = torch.from_numpy(conv.copy()).permute(3, 2, 0, 1)  # HWIO -> OIHW
    temb = (t.to(torch.float32) / 1000.0)[:, None, None, None]
    h = torch.nn.functional.conv2d(x_nchw, w, padding=1)
    c = context.mean(dim=1) @ torch.from_numpy(ctx_proj.copy())
    p = pooled @ torch.from_numpy(pool_proj.copy())
    ti = (add_time_ids.to(torch.float32) / 1024.0) \
        @ torch.from_numpy(tids_proj.copy())
    return (x_nchw * (1.0 + temb) + h + c[:, :, None, None]
            + p[:, :, None, None] + ti[:, :, None, None])


def _inputs(seed):
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(B, H, W, C)).astype(np.float32)
    h1 = rng.normal(size=(B, CTX_LEN, TE1_DIM)).astype(np.float32)
    h2 = rng.normal(size=(B, CTX_LEN, TE2_DIM)).astype(np.float32)
    pooled = rng.normal(size=(B, POOL_DIM)).astype(np.float32)
    loss_weight = rng.uniform(0.4, 2.0, size=(B,)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W, 1)) > 0.5).astype(np.float32)
    # per-sample crop metadata in pixel units, deliberately asymmetric
    # (height != width, top != left) so component order is pinned
    original_hw = rng.integers(512, 2048, size=(B, 2)).astype(np.int32)
    crop_tl = rng.integers(0, 256, size=(B, 2)).astype(np.int32)
    target_hw = rng.integers(512, 1536, size=(B, 2)).astype(np.int32)
    return (latent, h1, h2, pooled, loss_weight, mask,
            original_hw, crop_tl, target_hw)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc, np.float32),
                                         (0, 3, 1, 2)).copy())


class _Model:
    pass


def _compose_jax(ref_cfg, prediction_type, seed, masked):
    (latent, h1, h2, pooled, loss_weight, mask,
     original_hw, crop_tl, target_hw) = _inputs(seed)
    loss_cfg = _jax_config(ref_cfg,
                           v_prediction=(prediction_type == "v_prediction"))
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(),
        loss=loss_cfg,
        stochastic_rounding=False,
        prediction_type=prediction_type,
        vae_scaling_factor=VAE_SCALE,
    )
    model = _Model()
    model.unet = _ToyUnetJax(*_fixed_weights())
    batch = {
        "latent_image": jnp.asarray(latent),
        "text_encoder_hidden_state": jnp.asarray(h1),
        "text_encoder_2_hidden_state": jnp.asarray(h2),
        "text_encoder_2_pooled_state": jnp.asarray(pooled),
        "original_resolution": jnp.asarray(original_hw),
        "crop_offset": jnp.asarray(crop_tl),
        "crop_resolution": jnp.asarray(target_hw),
        "loss_weight": jnp.asarray(loss_weight),
    }
    if masked:
        batch["latent_mask"] = jnp.asarray(mask)
    coeffs = JaxCoeffs.from_betas(jnp.asarray(_betas()))
    data = sdxl_predict(model, {}, None, None, batch,
                        jax.random.PRNGKey(seed), cfg, coeffs)
    losses = diffusion_losses(batch, data, loss_cfg, coeffs)
    return np.asarray(losses), data


def _compose_torch(ref_cfg, prediction_type, seed, masked,
                   noise, timestep):
    """The reference composition on the SAME noise/timestep draws:
    scale -> _add_noise_discrete -> add_time_ids assembly -> denoise ->
    eps/velocity target -> _diffusion_losses (reference:
    BaseStableDiffusionXLSetup.py:214-296 + calculate_loss ->
    ModelSetupDiffusionLossMixin)."""
    from modules.util.DiffusionScheduleCoefficients import (
        DiffusionScheduleCoefficients as RefCoeffs,
    )

    (latent, h1, h2, pooled, loss_weight, mask,
     original_hw, crop_tl, target_hw) = _inputs(seed)
    betas = torch.from_numpy(_betas().copy())

    scaled = _nchw(latent) * VAE_SCALE
    noise_t = _nchw(noise)
    ts = torch.from_numpy(np.asarray(timestep, np.int64))
    noisy = _ref_diffusion_mixin()._add_noise_discrete(
        scaled, noise_t, ts, betas)

    # the reference's add_time_ids assembly, component by component
    # (BaseStableDiffusionXLSetup.py:239-254: batch['original_resolution']
    # is the (height, width) pair, batch['crop_offset'] is (top, left))
    original_height = torch.from_numpy(original_hw[:, 0].copy())
    original_width = torch.from_numpy(original_hw[:, 1].copy())
    crops_coords_top = torch.from_numpy(crop_tl[:, 0].copy())
    crops_coords_left = torch.from_numpy(crop_tl[:, 1].copy())
    target_height = torch.from_numpy(target_hw[:, 0].copy())
    target_width = torch.from_numpy(target_hw[:, 1].copy())
    add_time_ids = torch.stack([
        original_height, original_width,
        crops_coords_top, crops_coords_left,
        target_height, target_width,
    ], dim=1).to(dtype=noisy.dtype)

    context = torch.from_numpy(
        np.concatenate([h1, h2], axis=-1).copy())
    predicted = _toy_unet_torch(
        _fixed_weights(), noisy, ts, context,
        torch.from_numpy(pooled.copy()), add_time_ids)

    if prediction_type == "v_prediction":
        # get_velocity via the reference's own coefficient table
        # (BaseStableDiffusionXLSetup.py:287 calls
        # model.noise_scheduler.get_velocity)
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


def _run_composed(prediction_type, masked, *, seed=31, **cfg_kw):
    ref_cfg = _ref_config(masked=masked, **cfg_kw)
    eps_losses, eps_data = _compose_jax(ref_cfg, "epsilon", seed, masked)
    noise = np.asarray(eps_data["target"], np.float32)
    timestep = np.asarray(eps_data["timestep"])
    if prediction_type == "epsilon":
        jax_losses = eps_losses
    else:
        jax_losses, data = _compose_jax(ref_cfg, prediction_type, seed,
                                        masked)
        np.testing.assert_array_equal(np.asarray(data["timestep"]), timestep)
    ref_losses = _compose_torch(ref_cfg, prediction_type, seed, masked,
                                noise, timestep)
    np.testing.assert_allclose(jax_losses, ref_losses, rtol=2e-4, atol=2e-5)
    assert np.isfinite(jax_losses).all()


def test_composed_sdxl_epsilon_mse():
    _run_composed("epsilon", False, mse=1.0)


def test_composed_sdxl_epsilon_full_stack_masked():
    _run_composed("epsilon", True, mse=1.0, mae=0.3, log_cosh=0.2,
                  loss_scaler="BATCH", unmasked_weight=0.1, normalize=True)


def test_composed_sdxl_vpred_min_snr():
    _run_composed("v_prediction", False, mse=1.0,
                  loss_weight_fn="MIN_SNR_GAMMA", loss_weight_strength=5.0)


def test_composed_sdxl_time_ids_order_is_load_bearing():
    """Sanity that the golden really pins component order: swapping
    (height, width) in the jax batch must change the prediction, i.e.
    the toy consumes the raw six-vector."""
    ref_cfg = _ref_config(masked=False, mse=1.0)
    _, data = _compose_jax(ref_cfg, "epsilon", 31, False)
    (latent, h1, h2, pooled, loss_weight, mask,
     original_hw, crop_tl, target_hw) = _inputs(31)
    swapped = original_hw[:, ::-1].copy()
    loss_cfg = _jax_config(ref_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE, timestep=TimestepConfig(),
        loss=loss_cfg, stochastic_rounding=False,
        vae_scaling_factor=VAE_SCALE)
    model = _Model()
    model.unet = _ToyUnetJax(*_fixed_weights())
    batch = {
        "latent_image": jnp.asarray(latent),
        "text_encoder_hidden_state": jnp.asarray(h1),
        "text_encoder_2_hidden_state": jnp.asarray(h2),
        "text_encoder_2_pooled_state": jnp.asarray(pooled),
        "original_resolution": jnp.asarray(swapped),
        "crop_offset": jnp.asarray(crop_tl),
        "crop_resolution": jnp.asarray(target_hw),
        "loss_weight": jnp.asarray(loss_weight),
    }
    coeffs = JaxCoeffs.from_betas(jnp.asarray(_betas()))
    data_swapped = sdxl_predict(model, {}, None, None, batch,
                                jax.random.PRNGKey(31), cfg, coeffs)
    assert not np.allclose(np.asarray(data["predicted"]),
                           np.asarray(data_swapped["predicted"]))
