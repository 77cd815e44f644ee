"""COMPOSED end-to-end step golden for FLUX (VERDICT r4 next #8).

FLUX has the most conditioning plumbing of the flow families: 2x2
latent packing, latent image position ids, the dynamic µ-shifted
timestep, guidance embeds, and T5+CLIP-pooled conditioning. This file
runs the full shift/scale -> µ-shifted flow noising -> pack -> ids ->
denoise -> unpack -> flow target -> loss COMPOSITION both ways on
identical inputs:

- jax side: the real `flux_predict` + `flow_matching_losses` path the
  trainer jits (train/flux_train_step.py), cached-TE conditioning, with
  a tiny fixed-weight stand-in transformer operating on the PACKED
  sequence that consumes every conditioning input — a per-patch channel
  mixer (sensitive to the pack layout), the raw img_ids, the guidance
  scalar, T5 mean and CLIP pooled (the 12B transformer itself cannot be
  torch-anchored here — diffusers is not installed, STATUS.md gate).
- torch side: the reference's composition re-assembled: the importable
  ModelSetupFlowMatchingMixin._add_noise_discrete and
  ModelSetupDiffusionLossMixin._flow_matching_losses, plus the
  pack/ids assembly transcribed formula-by-formula from the reference
  (FluxModel.prepare_latent_image_ids:300-317, pack_latents:319-331,
  unpack_latents:333-344 — FluxModel itself imports diffusers and is
  not importable in this image), wired exactly like
  BaseFluxSetup.predict/calculate_loss (reference:
  modules/modelSetup/BaseFluxSetup.py:229-313).

Timestep-grid note (documented in docs/Parity.md): the reference
samples FLUX timesteps on the 1000-step discrete grid
(BaseFluxSetup.py:239 -> _get_timestep_discrete) and conditions the
transformer on idx/1000; this framework samples the reference's OWN
10000-bucket continuous discretization (ModelSetupNoiseMixin.
_get_timestep_continuous:157-181 — the grid its continuous-noising
families use) and conditions on sigma itself. The torch side below
therefore runs the reference's _add_noise_discrete over a 10000-entry
sigma table (the mixin is grid-size-agnostic: sigma = (idx+1)/N) and
conditions its toy on the same sigma, isolating the rest of the
composition; the grid-resolution/conditioning delta is the documented
deviation.

RNG discipline: flow targets satisfy target = noise - scaled, so the
jax noise draw is recovered exactly; per-sample sigma is recovered from
the noising identity and asserted to sit on the 1/10000 grid.
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
from onetrainer_tpu.train.flux_train_step import flux_predict  # noqa: E402
from onetrainer_tpu.train.sd_train_step import SDStepConfig  # noqa: E402
from onetrainer_tpu.util.enums import TrainingMethod  # noqa: E402
from tests.test_reference_goldens_loss_mixin import (  # noqa: E402
    _jax_config, _ref_config, _ref_mixin,
)

B, H, W, C = 2, 8, 8, 16        # FLUX: 16-channel latents, 2x2 packing
S, PACKED_C = (H // 2) * (W // 2), C * 4
T5_LEN, T5_DIM, POOL_DIM = 5, 24, 12
N_T, N_GRID = 1000, 10000
GUIDANCE = 3.5
# FLUX latent space constants (setup/families wiring; reference:
# FluxModel vae config shift/scaling factors)
VAE_SHIFT, VAE_SCALE = 0.1159, 0.3611


def _fixed_weights():
    rng = np.random.default_rng(41)
    patch_mix = rng.normal(
        scale=0.1, size=(PACKED_C, PACKED_C)).astype(np.float32)
    t5_proj = rng.normal(scale=0.2, size=(T5_DIM, PACKED_C)).astype(np.float32)
    pool_proj = rng.normal(
        scale=0.2, size=(POOL_DIM, PACKED_C)).astype(np.float32)
    ids_proj = rng.normal(scale=0.2, size=(3, PACKED_C)).astype(np.float32)
    guidance_vec = rng.normal(scale=0.2, size=(PACKED_C,)).astype(np.float32)
    return patch_mix, t5_proj, pool_proj, ids_proj, guidance_vec


class _ToyTransformerJax:
    """Stand-in with flux_predict's exact call signature:
    apply(variables, packed, t, pooled, t5_states, img_ids, txt_ids,
    guidance) -> packed prediction. The patch mixer makes the output
    sensitive to the channel order WITHIN each packed 2x2 patch; the
    ids/guidance terms pin their assembly."""

    def __init__(self, patch_mix, t5_proj, pool_proj, ids_proj,
                 guidance_vec):
        self.patch_mix = jnp.asarray(patch_mix)
        self.t5_proj = jnp.asarray(t5_proj)
        self.pool_proj = jnp.asarray(pool_proj)
        self.ids_proj = jnp.asarray(ids_proj)
        self.guidance_vec = jnp.asarray(guidance_vec)

    def apply(self, variables, packed, t, pooled, t5_states, img_ids,
              txt_ids, guidance):
        x = packed.astype(jnp.float32)
        temb = t.astype(jnp.float32)[:, None, None]
        mixed = x @ self.patch_mix
        c = t5_states.mean(axis=1).astype(jnp.float32) @ self.t5_proj
        p = pooled.astype(jnp.float32) @ self.pool_proj
        pos = (img_ids.astype(jnp.float32) / 4.0) @ self.ids_proj
        g = guidance.astype(jnp.float32)[:, None, None] \
            * self.guidance_vec[None, None, :]
        return (x * (1.0 + temb) + mixed + c[:, None, :] + p[:, None, :]
                + pos[None, :, :] + g)


def _toy_transformer_torch(weights, packed, sigma, pooled, t5_states,
                           img_ids, guidance):
    patch_mix, t5_proj, pool_proj, ids_proj, guidance_vec = weights
    x = packed.to(torch.float32)
    temb = sigma.to(torch.float32)[:, None, None]
    mixed = x @ torch.from_numpy(patch_mix.copy())
    c = t5_states.mean(dim=1) @ torch.from_numpy(t5_proj.copy())
    p = pooled @ torch.from_numpy(pool_proj.copy())
    pos = (img_ids.to(torch.float32) / 4.0) @ torch.from_numpy(
        ids_proj.copy())
    g = guidance.to(torch.float32)[:, None, None] \
        * torch.from_numpy(guidance_vec.copy())[None, None, :]
    return (x * (1.0 + temb) + mixed + c[:, None, :] + p[:, None, :]
            + pos[None, :, :] + g)


def _ref_pack_latents(latents_nchw):
    """Transcription of FluxModel.pack_latents:319-331."""
    b, c, h, w = latents_nchw.shape
    x = latents_nchw.view(b, c, h // 2, 2, w // 2, 2)
    x = x.permute(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def _ref_unpack_latents(latents, height, width):
    """Transcription of FluxModel.unpack_latents:333-344."""
    b, _, channels = latents.shape
    h2, w2 = height // 2, width // 2
    x = latents.view(b, h2, w2, channels // 4, 2, 2)
    x = x.permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, channels // 4, h2 * 2, w2 * 2)


def _ref_prepare_latent_image_ids(height, width):
    """Transcription of FluxModel.prepare_latent_image_ids:300-317
    (takes the LATENT height/width like the reference call site,
    BaseFluxSetup.py:275-280)."""
    ids = torch.zeros(height // 2, width // 2, 3)
    ids[..., 1] = ids[..., 1] + torch.arange(height // 2)[:, None]
    ids[..., 2] = ids[..., 2] + torch.arange(width // 2)[None, :]
    return ids.reshape((height // 2) * (width // 2), 3)


def _inputs(seed):
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(B, H, W, C)).astype(np.float32)
    t5 = rng.normal(size=(B, T5_LEN, T5_DIM)).astype(np.float32)
    pooled = rng.normal(size=(B, POOL_DIM)).astype(np.float32)
    loss_weight = rng.uniform(0.4, 2.0, size=(B,)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W, 1)) > 0.5).astype(np.float32)
    return latent, t5, pooled, loss_weight, mask


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc, np.float32),
                                         (0, 3, 1, 2)).copy())


class _Model:
    pass


def _compose_jax(ref_cfg, seed, masked):
    latent, t5, pooled, loss_weight, mask = _inputs(seed)
    loss_cfg = _jax_config(ref_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        # dynamic µ-shift ON: exercises flux_mu_shift + the shifted draw
        timestep=TimestepConfig(dynamic_timestep_shifting=True),
        loss=loss_cfg,
        stochastic_rounding=False,
        vae_scaling_factor=VAE_SCALE,
        vae_shift_factor=VAE_SHIFT,
        num_train_timesteps=N_T,
    )
    model = _Model()
    model.transformer = _ToyTransformerJax(*_fixed_weights())
    batch = {
        "latent_image": jnp.asarray(latent),
        "t5_hidden_state": jnp.asarray(t5),
        "clip_pooled_state": jnp.asarray(pooled),
        "loss_weight": jnp.asarray(loss_weight),
    }
    if masked:
        batch["latent_mask"] = jnp.asarray(mask)
    data = flux_predict(model, {}, None, None, batch,
                        jax.random.PRNGKey(seed), cfg,
                        guidance_scale=GUIDANCE)
    losses = flow_matching_losses(batch, data, loss_cfg, N_T)
    return np.asarray(losses), data


def _recover_sigma(data):
    """Per-sample sigma from noisy = scaled + sigma*target; asserts it
    sits on the 1/10000 continuous grid flux_predict samples."""
    scaled = np.asarray(data["scaled_latent_image"], np.float32)
    noisy = np.asarray(data["noisy_latent_image"], np.float32)
    target = np.asarray(data["target"], np.float32)
    num = ((noisy - scaled) * target).reshape(B, -1).sum(axis=1)
    den = (target * target).reshape(B, -1).sum(axis=1)
    sigma = num / den
    grid = np.round(sigma * N_GRID)
    np.testing.assert_allclose(sigma * N_GRID, grid, atol=5e-3)
    assert (grid >= 1).all() and (grid <= N_GRID).all()
    return grid.astype(np.int64) / N_GRID


def _run_composed(masked, *, seed=43, **cfg_kw):
    ref_cfg = _ref_config(masked=masked, **cfg_kw)
    jax_losses, data = _compose_jax(ref_cfg, seed, masked)
    sigma = _recover_sigma(data)
    latent, t5, pooled, loss_weight, mask = _inputs(seed)
    scaled_t = (_nchw(latent) - VAE_SHIFT) * VAE_SCALE
    noise_t = _nchw(np.asarray(data["target"], np.float32)
                    + np.asarray(data["scaled_latent_image"], np.float32))

    from modules.modelSetup.mixin.ModelSetupFlowMatchingMixin import (
        ModelSetupFlowMatchingMixin,
    )

    class F(ModelSetupFlowMatchingMixin):
        pass

    # the reference mixin over the 10000-entry grid: sigma = (idx+1)/N
    ts_grid = torch.from_numpy(
        (np.round(sigma * N_GRID) - 1).astype(np.int64))
    noisy_t, sigmas_used = F()._add_noise_discrete(
        scaled_t, noise_t, ts_grid, torch.zeros(N_GRID))
    # cross-check: the reference noising reproduces the jax noisy latent
    np.testing.assert_allclose(
        np.asarray(data["noisy_latent_image"], np.float32),
        np.transpose(noisy_t.numpy(), (0, 2, 3, 1)), rtol=1e-5, atol=1e-5)

    # conditioning assembly, the reference way (BaseFluxSetup.py:264-306)
    img_ids = _ref_prepare_latent_image_ids(H, W)
    packed = _ref_pack_latents(noisy_t)
    # cross-check: jax pack layout == reference pack layout, patch for
    # patch (models/flux.pack_latents vs FluxModel.pack_latents)
    from onetrainer_tpu.models.flux import pack_latents as jax_pack
    np.testing.assert_allclose(
        np.asarray(jax_pack(jnp.asarray(
            np.asarray(data["noisy_latent_image"], np.float32)))),
        packed.numpy(), rtol=1e-6, atol=1e-6)

    guidance = torch.full((B,), GUIDANCE)
    sigma_t = torch.from_numpy(sigma.astype(np.float32))
    predicted_packed = _toy_transformer_torch(
        _fixed_weights(), packed, sigma_t,
        torch.from_numpy(pooled.copy()), torch.from_numpy(t5.copy()),
        img_ids, guidance)
    predicted = _ref_unpack_latents(predicted_packed, H, W)

    ts_loss = torch.from_numpy(np.asarray(data["timestep"], np.int64))
    data_t = {
        "loss_type": "target",
        "timestep": ts_loss,
        "predicted": predicted,
        "target": noise_t - scaled_t,
        "scaled_latent_image": scaled_t,
        "noisy_latent_image": noisy_t,
    }
    batch_t = {"loss_weight": torch.from_numpy(loss_weight.copy())}
    if masked:
        batch_t["latent_mask"] = _nchw(mask)
    sigmas_table = torch.linspace(1.0 / N_T, 1.0, N_T)
    ref_losses = _ref_mixin()._flow_matching_losses(
        batch_t, data_t, ref_cfg, torch.device("cpu"),
        sigmas=sigmas_table).numpy()
    np.testing.assert_allclose(jax_losses, ref_losses, rtol=2e-4, atol=2e-5)
    assert np.isfinite(jax_losses).all()


def test_composed_flux_step_mse():
    _run_composed(False, mse=1.0)


def test_composed_flux_step_full_stack_masked():
    _run_composed(True, mse=1.0, mae=0.3, log_cosh=0.2,
                  loss_scaler="BATCH", unmasked_weight=0.1, normalize=True)


def test_composed_flux_step_sigma_weight():
    _run_composed(False, mse=1.0, mae=0.2, loss_weight_fn="SIGMA",
                  loss_scaler="BOTH")


def test_composed_flux_guidance_and_ids_are_load_bearing():
    """Sanity that the golden pins guidance/ids wiring: changing the
    guidance scale must change the prediction."""
    ref_cfg = _ref_config(masked=False, mse=1.0)
    _, data = _compose_jax(ref_cfg, 43, False)
    latent, t5, pooled, loss_weight, mask = _inputs(43)
    loss_cfg = _jax_config(ref_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE,
        timestep=TimestepConfig(dynamic_timestep_shifting=True),
        loss=loss_cfg, stochastic_rounding=False,
        vae_scaling_factor=VAE_SCALE, vae_shift_factor=VAE_SHIFT)
    model = _Model()
    model.transformer = _ToyTransformerJax(*_fixed_weights())
    batch = {
        "latent_image": jnp.asarray(latent),
        "t5_hidden_state": jnp.asarray(t5),
        "clip_pooled_state": jnp.asarray(pooled),
        "loss_weight": jnp.asarray(loss_weight),
    }
    data2 = flux_predict(model, {}, None, None, batch,
                         jax.random.PRNGKey(43), cfg, guidance_scale=1.0)
    assert not np.allclose(np.asarray(data["predicted"]),
                           np.asarray(data2["predicted"]))
