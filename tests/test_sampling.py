import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.math.schedules import make_betas
from onetrainer_tpu.sampling import schedulers as sched
from onetrainer_tpu.util.enums import NoiseScheduler
from tests.test_train_step import tiny_sd_model, init_model_params


@pytest.mark.parametrize("kind", [
    NoiseScheduler.DDIM, NoiseScheduler.EULER, NoiseScheduler.EULER_A,
    NoiseScheduler.EULER_KARRAS, NoiseScheduler.DPMPP,
    NoiseScheduler.DPMPP_KARRAS, NoiseScheduler.DPMPP_SDE,
    NoiseScheduler.UNIPC, NoiseScheduler.UNIPC_KARRAS,
    NoiseScheduler.DPMPP_SDE_KARRAS,
])
def test_scheduler_recovers_x0_with_perfect_eps(kind):
    """If the model predicts the true eps at every step, the sampler must
    walk from pure noise back to (approximately) x0."""
    betas = make_betas()
    state = sched.create_scheduler(kind, betas, 25)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 8, 4)) * 0.3
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)

    if state.sigmas is not None:
        sample = x0 + float(state.sigmas[0]) * eps
    else:
        t0 = int(state.timesteps[0])
        ac = float(state.alphas_cumprod[t0])
        sample = np.sqrt(ac) * x0 + np.sqrt(1 - ac) * eps

    history = {}
    for i in range(len(state.timesteps)):
        if state.sigmas is not None:
            sigma = float(state.sigmas[i])
            true_eps = (sample - x0) / sigma
        else:
            t = int(state.timesteps[i])
            ac = float(state.alphas_cumprod[t])
            true_eps = (sample - np.sqrt(ac) * x0) / np.sqrt(1 - ac)
        sample = sched.step(state, true_eps, i, sample,
                            rng=jax.random.PRNGKey(100 + i), history=history)

    err = float(jnp.abs(sample - x0).mean())
    # stochastic samplers tolerate more
    tol = 0.25 if kind in (NoiseScheduler.EULER_A, NoiseScheduler.DPMPP_SDE,
                           NoiseScheduler.DPMPP_SDE_KARRAS) else 0.06
    assert err < tol, f"{kind}: err {err}"


def test_ddim_timesteps_trailing():
    betas = make_betas()
    state = sched.create_scheduler(NoiseScheduler.DDIM, betas, 20,
                                   force_last_timestep=True)
    assert int(state.timesteps[0]) == 999  # ZTSNR: start at the last timestep


def test_sd_sampler_end_to_end():
    from onetrainer_tpu.sampling.sd_sampler import sample_stable_diffusion
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    vae_params = model.vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(0))["params"]

    def tokenize(prompt):
        ids = np.zeros((8,), np.int32)
        ids[-1] = 99
        return ids

    cfg = SampleConfig.default_values()
    cfg.height = 32
    cfg.width = 32
    cfg.diffusion_steps = 3
    out = sample_stable_diffusion(
        model, unet_params, te_params, vae_params, tokenize, cfg)
    assert out.image.shape == (32, 32, 3)
    assert out.image.dtype == np.uint8


def test_sd_inpaint_sampler_end_to_end(tmp_path):
    """9-channel inpaint unet sampling: mask erode + conditioning latent
    channels per step (reference: FluxSampler.__sample_inpainting pattern)."""
    from PIL import Image

    from onetrainer_tpu.models.sd import StableDiffusionModel
    from onetrainer_tpu.models.unet import UNetConfig
    from onetrainer_tpu.models.vae import VAEConfig
    from onetrainer_tpu.models.clip import CLIPTextConfig
    from onetrainer_tpu.sampling.sd_sampler import sample_stable_diffusion
    from onetrainer_tpu.util.enums import ModelType

    model = StableDiffusionModel(
        model_type=ModelType.STABLE_DIFFUSION_15_INPAINTING,
        unet_config=UNetConfig(
            in_channels=9, block_out_channels=(32, 64),
            cross_attn_blocks=(True, False), layers_per_block=1,
            transformer_layers_per_block=(1, 1), num_heads=(4, 4),
            cross_attention_dim=32, dtype=jnp.float32),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             dtype=jnp.float32),
        te_config=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=4, max_position_embeddings=16, eos_token_id=99,
            dtype=jnp.float32),
    )
    rng = jax.random.PRNGKey(0)
    unet_params = model.unet.init(
        rng, jnp.zeros((1, 4, 4, 9)), jnp.asarray([1]),
        jnp.zeros((1, 8, 32)))["params"]
    te_params = model.text_encoder.init(rng, jnp.zeros((1, 8), jnp.int32))["params"]
    vae_params = model.vae.init(
        rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]

    base = tmp_path / "base.png"
    maskp = tmp_path / "mask.png"
    Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(base)
    m = np.zeros((32, 32), np.uint8)
    m[8:24, 8:24] = 255
    Image.fromarray(m).save(maskp)

    def tokenize(prompt):
        ids = np.zeros((8,), np.int32)
        ids[-1] = 99
        return ids

    cfg = SampleConfig.default_values()
    cfg.height = 32
    cfg.width = 32
    cfg.diffusion_steps = 3
    cfg.sample_inpainting = True
    cfg.base_image_path = str(base)
    cfg.mask_image_path = str(maskp)
    out = sample_stable_diffusion(
        model, unet_params, te_params, vae_params, tokenize, cfg)
    assert out.image.shape == (32, 32, 3)


def test_flux_fill_mask_channels():
    from onetrainer_tpu.sampling.inpaint import flux_fill_mask_channels
    mask = np.zeros((16, 16, 1), np.float32)
    mask[0:8, 0:8] = 1.0   # top-left latent cell fully masked
    out = flux_fill_mask_channels(mask, scale=8)
    assert out.shape == (2, 2, 64)
    np.testing.assert_allclose(out[0, 0], 1.0)
    np.testing.assert_allclose(out[0, 1], 0.0)
    # mean is preserved (loss-normalization invariant)
    assert abs(out.mean() - mask.mean()) < 1e-6


def test_sample_rng_for_random_seed():
    # reference: FluxSampler.py:71-75 — random_seed draws OS entropy,
    # otherwise the fixed config seed reproduces
    from onetrainer_tpu.config.sample_config import SampleConfig
    from onetrainer_tpu.sampling.sd_sampler import sample_rng_for

    sc = SampleConfig.default_values()
    sc.seed = 42
    assert (sample_rng_for(sc) == sample_rng_for(sc)).all()
    sc.random_seed = True
    assert not (sample_rng_for(sc) == sample_rng_for(sc)).all()
