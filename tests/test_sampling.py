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
