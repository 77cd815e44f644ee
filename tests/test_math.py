import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.math.losses import (
    LossConfig, debiased_estimation_weight, diffusion_losses,
    flow_matching_losses, log_cosh_loss, masked_losses,
    masked_losses_with_prior, min_snr_weight, p2_loss_weight, vb_losses,
)
from onetrainer_tpu.math.noise import (
    add_noise_discrete, add_noise_flow_matching, create_noise,
)
from onetrainer_tpu.math.schedules import (
    DiffusionScheduleCoefficients, make_betas, rescale_betas_zero_terminal_snr,
)
from onetrainer_tpu.math.timesteps import (
    TimestepConfig, flux_mu_shift, sample_timesteps_continuous,
    sample_timesteps_discrete,
)
from onetrainer_tpu.util.enums import LossScaler, LossWeight, TimestepDistribution


def test_schedule_coefficients_match_numpy():
    betas = np.asarray(make_betas())
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    coeffs = DiffusionScheduleCoefficients.from_betas(jnp.asarray(betas))
    np.testing.assert_allclose(np.asarray(coeffs.alphas_cumprod), ac, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(coeffs.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(coeffs.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / ac - 1), rtol=1e-4)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    post_var = betas * (1 - ac_prev) / (1 - ac)
    np.testing.assert_allclose(np.asarray(coeffs.posterior_variance), post_var, rtol=1e-4)


def test_ztsnr_rescale():
    betas = make_betas()
    rescaled = rescale_betas_zero_terminal_snr(betas)
    ac = jnp.cumprod(1 - rescaled)
    # terminal SNR is zero
    assert float(ac[-1]) == pytest.approx(0.0, abs=1e-10)
    # first value preserved
    orig_ac = jnp.cumprod(1 - betas)
    assert float(ac[0]) == pytest.approx(float(orig_ac[0]), rel=1e-5)


def test_log_cosh_matches_reference_formula():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(log_cosh_loss(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x))))
    want = np.log(np.cosh(x.astype(np.float64)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_masked_losses():
    losses = jnp.ones((2, 4, 8, 8))
    mask = jnp.zeros((2, 4, 8, 8))
    out = masked_losses(losses, mask, unmasked_weight=0.1, normalize_masked_area_loss=False)
    np.testing.assert_allclose(np.asarray(out), 0.1)
    # normalization divides by the clamped-mask mean
    out = masked_losses(losses, mask, unmasked_weight=0.1, normalize_masked_area_loss=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_masked_losses_with_prior():
    losses = jnp.ones((1, 1, 2, 2))
    prior = jnp.full((1, 1, 2, 2), 2.0)
    mask = jnp.asarray([[[[1.0, 1.0], [0.0, 0.0]]]])
    out = masked_losses_with_prior(
        losses, prior, mask, unmasked_weight=0.0,
        normalize_masked_area_loss=False, masked_prior_preservation_weight=0.5)
    # masked area: 1*1; unmasked area gets prior 2*1*0.5 = 1
    np.testing.assert_allclose(np.asarray(out), [[[[1.0, 1.0], [1.0, 1.0]]]])


def test_snr_weights():
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    t = jnp.asarray([0, 500, 999])
    snr = coeffs.snr(t)
    # snr decreases with t
    s = np.asarray(snr)
    assert s[0] > s[1] > s[2]
    w = np.asarray(min_snr_weight(snr, 5.0, False))
    np.testing.assert_allclose(w, np.minimum(s, 5.0) / s, rtol=1e-5)
    w_v = np.asarray(min_snr_weight(snr, 5.0, True))
    np.testing.assert_allclose(w_v, np.minimum(s, 5.0) / (s + 1), rtol=1e-5)
    d = np.asarray(debiased_estimation_weight(snr, False))
    np.testing.assert_allclose(d, 1 / np.sqrt(np.clip(s, None, 1e3)), rtol=1e-5)
    p2 = np.asarray(p2_loss_weight(snr, 1.0, False))
    np.testing.assert_allclose(p2, 1 / (1 + s), rtol=1e-5)


def test_add_noise_discrete_formula():
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = jnp.asarray([100, 900])
    noisy = add_noise_discrete(
        x0, noise, t, coeffs.sqrt_alphas_cumprod, coeffs.sqrt_one_minus_alphas_cumprod)
    want = (np.asarray(x0) * np.asarray(coeffs.sqrt_alphas_cumprod)[np.asarray(t)][:, None, None, None]
            + np.asarray(noise) * np.asarray(coeffs.sqrt_one_minus_alphas_cumprod)[np.asarray(t)][:, None, None, None])
    np.testing.assert_allclose(np.asarray(noisy), want, rtol=1e-5)


def test_add_noise_flow_matching():
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.zeros((2, 4, 4, 4))
    t = jnp.asarray([499, 999])
    noisy, sigmas = add_noise_flow_matching(x0, noise, t, 1000)
    np.testing.assert_allclose(np.asarray(sigmas).ravel(), [0.5, 1.0])
    np.testing.assert_allclose(np.asarray(noisy[0]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(noisy[1]), 0.0, atol=1e-6)


def test_create_noise_offset_changes_stats():
    rng = jax.random.PRNGKey(0)
    base = create_noise(rng, (64, 4, 8, 8), jnp.float32)
    assert abs(float(base.mean())) < 0.05
    offset = create_noise(rng, (64, 4, 8, 8), jnp.float32, offset_noise_weight=0.5)
    # per-(sample,channel) means get a 0.5-scaled gaussian offset
    ch_means = np.asarray(offset).mean(axis=(2, 3))
    assert ch_means.std() > 0.3


def test_timesteps_uniform_window():
    cfg = TimestepConfig(min_noising_strength=0.2, max_noising_strength=0.8)
    t = sample_timesteps_discrete(jax.random.PRNGKey(0), 4096, cfg)
    t = np.asarray(t)
    assert t.min() >= 200
    assert t.max() < 800
    # roughly uniform
    hist, _ = np.histogram(t, bins=6, range=(200, 800))
    assert hist.min() > 0.7 * hist.max()


def test_timesteps_deterministic():
    cfg = TimestepConfig()
    t = sample_timesteps_discrete(jax.random.PRNGKey(0), 3, cfg, deterministic=True)
    np.testing.assert_array_equal(np.asarray(t), [499, 499, 499])


def test_timesteps_shift_moves_mass():
    # shift > 1 moves timesteps towards the high-noise end (FLUX convention)
    cfg_shift = TimestepConfig(timestep_shift=3.0)
    cfg_plain = TimestepConfig()
    t_shift = np.asarray(sample_timesteps_discrete(jax.random.PRNGKey(0), 8192, cfg_shift))
    t_plain = np.asarray(sample_timesteps_discrete(jax.random.PRNGKey(0), 8192, cfg_plain))
    assert t_shift.mean() > t_plain.mean() + 100


def test_timesteps_logit_normal():
    cfg = TimestepConfig(distribution=TimestepDistribution.LOGIT_NORMAL)
    t = np.asarray(sample_timesteps_discrete(jax.random.PRNGKey(0), 8192, cfg))
    # logit-normal concentrates around the middle
    assert 400 < np.median(t) < 600
    assert (t < 100).mean() < 0.1


def test_timesteps_heavy_tail():
    cfg = TimestepConfig(distribution=TimestepDistribution.HEAVY_TAIL, noising_weight=1.0)
    t = np.asarray(sample_timesteps_discrete(jax.random.PRNGKey(0), 8192, cfg))
    assert t.min() >= 0 and t.max() < 1000


def test_timesteps_discrete_distributions():
    for dist in (TimestepDistribution.COS_MAP, TimestepDistribution.SIGMOID):
        cfg = TimestepConfig(distribution=dist, noising_weight=1.0)
        t = np.asarray(sample_timesteps_discrete(jax.random.PRNGKey(0), 4096, cfg))
        assert t.min() >= 0 and t.max() < 1000


def test_timesteps_continuous():
    cfg = TimestepConfig()
    t = np.asarray(sample_timesteps_continuous(jax.random.PRNGKey(0), 4096, cfg))
    assert t.min() > 0 and t.max() <= 1.0
    assert abs(t.mean() - 0.5) < 0.02


def test_flux_mu_shift():
    # 1024px latents: 128x128 latent -> 64*64=4096 tokens -> shift = exp(1.15)
    assert flux_mu_shift(128, 128) == pytest.approx(math.exp(1.15), rel=1e-6)
    # 256 tokens -> exp(0.5)
    assert flux_mu_shift(32, 32) == pytest.approx(math.exp(0.5), rel=1e-6)


def _loss_data(batch_size=2):
    rng = np.random.default_rng(0)
    predicted = rng.normal(size=(batch_size, 4, 8, 8)).astype(np.float32)
    target = rng.normal(size=(batch_size, 4, 8, 8)).astype(np.float32)
    batch = {
        'loss_weight': jnp.ones((batch_size,)),
        'latent_mask': jnp.ones((batch_size, 4, 8, 8)),
    }
    data = {
        'predicted': jnp.asarray(predicted),
        'target': jnp.asarray(target),
        'timestep': jnp.asarray([100, 800]),
        'loss_type': 'target',
    }
    return batch, data, predicted, target


def test_diffusion_losses_mse():
    batch, data, predicted, target = _loss_data()
    cfg = LossConfig(mse_strength=1.0, vb_loss_strength=0.0)
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    losses = np.asarray(diffusion_losses(batch, data, cfg, coeffs))
    want = ((predicted - target) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(losses, want, rtol=1e-5)


def test_diffusion_losses_composite_and_scaler():
    batch, data, predicted, target = _loss_data()
    cfg = LossConfig(mse_strength=0.5, mae_strength=0.5, vb_loss_strength=0.0,
                     loss_scaler=LossScaler.BATCH, batch_size=4)
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    losses = np.asarray(diffusion_losses(batch, data, cfg, coeffs))
    want = (0.5 * ((predicted - target) ** 2).mean(axis=(1, 2, 3))
            + 0.5 * np.abs(predicted - target).mean(axis=(1, 2, 3))) * 4
    np.testing.assert_allclose(losses, want, rtol=1e-5)


def test_diffusion_losses_min_snr():
    batch, data, predicted, target = _loss_data()
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    cfg = LossConfig(vb_loss_strength=0.0, loss_weight_fn=LossWeight.MIN_SNR_GAMMA,
                     loss_weight_strength=5.0)
    losses = np.asarray(diffusion_losses(batch, data, cfg, coeffs))
    snr = np.asarray(coeffs.snr(data['timestep']))
    want = ((predicted - target) ** 2).mean(axis=(1, 2, 3)) * np.minimum(snr, 5.0) / snr
    np.testing.assert_allclose(losses, want, rtol=1e-5)


def test_vb_losses_finite_and_positive_kl():
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 8, 8)).astype(np.float32))
    t = jnp.asarray([5, 500])
    noise = jnp.asarray(rng.normal(size=(2, 4, 8, 8)).astype(np.float32))
    xt = add_noise_discrete(x0, noise, t, coeffs.sqrt_alphas_cumprod,
                            coeffs.sqrt_one_minus_alphas_cumprod)
    var_values = jnp.zeros_like(x0)
    out = np.asarray(vb_losses(coeffs, x0, xt, t, noise, var_values))
    assert np.isfinite(out).all()
    assert (out >= -1e-5).all()  # KL ≥ 0 analytically; fp32 roundoff
    # perfect eps prediction at t>0 gives a small KL
    assert out[1].mean() < 0.01


def test_flow_matching_losses_sigma_weight():
    batch, data, predicted, target = _loss_data()
    cfg = LossConfig(vb_loss_strength=0.0, loss_weight_fn=LossWeight.SIGMA)
    losses = np.asarray(flow_matching_losses(batch, data, cfg))
    sigmas = (np.asarray([100, 800]) + 1) / 1000
    want = ((predicted - target) ** 2).mean(axis=(1, 2, 3)) * sigmas
    np.testing.assert_allclose(losses, want, rtol=1e-5)


def test_masked_diffusion_losses():
    batch, data, predicted, target = _loss_data()
    mask = np.zeros((2, 4, 8, 8), dtype=np.float32)
    mask[:, :, :4] = 1.0
    batch['latent_mask'] = jnp.asarray(mask)
    cfg = LossConfig(vb_loss_strength=0.0, masked_training=True, unmasked_weight=0.1)
    coeffs = DiffusionScheduleCoefficients.from_betas(make_betas())
    losses = np.asarray(diffusion_losses(batch, data, cfg, coeffs))
    clamped = np.clip(mask, 0.1, 1.0)
    want = (((predicted - target) ** 2) * clamped).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(losses, want, rtol=1e-5)
