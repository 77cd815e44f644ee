"""Reference-anchored goldens for timestep sampling and noise creation.

Imports the reference's OWN ModelSetupNoiseMixin
(/root/reference/modules/modelSetup/mixin/ModelSetupNoiseMixin.py — torch
plus config/enum imports only, no diffusers/mgds) and asserts the jax
implementations in math/timesteps.py and math/noise.py match it:

- the discrete multinomial WEIGHT TABLES (COS_MAP/SIGMOID x shift) are
  compared exactly — these are trace-time constants on both sides, so the
  comparison is rng-free. This golden caught a real divergence: the
  reference applies the shift map to an already-shifted linspace in the
  SIGMOID branch (line 147 reuses the `linspace` variable reassigned at
  line 127), ~11% of peak weight at shift=3.
- the continuous paths (UNIFORM/LOGIT_NORMAL/HEAVY_TAIL, static + dynamic
  FLUX mu shift) are replayed by injecting torch's own draws into the jax
  code via monkeypatched jax.random primitives, then asserting the integer
  timesteps agree (|diff| <= 1; float32 truncation at a bucket boundary is
  the only allowed slack — a formula divergence shifts by many buckets).
- _create_noise's offset/perturbation composition is replayed the same
  way and compared exactly.
"""
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from onetrainer_tpu.math.noise import create_noise  # noqa: E402
from onetrainer_tpu.math.timesteps import (  # noqa: E402
    TimestepConfig, _discrete_weights, sample_timesteps_continuous,
    sample_timesteps_discrete,
)
from onetrainer_tpu.util.enums import TimestepDistribution  # noqa: E402


def _ref_mixin():
    from modules.modelSetup.mixin.ModelSetupNoiseMixin import (
        ModelSetupNoiseMixin,
    )

    class M(ModelSetupNoiseMixin):
        pass

    return M()


def _ref_dist(name):
    from modules.util.enum.TimestepDistribution import (
        TimestepDistribution as RefTD,
    )
    return getattr(RefTD, name)


def _ref_config(name, *, shift=1.0, dynamic=False, bias=0.0, weight=0.0,
                min_strength=0.0, max_strength=1.0):
    return types.SimpleNamespace(
        timestep_distribution=_ref_dist(name),
        min_noising_strength=min_strength,
        max_noising_strength=max_strength,
        noising_bias=bias,
        noising_weight=weight,
        timestep_shift=shift,
        dynamic_timestep_shifting=dynamic,
        train_device="cpu",
    )


def _jax_config(name, ref_cfg):
    return TimestepConfig(
        distribution=getattr(TimestepDistribution, name),
        min_noising_strength=ref_cfg.min_noising_strength,
        max_noising_strength=ref_cfg.max_noising_strength,
        noising_weight=ref_cfg.noising_weight,
        noising_bias=ref_cfg.noising_bias,
        timestep_shift=ref_cfg.timestep_shift,
        dynamic_timestep_shifting=ref_cfg.dynamic_timestep_shifting,
    )


# -- discrete weight tables (rng-free, exact) ------------------------------------------

@pytest.mark.parametrize("name", ["COS_MAP", "SIGMOID"])
@pytest.mark.parametrize("shift", [1.0, 0.5, 3.0])
@pytest.mark.parametrize("window", [(0.0, 1.0), (0.25, 0.85)])
def test_discrete_weight_tables_match_reference(name, shift, window):
    bias, weight = (0.25, 1.5) if name == "SIGMOID" else (0.0, 0.0)
    ref_cfg = _ref_config(name, shift=shift, bias=bias, weight=weight,
                          min_strength=window[0], max_strength=window[1])
    mixin = _ref_mixin()
    g = torch.Generator().manual_seed(0)
    mixin._get_timestep_discrete(1000, False, g, 4, ref_cfg)
    ref_w = getattr(mixin, "_ModelSetupNoiseMixin__weights").numpy()

    num_timestep = int(1000 * window[1]) - int(1000 * window[0])
    mine = np.asarray(_discrete_weights(
        _jax_config(name, ref_cfg), num_timestep, shift))
    assert mine.shape == ref_w.shape
    np.testing.assert_allclose(mine, ref_w, rtol=2e-5, atol=1e-7 * ref_w.max())


# -- continuous paths, replayed with torch's own draws ---------------------------------

def _inject(monkeypatch, uniforms=None, normals=None):
    """Make jax.random.uniform/normal return torch's draws (by call order,
    shape-checked); create_noise/timesteps call them positionally."""
    if uniforms is not None:
        queue_u = [jnp.asarray(u.numpy()) for u in uniforms]

        def fake_uniform(key, shape=(), **kw):
            v = queue_u.pop(0)
            assert tuple(shape) == v.shape, (shape, v.shape)
            return v
        monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    if normals is not None:
        queue_n = [jnp.asarray(n.numpy()) for n in normals]

        def fake_normal(key, shape=(), dtype=jnp.float32, **kw):
            v = queue_n.pop(0)
            assert tuple(shape) == v.shape, (shape, v.shape)
            return v.astype(dtype)
        monkeypatch.setattr(jax.random, "normal", fake_normal)


@pytest.mark.parametrize("shift", [1.0, 3.0])
@pytest.mark.parametrize("window", [(0.0, 1.0), (0.1, 0.9)])
def test_uniform_matches_reference(monkeypatch, shift, window):
    ref_cfg = _ref_config("UNIFORM", shift=shift,
                          min_strength=window[0], max_strength=window[1])
    g = torch.Generator().manual_seed(7)
    ref_t = _ref_mixin()._get_timestep_discrete(1000, False, g, 64, ref_cfg)

    g2 = torch.Generator().manual_seed(7)
    u = torch.rand(64, generator=g2)
    _inject(monkeypatch, uniforms=[u])
    mine = sample_timesteps_discrete(jax.random.PRNGKey(0), 64,
                                     _jax_config("UNIFORM", ref_cfg))
    assert np.abs(np.asarray(mine) - ref_t.numpy()).max() <= 1


def test_logit_normal_matches_reference(monkeypatch):
    ref_cfg = _ref_config("LOGIT_NORMAL", shift=3.0, bias=0.5, weight=1.0)
    g = torch.Generator().manual_seed(11)
    ref_t = _ref_mixin()._get_timestep_discrete(1000, False, g, 64, ref_cfg)

    g2 = torch.Generator().manual_seed(11)
    n = torch.normal(0.5, 2.0, size=(64,), generator=g2)
    # my path computes bias + scale * normal(0,1): feed the standardized draw
    std = (n.to(torch.float64) - 0.5) / 2.0
    _inject(monkeypatch, normals=[std.to(torch.float32)])
    mine = sample_timesteps_discrete(jax.random.PRNGKey(0), 64,
                                     _jax_config("LOGIT_NORMAL", ref_cfg))
    assert np.abs(np.asarray(mine) - ref_t.numpy()).max() <= 1


def test_heavy_tail_matches_reference(monkeypatch):
    ref_cfg = _ref_config("HEAVY_TAIL", shift=3.0, weight=0.8)
    g = torch.Generator().manual_seed(13)
    ref_t = _ref_mixin()._get_timestep_discrete(1000, False, g, 64, ref_cfg)

    g2 = torch.Generator().manual_seed(13)
    u = torch.rand(64, generator=g2)
    _inject(monkeypatch, uniforms=[u])
    mine = sample_timesteps_discrete(jax.random.PRNGKey(0), 64,
                                     _jax_config("HEAVY_TAIL", ref_cfg))
    assert np.abs(np.asarray(mine) - ref_t.numpy()).max() <= 1


def test_dynamic_flux_mu_shift_matches_reference(monkeypatch):
    """exp(mu) from the image sequence length (FLUX recipe), replayed end
    to end through the UNIFORM path at 128x96 latents."""
    ref_cfg = _ref_config("UNIFORM", dynamic=True)
    g = torch.Generator().manual_seed(17)
    ref_t = _ref_mixin()._get_timestep_discrete(
        1000, False, g, 64, ref_cfg, latent_width=128, latent_height=96)

    g2 = torch.Generator().manual_seed(17)
    u = torch.rand(64, generator=g2)
    _inject(monkeypatch, uniforms=[u])
    mine = sample_timesteps_discrete(
        jax.random.PRNGKey(0), 64, _jax_config("UNIFORM", ref_cfg),
        latent_width=128, latent_height=96)
    assert np.abs(np.asarray(mine) - ref_t.numpy()).max() <= 1


def test_deterministic_paths_match_reference():
    mixin = _ref_mixin()
    ref_cfg = _ref_config("UNIFORM")
    g = torch.Generator()
    ref_d = mixin._get_timestep_discrete(1000, True, g, 1, ref_cfg)
    ref_c = mixin._get_timestep_continuous(True, g, 3, ref_cfg)

    cfg = _jax_config("UNIFORM", ref_cfg)
    mine_d = sample_timesteps_discrete(jax.random.PRNGKey(0), 1, cfg,
                                       deterministic=True)
    mine_c = sample_timesteps_continuous(jax.random.PRNGKey(0), 3, cfg,
                                         deterministic=True)
    assert int(mine_d[0]) == int(ref_d[0])
    np.testing.assert_allclose(np.asarray(mine_c), ref_c.numpy())


def test_continuous_discretization_matches_reference(monkeypatch):
    """_get_timestep_continuous: 10000 buckets, +1, /10000."""
    ref_cfg = _ref_config("UNIFORM", shift=2.0)
    g = torch.Generator().manual_seed(19)
    ref_c = _ref_mixin()._get_timestep_continuous(False, g, 64, ref_cfg)

    g2 = torch.Generator().manual_seed(19)
    u = torch.rand(64, generator=g2)
    _inject(monkeypatch, uniforms=[u])
    mine = sample_timesteps_continuous(jax.random.PRNGKey(0), 64,
                                       _jax_config("UNIFORM", ref_cfg))
    # one 1/10000 bucket of slack for float32 truncation boundaries
    assert np.abs(np.asarray(mine) - ref_c.numpy()).max() <= 1e-4 + 1e-7


# -- noise composition ------------------------------------------------------------------

@pytest.mark.parametrize("offset,perturb", [(0.0, 0.0), (0.35, 0.0),
                                            (0.0, 0.2), (0.35, 0.2)])
def test_create_noise_matches_reference(monkeypatch, offset, perturb):
    shape = (2, 4, 8, 8)
    ref_cfg = types.SimpleNamespace(offset_noise_weight=offset,
                                    perturbation_noise_weight=perturb,
                                    train_device="cpu")
    g = torch.Generator().manual_seed(23)
    src = torch.zeros(shape, dtype=torch.float32)
    ref_noise = _ref_mixin()._create_noise(src, ref_cfg, g)

    # replay the same draws in reference order: base, [offset], [perturb]
    g2 = torch.Generator().manual_seed(23)
    draws = [torch.randn(shape, generator=g2)]
    if offset > 0:
        draws.append(torch.randn((2, 4, 1, 1), generator=g2))
    if perturb > 0:
        draws.append(torch.randn(shape, generator=g2))
    # my create_noise always calls normal for base first, then offset,
    # then perturbation (each gated on weight > 0)
    _inject(monkeypatch, normals=draws)
    mine = create_noise(jax.random.PRNGKey(0), shape, jnp.float32,
                        offset_noise_weight=offset,
                        perturbation_noise_weight=perturb)
    np.testing.assert_allclose(np.asarray(mine), ref_noise.numpy(),
                               rtol=1e-6, atol=1e-6)


# -- forward noising (diffusion + flow matching) ----------------------------------------

def _ref_flow_mixin():
    from modules.modelSetup.mixin.ModelSetupFlowMatchingMixin import (
        ModelSetupFlowMatchingMixin,
    )

    class M(ModelSetupFlowMatchingMixin):
        pass

    return M()


def _ref_diff_mixin():
    from modules.modelSetup.mixin.ModelSetupDiffusionMixin import (
        ModelSetupDiffusionMixin,
    )

    class M(ModelSetupDiffusionMixin):
        pass

    return M()


def test_add_noise_flow_matching_matches_reference():
    from onetrainer_tpu.math.noise import add_noise_flow_matching

    rng = np.random.default_rng(29)
    latent = rng.normal(size=(3, 4, 8, 8)).astype(np.float32)
    noise = rng.normal(size=(3, 4, 8, 8)).astype(np.float32)
    t = np.array([0, 499, 999], np.int32)

    ref_noisy, ref_sigmas = _ref_flow_mixin()._add_noise_discrete(
        torch.from_numpy(latent), torch.from_numpy(noise),
        torch.from_numpy(t.astype(np.int64)), torch.zeros(1000))
    noisy, sigmas = add_noise_flow_matching(
        jnp.asarray(latent), jnp.asarray(noise), jnp.asarray(t), 1000)
    np.testing.assert_allclose(np.asarray(noisy), ref_noisy.numpy(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sigmas), ref_sigmas.numpy(),
                               rtol=1e-6)


def test_add_noise_discrete_matches_reference():
    from onetrainer_tpu.math.noise import add_noise_discrete
    from onetrainer_tpu.math.schedules import make_betas

    betas = np.asarray(make_betas("scaled_linear"), np.float32)
    alphas_cumprod = np.cumprod(1.0 - betas)
    rng = np.random.default_rng(31)
    latent = rng.normal(size=(3, 4, 8, 8)).astype(np.float32)
    noise = rng.normal(size=(3, 4, 8, 8)).astype(np.float32)
    t = np.array([0, 123, 999], np.int32)

    ref = _ref_diff_mixin()._add_noise_discrete(
        torch.from_numpy(latent), torch.from_numpy(noise),
        torch.from_numpy(t.astype(np.int64)), torch.from_numpy(betas))
    mine = add_noise_discrete(
        jnp.asarray(latent), jnp.asarray(noise), jnp.asarray(t),
        jnp.sqrt(jnp.asarray(alphas_cumprod)),
        jnp.sqrt(1.0 - jnp.asarray(alphas_cumprod)))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_add_noise_continuous_matches_reference():
    from onetrainer_tpu.math.noise import add_noise_continuous

    rng = np.random.default_rng(37)
    latent = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    noise = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    ac = np.array([0.91, 0.13], np.float32)

    def ac_fun(timestep, ndim):
        v = torch.from_numpy(ac)
        while v.dim() < ndim:
            v = v.unsqueeze(-1)
        return v

    ref = _ref_diff_mixin()._add_noise_continuous(
        torch.from_numpy(latent), torch.from_numpy(noise),
        torch.from_numpy(np.array([0.1, 0.9], np.float32)), ac_fun)
    mine = add_noise_continuous(jnp.asarray(latent), jnp.asarray(noise),
                                jnp.asarray(ac))
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_ztsnr_rescale_matches_reference():
    """modules/util/convert/rescale_noise_scheduler_to_zero_terminal_snr.py
    (arXiv 2305.08891) replayed against math/schedules.py
    rescale_betas_zero_terminal_snr."""
    from modules.util.convert.rescale_noise_scheduler_to_zero_terminal_snr \
        import rescale_noise_scheduler_to_zero_terminal_snr

    from onetrainer_tpu.math.schedules import (
        make_betas, rescale_betas_zero_terminal_snr,
    )

    betas = np.asarray(make_betas("scaled_linear"), np.float32)
    sched = types.SimpleNamespace(
        alphas_cumprod=torch.cumprod(1.0 - torch.from_numpy(betas.copy()),
                                     dim=0))
    ref_betas = rescale_noise_scheduler_to_zero_terminal_snr(sched).numpy()
    mine = np.asarray(rescale_betas_zero_terminal_snr(jnp.asarray(betas)))
    # identical formula; slack is float32 cumprod accumulation order
    np.testing.assert_allclose(mine, ref_betas, rtol=1e-4, atol=1e-6)
    # the defining property, via the reference's own output: terminal
    # alpha_bar is exactly zero
    np.testing.assert_allclose(
        float(np.cumprod(1.0 - mine)[-1]), 0.0, atol=1e-10)
