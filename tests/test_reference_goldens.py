"""Reference-anchored goldens (VERDICT r2 missing #2).

These tests import the reference's OWN torch implementations from
/root/reference (its math modules are torch-only — no diffusers/mgds
needed) and assert the jax implementations match them on randomized
inputs. Unlike the re-derived goldens elsewhere in tests/, a failure
here means the repo diverged from the reference's actual code, not from
a transcription of it.

Anchored modules:
  modules/util/loss/masked_loss.py:5-45
  modules/util/loss/vb_loss.py (public vb_losses)
  modules/util/DiffusionScheduleCoefficients.py:5-62
  modules/util/bf16_stochastic_rounding.py:5-31
  modules/util/lr_scheduler_util.py:5-103
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


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


# -- masked losses --------------------------------------------------------------------

@pytest.mark.parametrize("unmasked_weight", [0.0, 0.1, 0.6])
@pytest.mark.parametrize("normalize", [False, True])
def test_masked_losses_matches_reference(unmasked_weight, normalize):
    from modules.util.loss.masked_loss import masked_losses as ref_masked

    from onetrainer_tpu.math.losses import masked_losses

    rng = np.random.RandomState(0)
    losses = rng.rand(3, 4, 8, 8).astype(np.float32)
    mask = (rng.rand(3, 1, 8, 8) > 0.5).astype(np.float32)

    # the reference mutates `losses` in place -> pass a fresh tensor
    ref = ref_masked(_t(losses), _t(mask), unmasked_weight, normalize)
    ours = masked_losses(jnp.asarray(losses), jnp.asarray(mask),
                         unmasked_weight, normalize)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("prior_weight", [0.0, 0.5, 2.0])
@pytest.mark.parametrize("normalize", [False, True])
def test_masked_losses_with_prior_matches_reference(prior_weight, normalize):
    from modules.util.loss.masked_loss import (
        masked_losses_with_prior as ref_masked_prior,
    )

    from onetrainer_tpu.math.losses import masked_losses_with_prior

    rng = np.random.RandomState(1)
    losses = rng.rand(2, 4, 8, 8).astype(np.float32)
    prior = rng.rand(2, 4, 8, 8).astype(np.float32)
    mask = rng.rand(2, 1, 8, 8).astype(np.float32)

    ref = ref_masked_prior(_t(losses), _t(prior), _t(mask), 0.2, normalize,
                           prior_weight)
    ours = masked_losses_with_prior(
        jnp.asarray(losses), jnp.asarray(prior), jnp.asarray(mask), 0.2,
        normalize, prior_weight)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


# -- diffusion schedule coefficients --------------------------------------------------

def test_schedule_coefficients_match_reference():
    from modules.util.DiffusionScheduleCoefficients import (
        DiffusionScheduleCoefficients as RefCoeffs,
    )

    from onetrainer_tpu.math.schedules import (
        DiffusionScheduleCoefficients, make_betas,
    )

    betas = np.asarray(make_betas("scaled_linear"), np.float32)
    ref = RefCoeffs.from_betas(torch.from_numpy(betas.copy()))
    ours = DiffusionScheduleCoefficients.from_betas(jnp.asarray(betas))

    for field in ("betas", "alphas_cumprod", "alphas_cumprod_prev",
                  "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
                  "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
                  "sqrt_recipm1_alphas_cumprod", "posterior_variance",
                  "posterior_log_variance_clipped", "posterior_mean_coef1",
                  "posterior_mean_coef2"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, field)),
            getattr(ref, field).numpy(),
            rtol=3e-5, atol=1e-7, err_msg=field)
    assert ours.num_timesteps == ref.num_timesteps


# -- variational-bound loss -----------------------------------------------------------

def test_vb_losses_match_reference():
    from modules.util.DiffusionScheduleCoefficients import (
        DiffusionScheduleCoefficients as RefCoeffs,
    )
    from modules.util.loss.vb_loss import vb_losses as ref_vb

    from onetrainer_tpu.math.losses import vb_losses
    from onetrainer_tpu.math.schedules import (
        DiffusionScheduleCoefficients, make_betas,
    )

    betas = np.asarray(make_betas("scaled_linear"), np.float32)
    ref_coeffs = RefCoeffs.from_betas(torch.from_numpy(betas.copy()))
    coeffs = DiffusionScheduleCoefficients.from_betas(jnp.asarray(betas))

    rng = np.random.RandomState(2)
    x0 = rng.randn(4, 4, 8, 8).astype(np.float32).clip(-1, 1)
    # include t=0 (decoder NLL branch) and late timesteps (KL branch)
    t = np.asarray([0, 1, 500, 999], np.int64)
    # realistic inputs: x_t is x_0 properly forward-noised, and the eps
    # prediction is the true noise plus a small error — keeps the loss off
    # the log-clamp floor where torch/XLA tanh ulps diverge
    noise = rng.randn(4, 4, 8, 8).astype(np.float32)
    sac = np.asarray(coeffs.sqrt_alphas_cumprod)[t][:, None, None, None]
    s1m = np.asarray(coeffs.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
    xt = (sac * x0 + s1m * noise).astype(np.float32)
    eps = (noise + 0.05 * rng.randn(4, 4, 8, 8)).astype(np.float32)
    var = (rng.rand(4, 4, 8, 8).astype(np.float32) * 2 - 1)

    ref = ref_vb(ref_coeffs, _t(x0), _t(xt), torch.from_numpy(t),
                 _t(eps), _t(var)).numpy()
    ours = np.asarray(vb_losses(coeffs, jnp.asarray(x0), jnp.asarray(xt),
                                jnp.asarray(t), jnp.asarray(eps),
                                jnp.asarray(var)))
    # at the log(clamp(cdf_delta, 1e-12)) floor (≈ 39.86 bits) torch and
    # XLA tanh can differ by one ulp and flip sides of the clamp; compare
    # below the floor, and only assert both saturate above it
    floor = 35.0
    tail = ref >= floor
    assert tail.mean() < 0.02
    np.testing.assert_allclose(ours[~tail], ref[~tail], rtol=2e-4, atol=2e-4)
    assert (ours[tail] >= floor).all()


# -- bf16 stochastic rounding ---------------------------------------------------------

def test_stochastic_rounding_matches_reference_support_and_mean():
    """The rounding is random, so anchor (a) the support: both
    implementations may only produce the two bf16 neighbors the reference's
    bit-trick produces, (b) exactness on bf16-representable values, and
    (c) unbiasedness: the empirical mean of both matches the fp32 source."""
    from modules.util.bf16_stochastic_rounding import copy_stochastic_

    from onetrainer_tpu.ops.stochastic import stochastic_round_to_bf16

    src = np.float32(1.0 + 1.0 / 3.0)   # not bf16-representable
    n = 4000

    # reference support + mean
    torch.manual_seed(0)
    tgt = torch.zeros(n, dtype=torch.bfloat16)
    copy_stochastic_(tgt, torch.full((n,), src, dtype=torch.float32))
    ref_vals = set(np.unique(tgt.to(torch.float32).numpy()).tolist())
    assert len(ref_vals) == 2   # the two bf16 neighbors

    ours = stochastic_round_to_bf16(
        jnp.full((n,), src, jnp.float32), jax.random.PRNGKey(0))
    our_vals = set(np.unique(np.asarray(ours, np.float32)).tolist())
    assert our_vals == ref_vals

    ref_mean = tgt.to(torch.float32).numpy().mean()
    our_mean = float(np.asarray(ours, np.float32).mean())
    gap = max(ref_vals) - min(ref_vals)
    assert abs(ref_mean - src) < 0.05 * gap
    assert abs(our_mean - src) < 0.05 * gap

    # bf16-representable values round exactly, like the reference
    exact = np.float32(0.5)
    tgt1 = torch.zeros(4, dtype=torch.bfloat16)
    copy_stochastic_(tgt1, torch.full((4,), exact, dtype=torch.float32))
    assert (tgt1.to(torch.float32).numpy() == exact).all()
    ours1 = stochastic_round_to_bf16(
        jnp.full((4,), exact, jnp.float32), jax.random.PRNGKey(1))
    assert (np.asarray(ours1, np.float32) == exact).all()


# -- LR schedules ---------------------------------------------------------------------

def test_lr_schedules_match_reference():
    import modules.util.lr_scheduler_util as ref_lr

    from onetrainer_tpu.train.lr_schedules import make_lr_lambda, with_warmup
    from onetrainer_tpu.util.enums import LearningRateScheduler as S

    steps = 100
    cases = [
        (S.CONSTANT, ref_lr.lr_lambda_constant(), {}),
        (S.LINEAR, ref_lr.lr_lambda_linear(steps, 0.1),
         {"min_factor": 0.1}),
        (S.COSINE, ref_lr.lr_lambda_cosine(steps, 0.05),
         {"min_factor": 0.05}),
        (S.COSINE_WITH_RESTARTS,
         ref_lr.lr_lambda_cosine_with_restarts(steps, 3.0, 0.0),
         {"num_cycles": 3.0}),
        (S.COSINE_WITH_HARD_RESTARTS,
         ref_lr.lr_lambda_cosine_with_hard_restarts(steps, 2.5, 0.0),
         {"num_cycles": 2.5}),
        (S.REX, ref_lr.lr_lambda_rex(steps, 0.2), {"min_factor": 0.2}),
    ]
    probe = np.arange(0, steps + 20)
    for sched, ref_fn, kwargs in cases:
        ours_fn = make_lr_lambda(sched, steps, **kwargs)
        ref_curve = np.asarray([ref_fn(int(s)) for s in probe], np.float64)
        our_curve = np.asarray([float(ours_fn(jnp.asarray(float(s))))
                                for s in probe], np.float64)
        np.testing.assert_allclose(our_curve, ref_curve, rtol=1e-5,
                                   atol=1e-7, err_msg=str(sched))

    # warmup composition (reference lr_lambda_warmup: shifted base curve)
    ref_w = ref_lr.lr_lambda_warmup(10, ref_lr.lr_lambda_cosine(steps, 0.0))
    our_w = with_warmup(make_lr_lambda(S.COSINE, steps), 10)
    for s in probe:
        assert abs(float(our_w(jnp.asarray(float(s)))) - ref_w(int(s))) < 1e-5


# -- checkpoint hash ------------------------------------------------------------------

def test_modelspec_hash_matches_reference_semantics():
    """The reference hashes ONLY tensor bytes in key-sorted order
    (DtypeModelSaverMixin.py:47-61 via safetensors._tobytes); key names are
    not mixed into the digest. Recompute with torch exactly as the
    reference does and compare."""
    import hashlib

    from onetrainer_tpu.util.model_spec import sha256_of_tensors

    rng = np.random.RandomState(3)
    tensors = {
        "b.weight": rng.randn(4, 4).astype(np.float32),
        "a.weight": rng.randn(8).astype(np.float32),
        "c.bias": rng.randn(2, 3).astype(np.float32),
    }
    h = hashlib.sha256()
    for key in sorted(tensors):
        # torch .contiguous().view(-1) bytes == safetensors._tobytes for
        # contiguous fp32 tensors
        h.update(torch.from_numpy(tensors[key]).contiguous().numpy().tobytes())
    assert sha256_of_tensors(tensors) == "0x" + h.hexdigest()
