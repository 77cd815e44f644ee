"""Reference-anchored goldens for the COMPOSED loss stacks.

tests/test_reference_goldens.py anchors the individual pieces (masked
losses, vb losses, schedule coefficients); this file replays the
reference's ModelSetupDiffusionLossMixin._diffusion_losses /
_flow_matching_losses END TO END — elementwise-loss selection, prior
targets, loss_scaler batch/GA scaling, per-sample loss_weight, the
unmasked-but-normalize inpaint branch, and the timestep weighting
functions (MIN_SNR_GAMMA / DEBIASED_ESTIMATION / P2 / SIGMA, eps and
v-prediction) — against math/losses.py diffusion_losses /
flow_matching_losses on randomized inputs.

(reference: modules/modelSetup/mixin/ModelSetupDiffusionLossMixin.py:36-330)
"""
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from onetrainer_tpu.math.losses import (  # noqa: E402
    LossConfig, diffusion_losses, flow_matching_losses,
)
from onetrainer_tpu.math.schedules import (  # noqa: E402
    DiffusionScheduleCoefficients as JaxCoeffs, make_betas,
)
from onetrainer_tpu.util.enums import (  # noqa: E402
    LossScaler, LossWeight,
)

SHAPE = (3, 4, 8, 8)


def _ref_mixin():
    from modules.modelSetup.mixin.ModelSetupDiffusionLossMixin import (
        ModelSetupDiffusionLossMixin,
    )

    class M(ModelSetupDiffusionLossMixin):
        pass

    return M()


def _ref_config(*, mse=1.0, mae=0.0, log_cosh=0.0, vb=0.0,
                loss_weight_fn="CONSTANT", loss_weight_strength=5.0,
                loss_scaler="NONE", batch_size=3, ga=2,
                masked=False, cond_image=False, unmasked_weight=0.1,
                normalize=False, prior_weight=0.0):
    from modules.util.enum.LossScaler import LossScaler as RefScaler
    from modules.util.enum.LossWeight import LossWeight as RefWeight
    return types.SimpleNamespace(
        mse_strength=mse, mae_strength=mae, log_cosh_strength=log_cosh,
        vb_loss_strength=vb,
        loss_weight_fn=getattr(RefWeight, loss_weight_fn),
        loss_weight_strength=loss_weight_strength,
        loss_scaler=getattr(RefScaler, loss_scaler),
        batch_size=batch_size, gradient_accumulation_steps=ga,
        masked_training=masked,
        model_type=types.SimpleNamespace(
            has_conditioning_image_input=lambda: cond_image),
        unmasked_weight=unmasked_weight,
        normalize_masked_area_loss=normalize,
        masked_prior_preservation_weight=prior_weight,
    )


def _jax_config(ref_cfg, v_prediction=False):
    return LossConfig(
        mse_strength=ref_cfg.mse_strength,
        mae_strength=ref_cfg.mae_strength,
        log_cosh_strength=ref_cfg.log_cosh_strength,
        vb_loss_strength=ref_cfg.vb_loss_strength,
        loss_weight_fn=LossWeight(ref_cfg.loss_weight_fn.value),
        loss_weight_strength=ref_cfg.loss_weight_strength,
        loss_scaler=LossScaler(ref_cfg.loss_scaler.value),
        batch_size=ref_cfg.batch_size,
        gradient_accumulation_steps=ref_cfg.gradient_accumulation_steps,
        masked_training=(ref_cfg.masked_training
                         and not ref_cfg.model_type.has_conditioning_image_input()),
        raw_masked_training=ref_cfg.masked_training,
        unmasked_weight=ref_cfg.unmasked_weight,
        normalize_masked_area_loss=ref_cfg.normalize_masked_area_loss,
        masked_prior_preservation_weight=ref_cfg.masked_prior_preservation_weight,
        v_prediction=v_prediction,
    )


def _data(seed, *, prior=False, vb=False, timestep=True):
    rng = np.random.default_rng(seed)
    data = {
        "predicted": rng.normal(size=SHAPE).astype(np.float32),
        "target": rng.normal(size=SHAPE).astype(np.float32),
        "loss_type": "target",
    }
    if prior:
        data["prior_target"] = rng.normal(size=SHAPE).astype(np.float32)
    if vb:
        data["scaled_latent_image"] = rng.normal(size=SHAPE).astype(np.float32)
        data["noisy_latent_image"] = rng.normal(size=SHAPE).astype(np.float32)
        data["predicted_var_values"] = rng.uniform(
            -1, 1, size=SHAPE).astype(np.float32)
    if timestep:
        data["timestep"] = np.array([7, 321, 983], np.int64)
    batch = {
        "loss_weight": rng.uniform(0.4, 2.0, size=(3,)).astype(np.float32),
        "latent_mask": (rng.uniform(size=(3, 1, 8, 8)) > 0.5).astype(np.float32),
    }
    return batch, data


def _to_torch(d):
    return {k: torch.from_numpy(v.copy()) if isinstance(v, np.ndarray) else v
            for k, v in d.items()}


def _to_jax(d):
    return {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
            for k, v in d.items()}


def _betas():
    return np.asarray(make_betas("scaled_linear"), np.float32)


def _run_both_diffusion(ref_cfg, batch, data, v_pred=False):
    torch_data = _to_torch(data)
    if v_pred:
        torch_data["prediction_type"] = "v_prediction"
        torch_data["loss_type"] = "target"
    ref = _ref_mixin()._diffusion_losses(
        _to_torch(batch), torch_data, ref_cfg, torch.device("cpu"),
        betas=torch.from_numpy(_betas()))
    coeffs = JaxCoeffs.from_betas(jnp.asarray(_betas()))
    mine = diffusion_losses(_to_jax(batch), _to_jax(data),
                            _jax_config(ref_cfg, v_prediction=v_pred), coeffs)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("scaler", ["NONE", "BATCH",
                                    "GRADIENT_ACCUMULATION", "BOTH"])
def test_scaler_and_loss_weight_match_reference(scaler):
    batch, data = _data(41)
    _run_both_diffusion(
        _ref_config(mse=1.0, mae=0.3, log_cosh=0.2, loss_scaler=scaler),
        batch, data)


@pytest.mark.parametrize("fn", ["MIN_SNR_GAMMA", "DEBIASED_ESTIMATION", "P2"])
@pytest.mark.parametrize("v_pred", [False, True])
def test_timestep_weighting_matches_reference(fn, v_pred):
    batch, data = _data(43)
    _run_both_diffusion(
        _ref_config(loss_weight_fn=fn, loss_weight_strength=3.0),
        batch, data, v_pred=v_pred)


def test_masked_with_prior_matches_reference():
    batch, data = _data(47, prior=True)
    _run_both_diffusion(
        _ref_config(mse=1.0, mae=0.5, masked=True, normalize=True,
                    prior_weight=0.7),
        batch, data)


def test_inpaint_unmasked_normalize_branch_matches_reference():
    """masked_training + has_conditioning_image_input: the reference takes
    __unmasked_losses but still divides by the clamped mask mean."""
    batch, data = _data(53)
    _run_both_diffusion(
        _ref_config(masked=True, cond_image=True, normalize=True),
        batch, data)


def test_vb_composite_matches_reference():
    batch, data = _data(59, vb=True)
    _run_both_diffusion(
        _ref_config(mse=1.0, vb=0.5), batch, data)


def test_flow_matching_sigma_weight_matches_reference():
    batch, data = _data(61)
    ref_cfg = _ref_config(mse=1.0, mae=0.2, loss_weight_fn="SIGMA",
                          loss_scaler="BOTH")
    sigmas = torch.linspace(1.0 / 1000, 1.0, 1000)
    ref = _ref_mixin()._flow_matching_losses(
        _to_torch(batch), _to_torch(data), ref_cfg, torch.device("cpu"),
        sigmas=sigmas)
    mine = flow_matching_losses(_to_jax(batch), _to_jax(data),
                                _jax_config(ref_cfg), 1000)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=3e-5, atol=3e-6)


def test_flow_matching_masked_matches_reference():
    batch, data = _data(67, prior=True)
    ref_cfg = _ref_config(mse=1.0, masked=True, normalize=True,
                          prior_weight=0.4)
    ref = _ref_mixin()._flow_matching_losses(
        _to_torch(batch), _to_torch(data), ref_cfg, torch.device("cpu"),
        sigmas=torch.linspace(1.0 / 1000, 1.0, 1000))
    mine = flow_matching_losses(_to_jax(batch), _to_jax(data),
                                _jax_config(ref_cfg), 1000)
    np.testing.assert_allclose(np.asarray(mine), ref.numpy(),
                               rtol=3e-5, atol=3e-6)
