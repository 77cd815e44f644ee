import glob
import json
import math
import os

import pytest

from onetrainer_tpu.config.train_config import TrainConfig, TrainOptimizerConfig
from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.util.enums import (
    DataType, GradientCheckpointingMethod, LossWeight, ModelType, Optimizer,
    TimestepDistribution, TimeUnit, TrainingMethod,
)

PRESET_DIR = "/root/reference/training_presets"


def test_default_roundtrip():
    config = TrainConfig.default_values()
    d = config.to_dict()
    assert d['__version'] == 6
    config2 = TrainConfig.default_values().from_dict(d)
    assert config2.to_dict() == d


@pytest.mark.parametrize(
    "preset", sorted(glob.glob(os.path.join(PRESET_DIR, "*.json"))),
    ids=lambda p: os.path.basename(p),
)
def test_reference_presets_load(preset):
    with open(preset) as f:
        data = json.load(f)
    config = TrainConfig.default_values().from_dict(data)
    # every preset names a model type and training method
    assert isinstance(config.model_type, ModelType)
    assert isinstance(config.training_method, TrainingMethod)
    assert isinstance(config.optimizer, TrainOptimizerConfig)
    # round trip keeps the resolved values
    d = config.to_dict()
    config2 = TrainConfig.default_values().from_dict(d)
    assert config2.to_dict() == d


def test_preset_values_sd15_lora():
    with open(os.path.join(PRESET_DIR, "#sd 1.5 LoRA.json")) as f:
        config = TrainConfig.default_values().from_dict(json.load(f))
    assert config.model_type == ModelType.STABLE_DIFFUSION_15
    assert config.training_method == TrainingMethod.LORA
    assert config.lora_rank > 0


def test_migration_0_optimizer_nesting():
    data = {
        '__version': 0,
        'optimizer': 'ADAMW',
        'optimizer_weight_decay': 0.05,
        'optimizer_beta1': 0.9,
        'learning_rate': 1e-4,
    }
    config = TrainConfig.default_values().from_dict(data)
    assert config.optimizer.optimizer == Optimizer.ADAMW
    assert config.optimizer.weight_decay == 0.05
    assert config.optimizer.beta1 == 0.9
    assert config.learning_rate == 1e-4


def test_migration_1_part_nesting():
    data = {
        '__version': 1,
        'train_unet': False,
        'unet_learning_rate': 2e-5,
        'train_text_encoder_epochs': 5,
        'vae_weight_dtype': 'FLOAT_32',
    }
    config = TrainConfig.default_values().from_dict(data)
    assert config.unet.train is False
    assert config.unet.learning_rate == 2e-5
    assert config.text_encoder.stop_training_after == 5
    assert config.text_encoder.stop_training_after_unit == TimeUnit.EPOCH
    assert config.vae.weight_dtype == DataType.FLOAT_32


def test_migration_2_min_snr():
    data = {'__version': 2, 'min_snr_gamma': 5.0}
    config = TrainConfig.default_values().from_dict(data)
    assert config.loss_weight_fn == LossWeight.MIN_SNR_GAMMA
    assert config.loss_weight_strength == 5.0


def test_migration_3_noising():
    data = {'__version': 3, 'noising_weight': 2.0, 'noising_bias': 0.7}
    config = TrainConfig.default_values().from_dict(data)
    assert config.timestep_distribution == TimestepDistribution.SIGMOID
    assert config.noising_weight == 2.0
    assert abs(config.noising_bias - 0.2) < 1e-9


def test_migration_4_gradient_checkpointing():
    config = TrainConfig.default_values().from_dict({'__version': 4, 'gradient_checkpointing': False})
    assert config.gradient_checkpointing == GradientCheckpointingMethod.OFF
    config = TrainConfig.default_values().from_dict({'__version': 4, 'gradient_checkpointing': True})
    assert config.gradient_checkpointing == GradientCheckpointingMethod.ON


def test_migration_5_save_after_rename():
    config = TrainConfig.default_values().from_dict(
        {'__version': 5, 'save_after': 7, 'save_after_unit': 'EPOCH'})
    assert config.save_every == 7
    assert config.save_every_unit == TimeUnit.EPOCH


def test_inf_float_roundtrip():
    config = TrainConfig.default_values()
    config.clip_grad_norm = float('inf')
    d = config.to_dict()
    assert d['clip_grad_norm'] == 'inf'
    config2 = TrainConfig.default_values().from_dict(d)
    assert math.isinf(config2.clip_grad_norm)


def test_concept_and_sample_configs():
    c = ConceptConfig.default_values()
    d = c.to_dict()
    assert 'image' in d and 'text' in d
    assert d['image']['enable_crop_jitter'] is True
    s = SampleConfig.default_values()
    assert s.to_dict()['cfg_scale'] == 7.0


def test_weight_dtypes_fallthrough():
    config = TrainConfig.default_values()
    config.weight_dtype = DataType.BFLOAT_16
    config.unet.weight_dtype = DataType.FLOAT_32
    dtypes = config.weight_dtypes()
    assert dtypes.unet == DataType.FLOAT_32
    assert dtypes.text_encoder == DataType.BFLOAT_16
    assert dtypes.vae == DataType.BFLOAT_16
