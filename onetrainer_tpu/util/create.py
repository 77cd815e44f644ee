"""Factory wiring point (reference: modules/util/create.py).

Maps (ModelType, TrainingMethod) onto concrete trainers/setups/loaders.
Round-1 coverage: the SD1.5/2.x family end-to-end; other families have
their configs/model code registered as they land.
"""

from __future__ import annotations

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands
from onetrainer_tpu.util.enums import ModelType, TrainingMethod


def create_trainer(config: TrainConfig, callbacks: TrainCallbacks | None = None,
                   commands: TrainCommands | None = None):
    if config.cloud.enabled:
        from onetrainer_tpu.trainer.cloud_trainer import CloudTrainer
        return CloudTrainer(config, callbacks, commands)
    from onetrainer_tpu.setup.families import get_family
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
    get_family(config.model_type)  # raises NotImplementedError when unwired
    return GenericTrainer(config, callbacks, commands)
