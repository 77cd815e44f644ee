"""GenericTrainer on a multi-device mesh: FSDP-sharded frozen weights +
(data, fsdp)-sharded batches on the virtual 8-device CPU mesh."""

import os

import numpy as np
from PIL import Image

from onetrainer_tpu.trainer.generic_trainer import GenericTrainer
from tests.test_trainer import tiny_train_config, write_tiny_checkpoint
from tests.test_train_step import tiny_sd_model


def make_uniform_dataset(root, n=10, size=256):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"img{i}.png"))
        with open(os.path.join(root, f"img{i}.txt"), "w") as f:
            f.write(f"thing {i}")
    return root


def test_trainer_on_mesh(tmp_path, monkeypatch):
    monkeypatch.setenv("OT_MESH_DP", "2")
    monkeypatch.setenv("OT_MESH_FSDP", "4")
    base = str(tmp_path / "ckpt")
    ds = make_uniform_dataset(str(tmp_path / "ds"))
    model = tiny_sd_model()
    write_tiny_checkpoint(base, model)
    config = tiny_train_config(base, ds, str(tmp_path / "ws"), str(tmp_path / "cache"))
    config.epochs = 1
    config.batch_size = 8
    config.backup_before_save = False

    trainer = GenericTrainer(config)
    trainer.start()
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 2, "fsdp": 4, "sp": 1}
    trainer.train()
    trainer.end()
    assert trainer.train_progress.global_step >= 1
    assert os.path.exists(config.output_model_destination)
