from onetrainer_tpu.cloud.linux_cloud import LinuxCloud
from onetrainer_tpu.config.train_config import TrainConfig


def _config():
    config = TrainConfig.default_values()
    config.cloud.run_id = "job42"
    config.cloud.remote_dir = "/workspace"
    config.cloud.onetrainer_dir = "/workspace/onetrainer-tpu"
    config.secrets.cloud.host = "203.0.113.7"
    config.secrets.cloud.port = "2222"
    config.secrets.cloud.user = "root"
    return config


def test_ssh_command_construction():
    cloud = LinuxCloud(_config())
    assert cloud.ssh_base() == [
        "ssh", "-o", "StrictHostKeyChecking=no", "-p", "2222",
        "root@203.0.113.7"]
    assert cloud.scp_base()[:3] == ["scp", "-o", "StrictHostKeyChecking=no"]
    assert "-P" in cloud.scp_base()


def test_train_command_modes():
    config = _config()
    cloud = LinuxCloud(config)
    cmd = cloud.train_command()
    assert "scripts/train_remote.py" in cmd
    assert "/workspace/job42-config.json" in cmd
    assert "nohup" not in cmd

    config.cloud.detach_trainer = True
    cmd = LinuxCloud(config).train_command()
    assert cmd.startswith("nohup")


def test_install_command():
    config = _config()
    cloud = LinuxCloud(config)
    cmd = cloud.install_command()
    assert "git pull" in cmd
    config.cloud.install_onetrainer = False
    config.cloud.update_onetrainer = False
    assert LinuxCloud(config).install_command() == "true"


def test_sample_image_jpeg_streaming_roundtrip(tmp_path):
    """Remote sampler outputs stream as JPEG (reference pickles JPEG via
    ModelSamplerOutput.__reduce__); the local CloudTrainer rehydrates a
    SamplerOutput for its callbacks."""
    import importlib.util
    import json
    import os

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "train_remote",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "train_remote.py"))
    tr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tr)

    from onetrainer_tpu.sampling.sd_sampler import SamplerOutput
    from onetrainer_tpu.trainer.cloud_trainer import CloudTrainer

    events = tmp_path / "events.jsonl"
    callbacks = tr.make_streaming_callbacks(str(events))
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = 200
    callbacks.on_sample_default(SamplerOutput(image=img))

    line = json.loads(events.read_text().splitlines()[0])
    assert line["event"] == "on_sample_default"
    assert "image_jpeg_b64" in line["args"][0]

    decoded = CloudTrainer._decode_sample_args(line["args"])
    assert isinstance(decoded[0], SamplerOutput)
    assert decoded[0].image.shape == (16, 16, 3)
    # jpeg is lossy; the bright square must survive approximately
    assert abs(int(decoded[0].image[8, 8, 0]) - 200) < 30
    assert int(decoded[0].image[0, 0, 0]) < 40
