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
