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


def test_download_filter_matches_reference_categories():
    # reference: BaseCloud._filter_download:70-80
    config = _config()
    config.cloud.download_samples = False
    config.cloud.download_saves = True
    config.cloud.download_backups = False
    config.cloud.download_tensorboard = True
    cloud = LinuxCloud(config)
    assert not cloud.filter_download("samples/step-100.png")
    assert cloud.filter_download("save/model-1.safetensors")
    assert not cloud.filter_download("backup/2024-backup-1/meta.json")
    assert cloud.filter_download("tensorboard/events.out.tfevents")
    assert cloud.filter_download("other/notes.txt")


def test_hf_env_exports_in_train_command():
    # reference: LinuxCloud.py:146-149 (HF_TOKEN / HF_HOME exports)
    config = _config()
    config.secrets.huggingface_token = "hf_secret"
    config.cloud.huggingface_cache_dir = "/workspace/hf"
    cmd = LinuxCloud(config).train_command()
    assert "export HF_TOKEN=hf_secret" in cmd
    assert "export HF_HOME=/workspace/hf" in cmd


def test_detached_actions():
    # reference: LinuxCloud.py:160-162 + RunpodCloud._get_action_cmd:93-99
    import pytest

    from onetrainer_tpu.cloud.runpod_cloud import RunpodCloud
    from onetrainer_tpu.util.enums import CloudAction

    config = _config()
    config.cloud.detach_trainer = True
    config.cloud.on_detached_finish = CloudAction.STOP
    # a plain SSH host cannot stop itself -> LinuxCloud raises like the ref
    with pytest.raises(NotImplementedError):
        LinuxCloud(config).train_command()
    cmd = RunpodCloud(config).train_command()
    assert "runpodctl stop pod $RUNPOD_POD_ID" in cmd
    config.cloud.on_detached_finish = CloudAction.NONE
    config.cloud.on_detached_error = CloudAction.DELETE
    cmd = RunpodCloud(config).train_command()
    assert "runpodctl remove pod $RUNPOD_POD_ID" in cmd


def test_runpod_pod_creation_sub_type_and_min_download():
    # reference: RunpodCloud.py:70-80 (cloud_type, min_download)
    from onetrainer_tpu.cloud.runpod_cloud import RunpodCloud

    config = _config()
    config.cloud.sub_type = "COMMUNITY"
    config.cloud.min_download = 700
    query = RunpodCloud(config).create_pod_query()
    assert "cloudType: COMMUNITY" in query
    assert "minDownload: 700" in query
    config.cloud.sub_type = ""
    config.cloud.min_download = 0
    query = RunpodCloud(config).create_pod_query()
    assert "cloudType: SECURE" in query
    assert "minDownload" not in query


def test_tensorboard_tunnel_command():
    # reference: BaseCloud.py:25-26, LinuxCloud tunnel :101-111
    config = _config()
    config.tensorboard_port = 7007
    cmd = LinuxCloud(config).tensorboard_tunnel_command()
    assert "-N" in cmd and "-L" in cmd
    assert "7007:localhost:7007" in cmd
    assert cmd[-1] == "root@203.0.113.7"


def test_cloud_trainer_lifecycle_actions():
    # reference: CloudTrainer.end:115-142 — on_error / on_finish actions,
    # user stop runs none, delete_workspace only on a clean finish
    from onetrainer_tpu.trainer.cloud_trainer import CloudTrainer
    from onetrainer_tpu.util.enums import CloudAction, CloudType

    class FakeCloud:
        def __init__(self):
            self.calls = []
        def sync_workspace(self, ws):
            self.calls.append("sync")
        def delete_workspace(self):
            self.calls.append("delete_workspace")
        def close(self):
            self.calls.append("close")
        def stop(self):
            self.calls.append("stop")
        def delete(self):
            self.calls.append("delete")

    import tempfile

    def make(**cloud_fields):
        config = _config()
        config.cloud.type = CloudType.LINUX
        config.tensorboard = False
        config.concepts = []   # to_pack_dict would read concept_file_name
        config.samples = []    # ... and sample_definition_file_name
        config.workspace_dir = tempfile.mkdtemp(prefix="ot_cloud_test_")
        for k, v in cloud_fields.items():
            setattr(config.cloud, k, v)
        trainer = CloudTrainer(config)
        trainer.cloud = FakeCloud()
        return trainer

    t = make(on_finish=CloudAction.STOP, delete_workspace=True)
    t.end()
    assert t.cloud.calls == ["sync", "delete_workspace", "close", "stop"]

    t = make(on_finish=CloudAction.STOP, on_error=CloudAction.DELETE)
    t.error_caught = True
    t.end()
    assert "delete" in t.cloud.calls and "stop" not in t.cloud.calls
    assert "delete_workspace" not in t.cloud.calls

    t = make(on_finish=CloudAction.DELETE, delete_workspace=True)
    t.commands.stop()  # user-requested stop -> no action, keep workspace
    t.end()
    assert "delete" not in t.cloud.calls
    assert "delete_workspace" not in t.cloud.calls


def test_remote_config_path_remap():
    # reference: CloudTrainer.__make_remote_config:145-186 +
    # __adjust_path:189-197 — local paths move under <remote_dir>/remote/,
    # cloud:-prefixed paths pass through unprefixed, HF ids stay
    from onetrainer_tpu.trainer.cloud_trainer import CloudTrainer

    config = _config()
    config.concepts = []
    config.samples = []
    config.workspace_dir = "/home/me/ws"
    config.cache_dir = "/home/me/cache"
    config.output_model_destination = "/home/me/out/model.safetensors"
    config.base_model_name = "stabilityai/sd-base"  # HF id: untouched
    remote, local_paths = CloudTrainer._make_remote_config(config)
    assert remote.workspace_dir == "/workspace/remote/home/me/ws"
    assert remote.cache_dir == "/workspace/remote/home/me/cache"
    assert remote.output_model_destination == \
        "/workspace/remote/home/me/out/model.safetensors"
    assert remote.base_model_name == "stabilityai/sd-base"
    assert local_paths["output_model_destination"] == \
        "/home/me/out/model.safetensors"
    # the original config keeps its local paths
    assert config.workspace_dir == "/home/me/ws"

    config.workspace_dir = "cloud:/data/ws"
    remote, _ = CloudTrainer._make_remote_config(config)
    assert remote.workspace_dir == "/data/ws"
