"""Cloud-delegated trainer (reference: modules/trainer/CloudTrainer.py:
19-204): same BaseTrainer interface, but the work happens on a remote box —
upload config, run scripts/train_remote.py there, stream its JSONL callback
events back, write commands, and sync the workspace periodically."""

from __future__ import annotations

import json
import os
import subprocess
import threading
import time
import traceback

from onetrainer_tpu.cloud.linux_cloud import LinuxCloud
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.trainer.base_trainer import BaseTrainer
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands
from onetrainer_tpu.util.enums import CloudType


class CloudTrainer(BaseTrainer):
    def __init__(self, config: TrainConfig,
                 callbacks: TrainCallbacks | None = None,
                 commands: TrainCommands | None = None):
        super().__init__(config, callbacks or TrainCallbacks(),
                         commands or TrainCommands())
        # the remote box trains against a path-remapped copy of the
        # config; self.config keeps the local paths for downloads
        # (reference: CloudTrainer.__make_remote_config:145-186)
        self.remote_config, self.local_paths = \
            self._make_remote_config(config)
        if getattr(config.cloud, "type", None) == CloudType.RUNPOD:
            from onetrainer_tpu.cloud.runpod_cloud import RunpodCloud
            self.cloud = RunpodCloud(
                self.remote_config, self.callbacks, self.commands)
        else:
            self.cloud = LinuxCloud(
                self.remote_config, self.callbacks, self.commands)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []

    # -- remote path remapping -----------------------------------------------------

    @staticmethod
    def _adjust_path(pathstr: str, remote_dir: str) -> str:
        """Map a local path under <remote_dir>/remote/ (reference:
        CloudTrainer.__adjust_path:189-197 — absolute paths lose their
        anchor/drive)."""
        if not pathstr or not pathstr.strip():
            return ""
        p = pathstr.replace("\\", "/")
        if len(p) > 1 and p[1] == ":":     # windows drive
            p = p[2:]
        p = p.lstrip("/")
        return f"{remote_dir}/remote/{p}"

    @staticmethod
    def _make_remote_config(config: TrainConfig):
        """Clone the config with workspace/cache/model paths remapped to
        the remote box; `cloud:`-prefixed paths are passed through
        unprefixed (already remote). Returns (remote_config,
        {attr: local_path} for the download side). Reference:
        CloudTrainer.__make_remote_config:145-186."""
        remote = TrainConfig.default_values().from_dict(
            config.to_pack_dict(secrets=True))
        remote.cloud = config.cloud
        remote.secrets.cloud = config.secrets.cloud
        local_paths: dict[str, str] = {}

        def adjust(obj, attr, key=None):
            path = getattr(obj, attr, "") or ""
            if path.startswith("cloud:"):
                setattr(obj, attr, path[len("cloud:"):])
            elif path:
                local_paths[key or attr] = path
                setattr(obj, attr, CloudTrainer._adjust_path(
                    path, remote.cloud.remote_dir))

        adjust(remote, "debug_dir")
        adjust(remote, "workspace_dir")
        adjust(remote, "cache_dir")
        if os.path.exists(remote.base_model_name) \
                or remote.base_model_name.startswith("cloud:"):
            adjust(remote, "base_model_name")
        adjust(remote, "output_model_destination")
        if remote.lora_model_name and (
                os.path.exists(remote.lora_model_name)
                or remote.lora_model_name.startswith("cloud:")):
            adjust(remote, "lora_model_name")
        # concepts are inlined by to_pack_dict
        remote.concept_file_name = ""
        return remote, local_paths

    # -- event / command / sync pollers -------------------------------------------

    def remote_events_path(self) -> str:
        return f"{self.config.cloud.remote_dir}/{self.config.cloud.run_id}-events.jsonl"

    def remote_commands_path(self) -> str:
        return f"{self.config.cloud.remote_dir}/{self.config.cloud.run_id}-commands.json"

    @staticmethod
    def _decode_sample_args(args):
        """Rehydrate streamed JPEG payloads into SamplerOutput objects
        (remote side encodes in train_remote.make_streaming_callbacks)."""
        decoded = []
        for arg in args:
            if isinstance(arg, dict) and "image_jpeg_b64" in arg:
                try:
                    import base64
                    import io

                    import numpy as np
                    from PIL import Image

                    from onetrainer_tpu.sampling.sd_sampler import (
                        SamplerOutput,
                    )
                    img = Image.open(io.BytesIO(
                        base64.b64decode(arg["image_jpeg_b64"])))
                    decoded.append(SamplerOutput(
                        image=np.asarray(img.convert("RGB"))))
                    continue
                except Exception:
                    pass
            decoded.append(arg)
        return decoded

    def _dispatch_event(self, event: dict):
        name, args = event.get("event"), event.get("args", [])
        try:
            if name == "on_update_status":
                self.callbacks.on_update_status(*args)
            elif name == "on_update_sample_default_progress":
                self.callbacks.on_update_sample_default_progress(*args)
            elif name == "on_update_sample_custom_progress":
                self.callbacks.on_update_sample_custom_progress(*args)
            elif name == "on_sample_default":
                self.callbacks.on_sample_default(
                    *self._decode_sample_args(args))
            elif name == "on_sample_custom":
                self.callbacks.on_sample_custom(
                    *self._decode_sample_args(args))
            # progress events carry dict payloads; forward raw
        except Exception:
            traceback.print_exc()

    def _poll_events(self):
        # consume-and-delete, like the reference's exec_callback: the
        # attached client removing the events file is also the signal the
        # remote side uses to decide "a client is attached" before firing
        # on_detached_finish/on_detached_error (reference:
        # LinuxCloud.py:160-162 — the writer reopens the path per append,
        # so the atomic mv loses nothing)
        events = self.remote_events_path()
        while not self._stop.is_set():
            try:
                consumed = f"{events}.consumed"
                out = subprocess.run(
                    self.cloud.ssh_base()
                    + [f"if [ -f {events} ]; then "
                       f"mv {events} {consumed} && cat {consumed} && "
                       f"rm -f {consumed}; fi"],
                    capture_output=True, text=True, timeout=30)
                for line in out.stdout.splitlines():
                    if not line.strip():
                        continue
                    try:
                        self._dispatch_event(json.loads(line))
                    except json.JSONDecodeError:
                        pass
            except Exception:
                pass
            self._stop.wait(5.0)

    def _push_commands(self):
        while not self._stop.is_set():
            payload = {
                "stop": self.commands.get_stop_command(),
                "sample_default":
                    self.commands.get_and_reset_sample_default_command(),
                "backup": self.commands.get_and_reset_backup_command(),
                "save": self.commands.get_and_reset_save_command(),
            }
            if any(payload.values()):
                try:
                    body = json.dumps(payload)
                    subprocess.run(
                        self.cloud.ssh_base()
                        + [f"cat > {self.remote_commands_path()} <<'EOF'\n"
                           f"{body}\nEOF"],
                        capture_output=True, text=True, timeout=30)
                except Exception:
                    pass
            self._stop.wait(2.0)

    def _sync_workspace_loop(self):
        while not self._stop.is_set():
            try:
                self.cloud.sync_workspace(self.config.workspace_dir)
            except Exception:
                pass
            self._stop.wait(
                float(getattr(self.config.cloud, "sync_interval", 5) or 5))

    # -- lifecycle -------------------------------------------------------------------

    def start(self):
        self.cloud.setup()
        self.cloud.upload_config()
        # locally-present models ride up to their remapped remote paths
        # (reference: BaseCloud.upload_config:43-45)
        for attr in ("base_model_name", "lora_model_name"):
            local = self.local_paths.get(attr)
            if local and os.path.exists(local):
                self.callbacks.on_update_status(f"uploading {attr}")
                self.cloud.upload_path(local, getattr(self.remote_config, attr))
        for target in (self._poll_events, self._push_commands,
                       self._sync_workspace_loop):
            thread = threading.Thread(target=target, daemon=True)
            thread.start()
            self._threads.append(thread)

    def train(self):
        try:
            if self.commands.get_stop_command():
                return
            self.cloud.run_trainer()
            if getattr(self.config.cloud, "download_output_model", True) \
                    and "output_model_destination" in self.local_paths:
                # fetch the final model back to the LOCAL destination
                # (reference: CloudTrainer.train:102-104 +
                # BaseCloud.download_output_model:28-35)
                self.callbacks.on_update_status("downloading output model")
                self.cloud.download_output_model(
                    self.local_paths["output_model_destination"])
        except Exception:
            self.error_caught = True
            raise

    def backup(self, train_progress=None):
        self.commands.backup()

    def end(self):
        """Final sync + lifecycle actions (reference:
        CloudTrainer.end:115-142 — delete_workspace on clean finish, then
        on_error / on_finish CloudAction; a user stop runs no action)."""
        from contextlib import suppress

        from onetrainer_tpu.util.enums import CloudAction
        self._stop.set()
        for thread in self._threads:
            thread.join(timeout=10)
        try:
            self.cloud.sync_workspace(self.config.workspace_dir)
        except Exception:
            # a failed final download is NOT a clean finish — it must
            # block delete_workspace below or remote outputs would be
            # destroyed with no local copy
            self.error_caught = True
            traceback.print_exc()
        try:
            if getattr(self.config.cloud, "delete_workspace", False) \
                    and not getattr(self, "error_caught", False) \
                    and not self.commands.get_stop_command():
                self.callbacks.on_update_status("deleting remote workspace")
                self.cloud.delete_workspace()
            if hasattr(self.cloud, "close"):
                self.cloud.close()
        except Exception:
            self.error_caught = True
            raise
        finally:
            if getattr(self, "error_caught", False):
                action = getattr(self.config.cloud, "on_error", CloudAction.NONE)
            elif self.commands.get_stop_command():
                action = CloudAction.NONE
            else:
                action = getattr(self.config.cloud, "on_finish", CloudAction.NONE)
            with suppress(Exception):  # the cloud may not have been created
                if action == CloudAction.DELETE:
                    self.cloud.delete()
                elif action == CloudAction.STOP:
                    self.cloud.stop()
