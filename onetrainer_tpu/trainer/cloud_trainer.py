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
        if getattr(config.cloud, "type", None) == CloudType.RUNPOD:
            from onetrainer_tpu.cloud.runpod_cloud import RunpodCloud
            self.cloud = RunpodCloud(config, self.callbacks, self.commands)
        else:
            self.cloud = LinuxCloud(config, self.callbacks, self.commands)
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._events_seen = 0

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
        while not self._stop.is_set():
            try:
                out = subprocess.run(
                    self.cloud.ssh_base()
                    + [f"tail -n +{self._events_seen + 1} "
                       f"{self.remote_events_path()} 2>/dev/null || true"],
                    capture_output=True, text=True, timeout=30)
                lines = [l for l in out.stdout.splitlines() if l.strip()]
                for line in lines:
                    try:
                        self._dispatch_event(json.loads(line))
                    except json.JSONDecodeError:
                        pass
                self._events_seen += len(lines)
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
        for target in (self._poll_events, self._push_commands,
                       self._sync_workspace_loop):
            thread = threading.Thread(target=target, daemon=True)
            thread.start()
            self._threads.append(thread)

    def train(self):
        try:
            self.cloud.run_trainer()
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
