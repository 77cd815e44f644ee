"""Cloud-delegated training over SSH (reference: modules/cloud/BaseCloud.py,
LinuxCloud.py:21-251, scripts/train_remote.py).

The reference ships the whole job to a remote GPU box over fabric/SSH and
streams pickled callbacks back. Here the same control plane targets a TPU
VM using the system ssh/scp binaries (fabric isn't available in this
image): upload config + concepts, run scripts/train.py remotely under
nohup with a run id, poll a JSONL event file back over ssh, sync the
workspace with scp. Networkless environments can still unit-test command
construction (see tests)."""

from __future__ import annotations

import json
import os
import shlex
import subprocess
import time

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands


class LinuxCloud:
    def __init__(self, config: TrainConfig,
                 callbacks: TrainCallbacks | None = None,
                 commands: TrainCommands | None = None):
        self.config = config
        self.cloud = config.cloud
        self.secrets = config.secrets.cloud
        self.callbacks = callbacks or TrainCallbacks()
        self.commands = commands or TrainCommands()

    # -- command construction (unit-testable without a network) -------------------

    def ssh_base(self) -> list[str]:
        cmd = ["ssh", "-o", "StrictHostKeyChecking=no"]
        if self.secrets.port and str(self.secrets.port) not in ("0", ""):
            cmd += ["-p", str(self.secrets.port)]
        cmd += [f"{self.secrets.user}@{self.secrets.host}"]
        return cmd

    def scp_base(self) -> list[str]:
        cmd = ["scp", "-o", "StrictHostKeyChecking=no"]
        if self.secrets.port and str(self.secrets.port) not in ("0", ""):
            cmd += ["-P", str(self.secrets.port)]
        return cmd

    def remote_config_path(self) -> str:
        return f"{self.cloud.remote_dir}/{self.cloud.run_id}-config.json"

    def install_command(self) -> str:
        parts = []
        if self.cloud.install_onetrainer:
            parts.append(
                f"test -d {shlex.quote(self.cloud.onetrainer_dir)} || "
                f"({self.cloud.install_cmd} {shlex.quote(self.cloud.onetrainer_dir)})")
        if self.cloud.update_onetrainer:
            parts.append(f"cd {shlex.quote(self.cloud.onetrainer_dir)} && git pull")
        return " && ".join(parts) if parts else "true"

    def train_command(self) -> str:
        log = f"{self.cloud.remote_dir}/{self.cloud.run_id}.log"
        events = f"{self.cloud.remote_dir}/{self.cloud.run_id}-events.jsonl"
        cmds = f"{self.cloud.remote_dir}/{self.cloud.run_id}-commands.json"
        inner = (f"cd {shlex.quote(self.cloud.onetrainer_dir)} && "
                 f"python scripts/train_remote.py --config-path "
                 f"{shlex.quote(self.remote_config_path())} "
                 f"--callback-path {shlex.quote(events)} "
                 f"--command-path {shlex.quote(cmds)}")
        if self.cloud.detach_trainer:
            return f"nohup bash -c {shlex.quote(inner)} > {shlex.quote(log)} 2>&1 &"
        return f"{inner} 2>&1 | tee {shlex.quote(log)}"

    # -- network operations -----------------------------------------------------------

    def _run(self, cmd: list[str], **kw) -> subprocess.CompletedProcess:
        return subprocess.run(cmd, check=True, capture_output=True, text=True, **kw)

    def setup(self):
        self.callbacks.on_update_status("connecting to cloud")
        self._run(self.ssh_base() + [self.install_command()])

    def upload_config(self, local_tmp_dir: str = "/tmp"):
        self.callbacks.on_update_status("uploading config")
        packed = self.config.to_pack_dict(secrets=False)
        local = os.path.join(local_tmp_dir, f"{self.cloud.run_id}-config.json")
        with open(local, "w") as f:
            json.dump(packed, f)
        target = f"{self.secrets.user}@{self.secrets.host}:{self.remote_config_path()}"
        self._run(self.scp_base() + [local, target])

    def run_trainer(self):
        self.callbacks.on_update_status("training on cloud")
        self._run(self.ssh_base() + [self.train_command()])

    def sync_workspace(self, local_workspace: str):
        remote = (f"{self.secrets.user}@{self.secrets.host}:"
                  f"{self.cloud.remote_dir}/{self.cloud.run_id}-workspace")
        os.makedirs(local_workspace, exist_ok=True)
        self._run(self.scp_base() + ["-r", remote, local_workspace])

    def can_reattach(self) -> bool:
        return self.cloud.detach_trainer
