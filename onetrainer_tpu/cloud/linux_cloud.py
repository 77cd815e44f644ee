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

    def _get_action_cmd(self, action) -> str:
        """Shell command for a detached-lifecycle CloudAction. A generic
        SSH host cannot stop/delete itself (reference:
        LinuxCloud._get_action_cmd:131-134 raises for non-NONE too);
        RunpodCloud overrides with runpodctl."""
        from onetrainer_tpu.util.enums import CloudAction
        if action not in (None, CloudAction.NONE, "NONE"):
            raise NotImplementedError(
                "Action on detached not supported for this cloud type")
        return ":"

    def train_command(self) -> str:
        log = f"{self.cloud.remote_dir}/{self.cloud.run_id}.log"
        events = f"{self.cloud.remote_dir}/{self.cloud.run_id}-events.jsonl"
        cmds = f"{self.cloud.remote_dir}/{self.cloud.run_id}-commands.json"
        exports = []
        # HF credentials/cache ride the remote env (reference:
        # LinuxCloud.py:146-149)
        token = getattr(self.config.secrets, "huggingface_token", "") or ""
        if token:
            exports.append(f"export HF_TOKEN={shlex.quote(token)}")
        hf_cache = getattr(self.cloud, "huggingface_cache_dir", "") or ""
        if hf_cache:
            exports.append(f"export HF_HOME={shlex.quote(hf_cache)}")
        inner = (f"cd {shlex.quote(self.cloud.onetrainer_dir)} && "
                 f"python scripts/train_remote.py --config-path "
                 f"{shlex.quote(self.remote_config_path())} "
                 f"--callback-path {shlex.quote(events)} "
                 f"--command-path {shlex.quote(cmds)}")
        if exports:
            inner = " && ".join(exports + [inner])
        if self.cloud.detach_trainer:
            # detached lifecycle actions: if the events file still exists
            # shortly after exit, no client is attached — run the
            # configured action (reference: LinuxCloud.py:160-162)
            finish = self._get_action_cmd(
                getattr(self.cloud, "on_detached_finish", None))
            error = self._get_action_cmd(
                getattr(self.cloud, "on_detached_error", None))
            guarded = (
                f"({inner})"
                f" && (sleep 10 && test -f {shlex.quote(events)} && {finish} || true)"
                f" || (sleep 10 && test -f {shlex.quote(events)} && {error})")
            return (f"nohup bash -c {shlex.quote(guarded)} "
                    f"> {shlex.quote(log)} 2>&1 &")
        return f"{inner} 2>&1 | tee {shlex.quote(log)}"

    # -- network operations -----------------------------------------------------------

    def _run(self, cmd: list[str], **kw) -> subprocess.CompletedProcess:
        return subprocess.run(cmd, check=True, capture_output=True, text=True, **kw)

    def setup(self):
        self.callbacks.on_update_status("connecting to cloud")
        self._run(self.ssh_base() + [self.install_command()])
        if getattr(self.cloud, "tensorboard_tunnel", False):
            self._make_tensorboard_tunnel()

    def tensorboard_tunnel_command(self) -> list[str]:
        """ssh -N -L port forward for the remote TensorBoard (reference:
        BaseCloud.py:25-26 + LinuxCloud._make_tensorboard_tunnel:101-111,
        which uses a fabric TunnelManager; the system ssh client does the
        same with -L)."""
        port = int(getattr(self.config, "tensorboard_port", 6006) or 6006)
        return self.ssh_base()[:-1] + [
            "-N", "-L", f"{port}:localhost:{port}", self.ssh_base()[-1]]

    def _make_tensorboard_tunnel(self):
        self._tunnel = subprocess.Popen(
            self.tensorboard_tunnel_command(),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def close(self):
        tunnel = getattr(self, "_tunnel", None)
        if tunnel is not None:
            tunnel.terminate()
            self._tunnel = None

    def upload_config(self, local_tmp_dir: str = "/tmp"):
        self.callbacks.on_update_status("uploading config")
        packed = self.config.to_pack_dict(secrets=False)
        local = os.path.join(local_tmp_dir, f"{self.cloud.run_id}-config.json")
        with open(local, "w") as f:
            json.dump(packed, f)
        target = f"{self.secrets.user}@{self.secrets.host}:{self.remote_config_path()}"
        self._run(self.scp_base() + [local, target])

    def upload_path(self, local: str, remote: str):
        """Upload a local file or directory to the remote path (reference:
        BaseCloud.upload_config:43-45 syncs local base/prior models up)."""
        parent = os.path.dirname(remote.rstrip("/"))
        self._run(self.ssh_base() + [f"mkdir -p {shlex.quote(parent)}"])
        cmd = self.scp_base()
        if os.path.isdir(local):
            cmd = cmd + ["-r"]
        self._run(cmd + [local,
                         f"{self.secrets.user}@{self.secrets.host}:{remote}"])

    def run_trainer(self):
        self.callbacks.on_update_status("training on cloud")
        self._run(self.ssh_base() + [self.train_command()])

    def remote_workspace(self) -> str:
        """The workspace path ON the remote box. LinuxCloud holds the
        path-remapped remote config (CloudTrainer._make_remote_config),
        so this is simply its workspace_dir — the same path the remote
        trainer actually writes to."""
        return self.config.workspace_dir

    def filter_download(self, path: str) -> bool:
        """Per-category download filter (reference:
        BaseCloud._filter_download:70-80 — keyed on path components)."""
        parts = path.split("/")
        if "samples" in parts:
            return bool(getattr(self.cloud, "download_samples", True))
        if "save" in parts:
            return bool(getattr(self.cloud, "download_saves", True))
        if "backup" in parts:
            return bool(getattr(self.cloud, "download_backups", True))
        if "tensorboard" in parts:
            return bool(getattr(self.cloud, "download_tensorboard", True))
        return True

    def sync_workspace(self, local_workspace: str):
        from onetrainer_tpu.util.enums import CloudFileSync
        remote_ws = self.remote_workspace()
        os.makedirs(local_workspace, exist_ok=True)
        method = getattr(self.cloud, "file_sync", CloudFileSync.NATIVE_SCP)
        all_on = all(getattr(self.cloud, k, True) for k in (
            "download_samples", "download_saves", "download_backups",
            "download_tensorboard"))
        if method == CloudFileSync.NATIVE_SCP and all_on:
            # fast path: one recursive scp (NativeSCPFileSync semantics)
            remote = f"{self.secrets.user}@{self.secrets.host}:{remote_ws}"
            self._run(self.scp_base() + ["-r", remote, local_workspace])
            return
        # filtered / parallel per-file path (FabricFileSync semantics:
        # walk the remote tree, apply the download filter, copy files);
        # files already present locally with the same size are skipped so
        # the 5-second sync loop transfers only deltas
        out = self._run(self.ssh_base() + [
            f"find {shlex.quote(remote_ws)} -type f -printf '%s %p\\n' "
            "2>/dev/null || true"])
        pairs = []
        for line in out.stdout.splitlines():
            line = line.strip()
            if not line or " " not in line:
                continue
            size_str, remote_file = line.split(" ", 1)
            rel = os.path.relpath(remote_file, remote_ws)
            if not self.filter_download(rel):
                continue
            local = os.path.join(local_workspace, rel)
            try:
                if os.path.getsize(local) == int(size_str):
                    continue
            except (OSError, ValueError):
                pass
            pairs.append((remote_file, local))
        if pairs:
            from onetrainer_tpu.cloud.file_sync import SCPFileSync
            SCPFileSync(self.secrets.user, self.secrets.host,
                        self.secrets.port).download_files(pairs)

    def download_output_model(self, local_destination: str | None = None):
        """Fetch the final output model from the (remapped) remote
        destination back to the local one (reference:
        BaseCloud.download_output_model:28-35 — remote path comes from
        the remote config, local path from the original)."""
        remote_path = self.config.output_model_destination
        dest = local_destination or remote_path
        remote = (f"{self.secrets.user}@{self.secrets.host}:{remote_path}")
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        self._run(self.scp_base() + [remote, dest])

    def delete_workspace(self):
        """Remove the remote workspace after download (reference:
        BaseCloud.delete_workspace, gated on config.delete_workspace)."""
        remote_ws = self.remote_workspace()
        if not self.cloud.run_id:
            raise ValueError("refusing to delete a workspace without a run id")
        self._run(self.ssh_base() + [f"rm -rf {shlex.quote(remote_ws)}"])

    def stop(self):
        raise NotImplementedError(
            "stopping this cloud type not supported")  # reference: BaseCloud:113-114

    def delete(self):
        raise NotImplementedError(
            "deleting this cloud type not supported")  # reference: BaseCloud:110-111

    def can_reattach(self) -> bool:
        return self.cloud.detach_trainer
