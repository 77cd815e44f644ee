"""Parallel file sync over scp (reference: modules/cloud/*FileSync.py —
BaseSSHFileSync with parallel per-file transfers; NativeSCPFileSync
semantics using the system scp binary)."""

from __future__ import annotations

import os
import subprocess
from concurrent.futures import ThreadPoolExecutor


class SCPFileSync:
    def __init__(self, ssh_user: str, ssh_host: str, port: str | None = None,
                 workers: int = 4):
        self.user = ssh_user
        self.host = ssh_host
        self.port = port
        self.workers = workers

    def _scp(self) -> list[str]:
        cmd = ["scp", "-o", "StrictHostKeyChecking=no"]
        if self.port and str(self.port) not in ("0", ""):
            cmd += ["-P", str(self.port)]
        return cmd

    def _remote(self, path: str) -> str:
        return f"{self.user}@{self.host}:{path}"

    def upload_files(self, pairs: list[tuple[str, str]]):
        """[(local, remote)] in parallel."""
        def one(pair):
            local, remote = pair
            subprocess.run(self._scp() + [local, self._remote(remote)],
                           check=True, capture_output=True)
        with ThreadPoolExecutor(self.workers) as pool:
            list(pool.map(one, pairs))

    def download_files(self, pairs: list[tuple[str, str]]):
        """[(remote, local)] in parallel."""
        def one(pair):
            remote, local = pair
            os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
            subprocess.run(self._scp() + [self._remote(remote), local],
                           check=True, capture_output=True)
        with ThreadPoolExecutor(self.workers) as pool:
            list(pool.map(one, pairs))

    def upload_dir(self, local_dir: str, remote_dir: str):
        pairs = []
        for root, _, files in os.walk(local_dir):
            for name in files:
                local = os.path.join(root, name)
                rel = os.path.relpath(local, local_dir)
                pairs.append((local, f"{remote_dir}/{rel}"))
        # scp can't create remote dirs per-file; fall back to recursive copy
        subprocess.run(self._scp() + ["-r", local_dir,
                                      self._remote(remote_dir)],
                       check=True, capture_output=True)
        return pairs
