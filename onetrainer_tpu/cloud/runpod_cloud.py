"""RunPod pod lifecycle on top of the LinuxCloud SSH data plane
(reference: modules/cloud/RunpodCloud.py:12-99 — create/resume/stop/
terminate a pod via the RunPod GraphQL API, wait for the public IP, then
hand off to the generic SSH path).

The runpod python package isn't available in this image; the same API
calls go through urllib. All request construction is unit-testable
without a network."""

from __future__ import annotations

import json
import time

from onetrainer_tpu.cloud.linux_cloud import LinuxCloud

_API = "https://api.runpod.io/graphql"


class RunpodCloud(LinuxCloud):
    def __init__(self, config, callbacks=None, commands=None):
        super().__init__(config, callbacks, commands)
        self.api_key = getattr(self.secrets, "api_key", "") or ""

    # -- request construction (unit-testable) ------------------------------------

    def _graphql(self, query: str) -> dict:
        return {"url": f"{_API}?api_key={self.api_key}",
                "body": json.dumps({"query": query}).encode(),
                "headers": {"Content-Type": "application/json"}}

    def create_pod_query(self) -> str:
        gpu = getattr(self.cloud, "gpu_type", "") or "NVIDIA RTX A5000"
        volume = getattr(self.cloud, "volume_size", 100) or 100
        # COMMUNITY vs SECURE cloud and the minimum download bandwidth are
        # pod-creation parameters (reference: RunpodCloud.py:70-80 —
        # cloud_type=config.sub_type, min_download=config.min_download)
        sub_type = str(getattr(self.cloud, "sub_type", "") or "SECURE").upper()
        if sub_type not in ("SECURE", "COMMUNITY"):
            sub_type = "SECURE"
        min_download = int(getattr(self.cloud, "min_download", 0) or 0)
        min_dl = f'minDownload: {min_download}, ' if min_download else ''
        return (
            'mutation { podFindAndDeployOnDemand(input: {'
            f'cloudType: {sub_type}, gpuCount: 1, volumeInGb: {volume}, '
            f'containerDiskInGb: 50, gpuTypeId: "{gpu}", {min_dl}'
            f'name: "{self.cloud.run_id}", '
            'imageName: "runpod/pytorch:2.1.0-py3.10-cuda11.8.0-devel-ubuntu22.04", '
            'ports: "22/tcp", startSsh: true, supportPublicIp: true'
            '}) { id machineId }}')

    def _get_action_cmd(self, action) -> str:
        """RunPod pods can stop/delete themselves via runpodctl
        (reference: RunpodCloud._get_action_cmd:93-99)."""
        from onetrainer_tpu.util.enums import CloudAction
        if action in (CloudAction.STOP, "STOP"):
            return ("source /etc/rp_environment && "
                    "runpodctl stop pod $RUNPOD_POD_ID")
        if action in (CloudAction.DELETE, "DELETE"):
            return ("source /etc/rp_environment && "
                    "runpodctl remove pod $RUNPOD_POD_ID")
        return ":"

    def resume_pod_query(self, pod_id: str) -> str:
        return ('mutation { podResume(input: {podId: "%s", gpuCount: 1}) '
                '{ id }}' % pod_id)

    def stop_pod_query(self, pod_id: str) -> str:
        return 'mutation { podStop(input: {podId: "%s"}) { id }}' % pod_id

    def terminate_pod_query(self, pod_id: str) -> str:
        return 'mutation { podTerminate(input: {podId: "%s"}) }' % pod_id

    def pod_status_query(self, pod_id: str) -> str:
        return ('query { pod(input: {podId: "%s"}) { id desiredStatus '
                'runtime { ports { ip isIpPublic privatePort publicPort }}}}'
                % pod_id)

    # -- network operations --------------------------------------------------------

    def _post(self, request: dict) -> dict:
        import urllib.request
        req = urllib.request.Request(
            request["url"], data=request["body"], headers=request["headers"])
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())

    def create_or_resume(self) -> str:
        pod_id = getattr(self.secrets, "id", "") or ""
        if pod_id:
            self.callbacks.on_update_status("resuming pod")
            self._post(self._graphql(self.resume_pod_query(pod_id)))
        else:
            self.callbacks.on_update_status("creating pod")
            out = self._post(self._graphql(self.create_pod_query()))
            pod_id = out["data"]["podFindAndDeployOnDemand"]["id"]
        return pod_id

    def wait_for_ssh(self, pod_id: str, timeout: float = 600.0):
        """Poll until the pod exposes a public SSH port, then point the
        LinuxCloud ssh config at it (reference: RunpodCloud wait loop)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            out = self._post(self._graphql(self.pod_status_query(pod_id)))
            runtime = (out.get("data", {}).get("pod") or {}).get("runtime")
            for port in (runtime or {}).get("ports", []) or []:
                if port.get("isIpPublic") and port.get("privatePort") == 22:
                    self.secrets.host = port["ip"]
                    self.secrets.port = str(port["publicPort"])
                    return
            time.sleep(5)
        raise TimeoutError(f"pod {pod_id} did not expose ssh in time")

    def setup(self):
        pod_id = self.create_or_resume()
        self.secrets.id = pod_id
        self.wait_for_ssh(pod_id)
        super().setup()

    def stop(self):
        """Stop the pod (reference: RunpodCloud.stop:87-88); invoked by
        CloudTrainer.end for CloudAction.STOP."""
        pod_id = getattr(self.secrets, "id", "") or ""
        if pod_id:
            self._post(self._graphql(self.stop_pod_query(pod_id)))

    def delete(self):
        """Terminate the pod (reference: RunpodCloud.delete:84-85);
        invoked for CloudAction.DELETE."""
        pod_id = getattr(self.secrets, "id", "") or ""
        if pod_id:
            self._post(self._graphql(self.terminate_pod_query(pod_id)))
