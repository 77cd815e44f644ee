"""Tracing / profiling / memory observability
(reference: modules/util/memory_util.py TorchMemoryRecorder +
modules/ui/ProfilingWindow.py scalene integration — TPU equivalents:
jax.profiler traces viewable in TensorBoard/Perfetto, and per-device HBM
stats in place of the CUDA memory-history snapshot).

Trainer hooks:
- OT_PROFILE_STEPS="start:stop" traces that step window to
  <workspace>/profile (xplane + trace.json.gz for Perfetto).
- device memory stats land in TensorBoard under memory/* every log step.
"""

from __future__ import annotations

import os


class StepProfiler:
    """Start/stop a jax.profiler trace around a configured step window."""

    def __init__(self, out_dir: str, window: str | None = None):
        self.out_dir = out_dir
        self.start_step = self.stop_step = -1
        self._active = False
        window = window or os.environ.get("OT_PROFILE_STEPS", "")
        if window:
            try:
                start, stop = window.split(":")
                self.start_step, self.stop_step = int(start), int(stop)
            except ValueError:
                print(f"ignoring malformed OT_PROFILE_STEPS={window!r}")

    def maybe_start(self, step: int):
        if step == self.start_step and not self._active:
            import jax
            os.makedirs(self.out_dir, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True
            print(f"profiler: tracing steps {self.start_step}..{self.stop_step}"
                  f" -> {self.out_dir}")

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            import jax
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler: trace written to {self.out_dir}")

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


def device_memory_stats() -> dict[str, float]:
    """Per-device HBM usage in GiB (replaces the reference's CUDA memory
    recorder; reference: modules/util/memory_util.py:6-24)."""
    import jax
    stats: dict[str, float] = {}
    for device in jax.local_devices():
        mem = getattr(device, "memory_stats", lambda: None)()
        if not mem:
            continue
        gib = 1024 ** 3
        stats[f"memory/bytes_in_use_gib/{device.id}"] = \
            mem.get("bytes_in_use", 0) / gib
        stats[f"memory/peak_bytes_gib/{device.id}"] = \
            mem.get("peak_bytes_in_use", 0) / gib
    return stats
