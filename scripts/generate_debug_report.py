#!/usr/bin/env python3
"""Anonymized system/debug report for bug reports — TPU edition
(reference: scripts/generate_debug_report.py:33-931, which collects
OS/CPU/GPU/driver/python info; here the accelerator section reports the
JAX backend, TPU device kinds, HBM stats, and library versions instead
of nvidia-smi/lshw queries)."""

import argparse
import json
import os
import platform
import re
import subprocess
import sys


def _run(cmd):
    try:
        env = dict(os.environ, LC_ALL="C")
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=20, env=env)
        return out.stdout.strip() if out.returncode == 0 else None
    except Exception:
        return None


def _anonymize(path):
    """Strip usernames / home dirs from paths (reference
    Utility.anonymize_path)."""
    if not path:
        return path
    path = re.sub(r"/(home|Users)/[^/]+", r"/\1/<user>", str(path))
    return re.sub(r"\\\\Users\\\\[^\\\\]+", r"\\\\Users\\\\<user>", path)


def os_info():
    uname = platform.uname()
    return {
        "system": uname.system,
        "release": uname.release,
        "version": uname.version,
        "machine": uname.machine,
        "glibc": getattr(platform, "libc_ver", lambda: ("", ""))()[1] or None,
    }


def cpu_info():
    info = {"processor": platform.processor() or None,
            "logical_cores": os.cpu_count()}
    model = _run(["sh", "-c",
                  "grep -m1 'model name' /proc/cpuinfo | cut -d: -f2"])
    if model:
        info["model"] = model.strip()
    mem = _run(["sh", "-c", "grep MemTotal /proc/meminfo"])
    if mem:
        info["mem_total_kb"] = int(re.sub(r"[^0-9]", "", mem))
    return info


def accelerator_info():
    """TPU devices via JAX (the reference queries nvidia-smi/lshw)."""
    info = {}
    try:
        import jax
        info["jax_version"] = jax.__version__
        info["default_backend"] = jax.default_backend()
        devices = []
        for d in jax.devices():
            entry = {"id": d.id, "kind": d.device_kind,
                     "platform": d.platform,
                     "process_index": d.process_index}
            try:
                stats = d.memory_stats()
                if stats:
                    entry["hbm_bytes_limit"] = stats.get("bytes_limit")
                    entry["hbm_bytes_in_use"] = stats.get("bytes_in_use")
            except Exception:
                pass
            devices.append(entry)
        info["devices"] = devices
        info["process_count"] = jax.process_count()
    except Exception as e:
        info["error"] = f"{type(e).__name__}: {e}"
    return info


def python_info():
    libs = {}
    for name in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint",
                 "numpy", "safetensors", "transformers", "torch", "PIL",
                 "cv2"):
        try:
            mod = __import__(name)
            libs[name] = getattr(mod, "__version__", "unknown")
        except Exception:
            libs[name] = None
    return {
        "python_version": sys.version.split()[0],
        "executable": _anonymize(sys.executable),
        "venv": _anonymize(os.environ.get("VIRTUAL_ENV")),
        "libraries": libs,
    }


def git_info():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return {
        "branch": _run(["git", "-C", root, "rev-parse",
                        "--abbrev-ref", "HEAD"]),
        "revision": _run(["git", "-C", root, "rev-parse", "--short", "HEAD"]),
        "dirty": bool(_run(["git", "-C", root, "status", "--porcelain"])),
    }


def env_info():
    """XLA/JAX-relevant env vars only — never dump the full environment
    (it may contain secrets)."""
    keep = ("XLA_FLAGS", "JAX_PLATFORMS", "LIBTPU_INIT_ARGS",
            "TPU_WORKER_HOSTNAMES", "JAX_TRACEBACK_FILTERING",
            "OT_MESH_DP", "OT_MESH_FSDP", "OT_MESH_SP",
            "OT_RING_ATTENTION", "OT_SCAN_LAYERS",
            "OT_MULTIHOST", "OT_COORDINATOR", "OT_NUM_PROCESSES",
            "OT_PROCESS_ID", "OT_FORCE_FLASH", "OT_PLATFORM")
    return {k: os.environ[k] for k in keep if k in os.environ}


def build_report():
    return {
        "os": os_info(),
        "cpu": cpu_info(),
        "accelerator": accelerator_info(),
        "python": python_info(),
        "git": git_info(),
        "env": env_info(),
    }


def main():
    parser = argparse.ArgumentParser(
        description="Generate an anonymized debug report")
    parser.add_argument("--output", "-o", default="debug_report.json")
    args = parser.parse_args()
    report = build_report()
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"\nreport written to {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
