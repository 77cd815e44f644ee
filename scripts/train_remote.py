"""Remote-side training entry point (reference: scripts/train_remote.py:
67-158): runs the trainer while streaming callback events to a file the
controlling machine polls, and polling a command file the controlling
machine writes.

The reference pickles callback objects; here events are JSONL (safe to
parse on any host) and commands are a JSON file rewritten atomically:

    python scripts/train_remote.py --config-path run.json \
        --callback-path events.jsonl --command-path commands.json
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.util.platform import (
    enable_compile_cache, maybe_force_platform,
)
maybe_force_platform()
enable_compile_cache()

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands


def parse_args():
    parser = argparse.ArgumentParser(description="Train remotely")
    parser.add_argument("--config-path", required=True)
    parser.add_argument("--secrets-path", default=None)
    parser.add_argument("--callback-path", default=None,
                        help="JSONL file callback events append to")
    parser.add_argument("--command-path", default=None,
                        help="JSON file polled for commands")
    return parser.parse_args()


def make_streaming_callbacks(path: str) -> TrainCallbacks:
    lock = threading.Lock()

    def write_event(name: str, *args):
        payload = []
        for arg in args:
            if hasattr(arg, "to_dict"):
                payload.append(arg.to_dict())
            elif hasattr(arg, "image"):
                # SamplerOutput: stream the image as JPEG bytes so the
                # local side can display it live (reference pickles JPEG
                # via ModelSamplerOutput.__reduce__ —
                # modules/modelSampler/BaseModelSampler.py:20-48)
                entry = {"image_shape": list(arg.image.shape)}
                try:
                    import base64
                    import io

                    from PIL import Image
                    buf = io.BytesIO()
                    Image.fromarray(arg.image).save(buf, format="JPEG",
                                                    quality=90)
                    entry["image_jpeg_b64"] = base64.b64encode(
                        buf.getvalue()).decode("ascii")
                except Exception:
                    pass
                payload.append(entry)
            else:
                payload.append(arg)
        with lock, open(path, "a") as f:
            f.write(json.dumps({"event": name, "args": payload,
                                "time": time.time()}) + "\n")

    return TrainCallbacks(
        on_update_train_progress=lambda *a: write_event(
            "on_update_train_progress", *a),
        on_update_status=lambda *a: write_event("on_update_status", *a),
        on_sample_default=lambda *a: write_event("on_sample_default", *a),
        on_update_sample_default_progress=lambda *a: write_event(
            "on_update_sample_default_progress", *a),
        on_sample_custom=lambda *a: write_event("on_sample_custom", *a),
        on_update_sample_custom_progress=lambda *a: write_event(
            "on_update_sample_custom_progress", *a),
    )


def command_poller(commands: TrainCommands, path: str,
                   stop_event: threading.Event):
    """Poll the command file; the controller writes e.g.
    {"stop": true} / {"sample_default": true} / {"backup": true}
    (reference: train_remote.py command pipe thread)."""
    seen_mtime = 0.0
    while not stop_event.is_set():
        try:
            mtime = os.path.getmtime(path)
            if mtime > seen_mtime:
                seen_mtime = mtime
                with open(path) as f:
                    payload = json.load(f)
                if payload.get("stop"):
                    commands.stop()
                if payload.get("sample_default"):
                    commands.sample_default()
                if payload.get("backup"):
                    commands.backup()
                if payload.get("save"):
                    commands.save()
        except (OSError, json.JSONDecodeError):
            pass
        stop_event.wait(2.0)


def main():
    args = parse_args()
    callbacks = make_streaming_callbacks(args.callback_path) \
        if args.callback_path else TrainCallbacks()
    commands = TrainCommands()

    config = TrainConfig.default_values()
    with open(args.config_path) as f:
        payload = json.load(f)
    config.from_dict(payload)
    if isinstance(payload.get("concepts"), list):
        config.concepts = [ConceptConfig.default_values().from_dict(c)
                           for c in payload["concepts"]]
    if isinstance(payload.get("samples"), list):
        config.samples = [SampleConfig.default_values().from_dict(c)
                          for c in payload["samples"]]
    if args.secrets_path and os.path.exists(args.secrets_path):
        from onetrainer_tpu.config.cloud_config import SecretsConfig
        with open(args.secrets_path) as f:
            config.secrets = SecretsConfig.default_values().from_dict(
                json.load(f))

    from onetrainer_tpu.util.create import create_trainer
    trainer = create_trainer(config, callbacks, commands)

    stop_event = threading.Event()
    poller = None
    if args.command_path:
        poller = threading.Thread(
            target=command_poller, args=(commands, args.command_path,
                                         stop_event), daemon=True)
        poller.start()

    try:
        trainer.start()
        trainer.train()
    finally:
        stop_event.set()
        if poller:
            poller.join(timeout=5)
        trainer.end()


if __name__ == "__main__":
    main()
