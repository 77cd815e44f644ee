"""CLI training entry point (reference: scripts/train.py).

    python scripts/train.py --config-path training_presets/my_run.json

Config JSON is the reference's v6 schema (older versions migrate on load).
"""

import argparse
import faulthandler
import json
import os
import sys
import traceback

# SIGABRT/SIGSEGV stack dumps for hang/crash reports
# (reference: modules/ui/ProfilingWindow.py:40-43 faulthandler)
faulthandler.enable()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.util.platform import (
    enable_compile_cache, maybe_force_platform,
)
maybe_force_platform()
enable_compile_cache()

# multi-host: initialize the JAX distributed runtime before any device
# access (no-op single-host; OT_COORDINATOR/OT_MULTIHOST env opt in —
# see onetrainer_tpu/parallel/distributed.py)
from onetrainer_tpu.parallel.distributed import maybe_initialize_distributed
maybe_initialize_distributed()

from onetrainer_tpu.config.concept_config import ConceptConfig
from onetrainer_tpu.config.sample_config import SampleConfig
from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands
from onetrainer_tpu.util.create import create_trainer


def parse_args():
    parser = argparse.ArgumentParser(description="Train a model")
    parser.add_argument("--config-path", required=True,
                        help="path to the train config json")
    parser.add_argument("--secrets-path", default=None,
                        help="path to a secrets json")
    # remote-control files (reference: TrainArgs.py:22-23) — when given,
    # callbacks stream to a JSONL file and commands are polled from a
    # JSON file, same contract as scripts/train_remote.py
    parser.add_argument("--callback-path", default=None,
                        help="JSONL file callback events append to")
    parser.add_argument("--command-path", default=None,
                        help="JSON file polled for commands")
    return parser.parse_args()


def load_config(args) -> TrainConfig:
    config = TrainConfig.default_values()
    with open(args.config_path) as f:
        config.from_dict(json.load(f))
    if args.secrets_path and os.path.exists(args.secrets_path):
        with open(args.secrets_path) as f:
            config.secrets.from_dict(json.load(f))

    if config.concepts is None and os.path.exists(config.concept_file_name):
        with open(config.concept_file_name) as f:
            config.concepts = [ConceptConfig.default_values().from_dict(c)
                               for c in json.load(f)]
    if config.samples is None and os.path.exists(config.sample_definition_file_name):
        with open(config.sample_definition_file_name) as f:
            config.samples = [SampleConfig.default_values().from_dict(s)
                              for s in json.load(f)]
    return config


def main():
    args = parse_args()
    config = load_config(args)

    if args.callback_path:
        from train_remote import make_streaming_callbacks
        callbacks = make_streaming_callbacks(args.callback_path)
    else:
        callbacks = TrainCallbacks(
            on_update_status=lambda s: print(f"status: {s}"),
        )
    commands = TrainCommands()
    if args.command_path:
        import threading

        from train_remote import command_poller
        threading.Thread(
            target=command_poller,
            args=(commands, args.command_path, threading.Event()),
            daemon=True).start()
    trainer = create_trainer(config, callbacks, commands)

    trainer.start()
    canceled = False
    crashed = False
    try:
        trainer.train()
    except KeyboardInterrupt:
        canceled = True
    except Exception:
        traceback.print_exc()
        canceled = True
        crashed = True

    if not canceled or config.backup_before_save:
        trainer.end()
    if crashed:
        # a crashed run must not exit 0 (the r5 e2e measurement "passed"
        # rc=0 after a remote-compile network failure and the harness
        # moved on none the wiser)
        sys.exit(1)


if __name__ == "__main__":
    main()
