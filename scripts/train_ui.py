"""Web training UI (reference: the customtkinter TrainUI launched by
scripts/train_ui.py — modules/ui/TrainUI.py:44-666; here a dependency-free
web app, see onetrainer_tpu/ui/server.py for the redesign rationale):

    python scripts/train_ui.py [--port 8008] [--host 127.0.0.1]
        [--config-path train.json] [--presets-dir training_presets]

Then open http://127.0.0.1:8008 (port-forward from a TPU VM with
`ssh -L 8008:127.0.0.1:8008 ...`).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onetrainer_tpu.util.platform import (
    enable_compile_cache, maybe_force_platform,
)
maybe_force_platform()
enable_compile_cache()


def main():
    p = argparse.ArgumentParser(description="Web training UI")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--config-path", default="")
    p.add_argument("--presets-dir", default="")
    args = p.parse_args()

    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.ui.server import TrainUIServer

    config = None
    if args.config_path:
        with open(args.config_path) as f:
            config = TrainConfig.default_values().from_dict(json.load(f))
    server = TrainUIServer(args.host, args.port, config,
                           args.presets_dir or None)
    print(f"training UI at http://{args.host}:{server.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
